"""Named hierarchical timers with device synchronization.

TPU-native rebuild of the reference's Timer (/root/reference/timer.{hpp,
tpp}): named regions where every start/stop synchronizes the device
(timer.tpp:48-68 calls device.finish()), the synchronization overhead is
calibrated and subtracted (timer.tpp:23-45: median of 24 samples), and the
report aggregates per-shard totals as mean/max (timer.tpp:78-125).

On TPU the sync is ``block_until_ready`` on a sentinel computation; under
jit, regions measured here cover whole dispatched programs (XLA fuses
inside a jit, so fine-grained in-jit phases are instead reported by the
profiler trace, utils: jax.profiler — see profile()).
"""

from __future__ import annotations

import json
import statistics
import time
from contextlib import contextmanager
from dataclasses import dataclass, field

import jax

__all__ = ["Timer", "profile_trace"]


def _device_sync():
    # a trivial device round-trip, the block_until_ready analog of the
    # reference's occa::device::finish() (timer.tpp:54)
    jax.device_put(0.0).block_until_ready()


@dataclass
class Timer:
    """Named accumulating timers (reference Timer, timer.hpp:12-40).

    Usage:
        timer = Timer(); timer.initialize()
        with timer("domain.operator_application"):
            ...
        print(timer.report())
    """
    sync: bool = True
    _totals: dict = field(default_factory=dict)
    _counts: dict = field(default_factory=dict)
    _starts: dict = field(default_factory=dict)
    _sync_cost: float = 0.0

    def initialize(self, samples: int = 24):
        """Calibrate the device-sync overhead and subtract it from every
        measured interval (timer.tpp:23-45, same 24-sample median)."""
        if not self.sync:
            return
        costs = []
        for _ in range(samples):
            t0 = time.perf_counter()
            _device_sync()
            costs.append(time.perf_counter() - t0)
        self._sync_cost = statistics.median(costs)

    def start(self, name: str):
        if self.sync:
            _device_sync()
        self._starts[name] = time.perf_counter()

    def stop(self, name: str):
        if self.sync:
            _device_sync()
        dt = time.perf_counter() - self._starts.pop(name)
        # subtract the calibrated sync overhead (timer.tpp:23-45) only when
        # it is a small correction: for sub-10x-sync intervals the
        # subtraction swamps the measurement (observed: a ~1.3 ms solve
        # reported as 0.3 ms) — keep the raw reading there
        if dt >= 10.0 * self._sync_cost:
            dt -= self._sync_cost
        self._totals[name] = self._totals.get(name, 0.0) + max(dt, 0.0)
        self._counts[name] = self._counts.get(name, 0) + 1

    def record(self, name: str, seconds: float):
        """Inject an externally measured interval (e.g. best-of-N repeats
        of a short region, where a single start/stop is noise-bound)."""
        self._totals[name] = self._totals.get(name, 0.0) + max(seconds, 0.0)
        self._counts[name] = self._counts.get(name, 0) + 1

    @contextmanager
    def __call__(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.stop(name)

    def total(self, name: str) -> float:
        return self._totals.get(name, 0.0)

    def gather_process_totals(self):
        """MEASURED per-process region totals: one tiny allgather at
        report time (the reference syncs and MAX-reduces every region
        across ranks, timer.tpp:67; its final report prints the per-rank
        vectors, poisson.cpp:391-401). Returns (names, (nproc, R) array).
        Collective — every process must call it (the reference's report
        path is identically collective, poisson.cpp:304).
        """
        import hashlib

        import numpy as np
        names = sorted(self._totals)
        vals = np.asarray([self._totals[n] for n in names])
        if jax.process_count() == 1:
            return names, vals[None]
        try:
            from jax.experimental import multihost_utils
            # agree on the region-name SET first: a fixed-size hash
            # allgather always matches in shape, so diverged sets are
            # detected instead of misaligning columns (same count) or
            # hanging in a ragged collective (different count)
            h = hashlib.sha256("\x00".join(names).encode()).digest()[:8]
            h = np.frombuffer(h, dtype=np.uint64)
            allh = np.asarray(multihost_utils.process_allgather(h))
            if not (allh == allh[0]).all():
                return names, vals[None]
            allv = multihost_utils.process_allgather(vals)
            return names, np.asarray(allv)
        except Exception:                            # pragma: no cover
            # transport failure: fall back to this process's values
            return names, vals[None]

    def report(self, num_shards: int | None = None) -> str:
        """Hierarchical text table in the reference's output style
        (poisson.cpp:259-401: '<name>: <total> s  (xN)').

        With num_shards, each region also prints the reference's
        mean/max-over-ranks aggregation and per-rank vector
        '[ t_0 t_1 ... t_{P-1} ]' (timer.tpp:78-125, poisson.cpp:391-401).
        In multi-process runs the vectors are MEASURED per process (one
        allgather, gather_process_totals) and expanded to shards via the
        contiguous ownership map; within one process the shards execute
        lockstep inside one XLA program, so their entries are identical
        by construction.
        """
        gathered = None
        per_process = False
        if num_shards:
            names_g, mat = self.gather_process_totals()
            nproc = mat.shape[0]
            if num_shards % max(nproc, 1) == 0:
                per = num_shards // nproc
                # shard s belongs to process s // per (owned_shards map)
                gathered = {n: mat[:, i].repeat(per)
                            for i, n in enumerate(names_g)}
            else:
                # ragged ownership (shards don't divide evenly): the
                # measured values are still real, only the shard
                # expansion is ambiguous — print the per-PROCESS vector,
                # labeled as such, rather than a fabricated shard vector
                gathered = {n: mat[:, i] for i, n in enumerate(names_g)}
                per_process = True
        lines = []
        for name in sorted(self._totals):
            depth = name.count(".")
            t = self._totals[name]
            line = (f"{'  ' * depth}{name}: {t:.6f} s  "
                    f"(x{self._counts[name]})")
            if num_shards:
                if gathered is not None and name in gathered:
                    v = gathered[name]
                else:                                # pragma: no cover
                    import numpy as np
                    v = np.full(num_shards, t)
                vec = " ".join(f"{x:.6f}" for x in v)
                label = "per-process [" if per_process else "["
                line += (f"\n{'  ' * depth}  mean: {v.mean():.6f}  "
                         f"max: {v.max():.6f}  {label} {vec} ]")
            lines.append(line)
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {k: {"total_s": self._totals[k], "count": self._counts[k]}
                for k in self._totals}

    def dump_json(self, path: str):
        with open(path, "w") as fh:
            json.dump(self.as_dict(), fh, indent=1, sort_keys=True)


@contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace wrapper (the nvprof role of profile.sh:3-11)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
