"""Experiment sweep runner.

Rebuild of the reference's run.py (/root/reference/run.py): sweeps
preconditioner type / precision / V-cycles / Chebyshev order / reduction
over the benchmark meshes. The reference sweeps by sed-patching header
constants and rebuilding the binary (run.py:151-160); here every point is
just a Config. Completed points are skipped by checking their result file
(run.py:139-148's 'Total'-line detection), so sweeps resume for free.
"""

from __future__ import annotations

import itertools
import json
import os

from .config import Config
from .driver import run_simulation

__all__ = ["sweep", "kershaw_sweep"]


def sweep(base: Config, grid: dict, outdir: str, quiet: bool = True):
    """Run the cartesian product of ``grid`` overrides on ``base``.

    Each point writes <outdir>/<name>.json with the structured result
    record; existing files are skipped (resume semantics of run.py:139-148).
    Returns the list of result dicts (loaded for skipped points).
    """
    os.makedirs(outdir, exist_ok=True)
    keys = sorted(grid)
    results = []
    for combo in itertools.product(*(grid[k] for k in keys)):
        overrides = dict(zip(keys, combo))
        cfg = base.replace(**overrides)
        name = "_".join(f"{k}-{overrides[k]}" for k in keys)
        path = os.path.join(outdir, f"{name}.json")
        if os.path.exists(path):
            with open(path) as fh:
                results.append(json.load(fh))
            continue
        out = open(os.devnull, "w") if quiet else None
        try:
            rec = run_simulation(cfg, out=out) if out else run_simulation(cfg)
        finally:
            if out:
                out.close()
        rec["name"] = name
        with open(path, "w") as fh:
            json.dump(rec, fh, indent=1)
        results.append(rec)
    return results


def kershaw_sweep(outdir: str, shape=(8, 8, 8), poly_degree=7,
                  num_shards=1) -> list:
    """The reference's Kershaw experiment family (run.py:24-49): epsilon
    in {1.0, 0.3}, default production solver config."""
    base = Config(mesh="kershaw", shape=shape, poly_degree=poly_degree,
                  poly_reduction=poly_degree - 1, num_shards=num_shards)
    return sweep(base, {"epsilon": [1.0, 0.3]}, outdir)
