"""Multi-host execution bootstrap.

The reference's process model is MPI: mpirun/jsrun launches P ranks, each
owning one GPU and its slice of the mesh (/root/reference/poisson.cpp:
84-89, run.sh:33-37). The TPU-native equivalent is ``jax.distributed``:
every process initializes against a coordinator, sees its local devices,
and participates in one global device mesh; per-process setup materializes
only its own shards (mesh/partition.partition_mesh(owned=...)) and device
arrays are assembled with ``jax.make_array_from_process_local_data``.

Works on real multi-host TPU pods and, for testing, on multi-process CPU
(gloo collectives) — the rebuild's replacement for the reference's
'just run on Summit' multi-node validation (SURVEY.md section 4).
"""

from __future__ import annotations

import os

__all__ = ["initialize_multihost", "owned_shards"]


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None,
                         local_devices: int | None = None) -> None:
    """Initialize jax.distributed BEFORE any other JAX use.

    Arguments default to the PRFDD_COORDINATOR / PRFDD_NUM_PROCESSES /
    PRFDD_PROCESS_ID environment variables (unset -> no-op single
    process). ``local_devices`` forces a CPU device count per process
    (virtual-device testing).
    """
    coordinator = coordinator or os.environ.get("PRFDD_COORDINATOR")
    if coordinator is None:
        return
    if num_processes is None:
        num_processes = int(os.environ["PRFDD_NUM_PROCESSES"])
    if process_id is None:
        process_id = int(os.environ["PRFDD_PROCESS_ID"])
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    if local_devices is not None:
        jax.config.update("jax_num_cpu_devices", local_devices)


def owned_shards(num_shards: int):
    """The contiguous global shard range owned by this process (device
    order in jax.make_mesh is process-major, so shard p lives on global
    device p)."""
    import jax
    nproc = jax.process_count()
    if nproc == 1:
        return tuple(range(num_shards))
    if num_shards % nproc:
        raise ValueError(
            f"num_shards ({num_shards}) must be a multiple of the process "
            f"count ({nproc}) so every process owns whole shards")
    per = num_shards // nproc
    pid = jax.process_index()
    return tuple(range(pid * per, (pid + 1) * per))
