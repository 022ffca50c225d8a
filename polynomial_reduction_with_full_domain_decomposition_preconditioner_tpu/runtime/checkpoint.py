"""Checkpoint / resume of expensive setup artifacts.

The reference has no solver-level checkpointing (SURVEY.md section 5.4);
experiment-level resume re-runs the whole setup per configuration. Here
the expensive host-side setup — the composite FEM hierarchy (amg/
composite.py) — can be saved to one compressed npz and reloaded, skipping
FEM assembly, folding, RAP and eigenvalue estimation on resume.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..amg.composite import HostHierarchy

__all__ = ["save_hierarchies", "load_hierarchies"]


def _pack_csr(d: dict, key: str, m: sp.csr_matrix):
    d[f"{key}.data"] = m.data
    d[f"{key}.indices"] = m.indices
    d[f"{key}.indptr"] = m.indptr
    d[f"{key}.shape"] = np.asarray(m.shape)


def _unpack_csr(z, key: str) -> sp.csr_matrix:
    return sp.csr_matrix(
        (z[f"{key}.data"], z[f"{key}.indices"], z[f"{key}.indptr"]),
        shape=tuple(z[f"{key}.shape"]))


def save_hierarchies(path: str, hiers: list[HostHierarchy]):
    """Write per-shard composite hierarchies to ``path`` (.npz)."""
    d = {"num_shards": np.asarray(len(hiers)),
         "num_levels": np.asarray(len(hiers[0].mats))}
    for p, h in enumerate(hiers):
        for l, m in enumerate(h.mats):
            _pack_csr(d, f"s{p}.A{l}", m)
        for l, m in enumerate(h.prolongs):
            _pack_csr(d, f"s{p}.P{l}", m)
        _pack_csr(d, f"s{p}.Q", h.Q)
        d[f"s{p}.lmaxs"] = np.asarray(h.lmaxs)
        d[f"s{p}.coarse_inv"] = h.coarse_inv
        d[f"s{p}.dof_mask"] = h.dof_mask
    np.savez_compressed(path, **d)


def load_hierarchies(path: str) -> list[HostHierarchy]:
    z = np.load(path)
    P = int(z["num_shards"])
    L = int(z["num_levels"])
    out = []
    for p in range(P):
        out.append(HostHierarchy(
            mats=[_unpack_csr(z, f"s{p}.A{l}") for l in range(L)],
            prolongs=[_unpack_csr(z, f"s{p}.P{l}") for l in range(L - 1)],
            lmaxs=list(z[f"s{p}.lmaxs"]),
            coarse_inv=z[f"s{p}.coarse_inv"],
            Q=_unpack_csr(z, f"s{p}.Q"),
            dof_mask=z[f"s{p}.dof_mask"]))
    return out
