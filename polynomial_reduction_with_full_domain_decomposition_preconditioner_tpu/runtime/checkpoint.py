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

__all__ = ["save_hierarchies", "load_hierarchies", "save_mesh", "load_mesh",
           "cached_mesh_builder", "save_chain_info", "load_chain_info",
           "save_setup_payload", "load_setup_payload"]


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


# ---------------------------------------------------------------------------
# mesh + production-chain checkpoints (driver --checkpoint): the dominant
# setup costs at production sizes are the global mesh build (float64
# geometric factors over every element) and the vertex-chain construction


def save_mesh(path: str, mesh):
    # uncompressed: the 64^3 N=7 mesh is ~15 GB of float64 — zlib made
    # single-core cache loads take ~10 minutes; raw npz reads at disk
    # speed (the cache is local scratch, size is cheap)
    np.savez(
        path, dim=np.asarray(mesh.dim),
        poly_degree=np.asarray(mesh.poly_degree),
        elem_shape=np.asarray(mesh.elem_shape),
        coords=mesh.coords, glo_num=mesh.glo_num,
        node_degree=mesh.node_degree,
        dirichlet_mask=mesh.dirichlet_mask,
        geom=mesh.geom, mass=mesh.mass,
        structured_layout=np.asarray(mesh.structured_layout))


def load_mesh(path: str):
    from ..mesh.generator import GlobalMesh
    z = np.load(path)
    return GlobalMesh(
        dim=int(z["dim"]), poly_degree=int(z["poly_degree"]),
        elem_shape=tuple(int(x) for x in z["elem_shape"]),
        coords=z["coords"], glo_num=z["glo_num"],
        node_degree=z["node_degree"], dirichlet_mask=z["dirichlet_mask"],
        geom=z["geom"], mass=z["mass"],
        structured_layout=bool(z["structured_layout"]))


def cached_mesh_builder(builder, directory: str, tag: str):
    """Wrap mesh_builder(order) with an npz cache under ``directory``.
    The tag must encode every mesh parameter (the driver derives it from
    the Config); orders are cached independently as they are built."""
    import os
    os.makedirs(directory, exist_ok=True)

    def cached(order: int):
        path = os.path.join(directory, f"mesh_{tag}_N{order}.npz")
        if os.path.exists(path):
            return load_mesh(path)
        mesh = builder(order)
        save_mesh(path, mesh)
        return mesh

    return cached


# ---------------------------------------------------------------------------
# generic host-setup payload checkpoint: an arbitrary pytree of numpy
# arrays / scipy CSR matrices / BsrMatrix blocks / python scalars is
# flattened into ONE raw npz (compression deliberately off — see
# save_mesh) plus a JSON structure descriptor. Used to checkpoint the
# unstructured composite preconditioner's entire host setup (the
# reference re-runs its C++ setup every launch; at PB_1568 sizes ours
# is ~10 minutes of single-core numpy/scipy — once).


def _enc(obj, arrays: dict, pfx: str):
    import numpy as _np
    from ..ops.csr import BsrMatrix
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return {"t": "lit", "v": obj}
    if isinstance(obj, _np.generic):
        return {"t": "lit", "v": obj.item()}
    if isinstance(obj, _np.ndarray):
        arrays[pfx] = obj
        return {"t": "arr", "k": pfx}
    if sp.issparse(obj):
        _pack_csr(arrays, pfx, sp.csr_matrix(obj))
        return {"t": "csr", "k": pfx}
    if isinstance(obj, BsrMatrix):
        arrays[pfx + ".vals"] = _np.asarray(obj.vals)
        arrays[pfx + ".bcols"] = _np.asarray(obj.bcols)
        arrays[pfx + ".brows"] = _np.asarray(obj.brows)
        return {"t": "bsr", "k": pfx,
                "n_rows": obj.n_rows, "n_cols": obj.n_cols,
                "layout": obj.layout}
    if isinstance(obj, dict):
        return {"t": "dict",
                "items": [[k, _enc(v, arrays, f"{pfx}.{k}")]
                          for k, v in obj.items()]}
    if isinstance(obj, (list, tuple)):
        return {"t": "list" if isinstance(obj, list) else "tuple",
                "items": [_enc(v, arrays, f"{pfx}.{i}")
                          for i, v in enumerate(obj)]}
    raise TypeError(f"unsupported payload node {type(obj)} at {pfx}")


def _dec(node, z):
    from ..ops.csr import BsrMatrix
    t = node["t"]
    if t == "lit":
        return node["v"]
    if t == "arr":
        return z[node["k"]]
    if t == "csr":
        return _unpack_csr(z, node["k"])
    if t == "bsr":
        return BsrMatrix(vals=z[node["k"] + ".vals"],
                         bcols=z[node["k"] + ".bcols"],
                         brows=z[node["k"] + ".brows"],
                         n_rows=node["n_rows"], n_cols=node["n_cols"],
                         layout=node.get("layout", "row"))
    if t == "dict":
        return {k: _dec(v, z) for k, v in node["items"]}
    if t == "list":
        return [_dec(v, z) for v in node["items"]]
    if t == "tuple":
        return tuple(_dec(v, z) for v in node["items"])
    raise TypeError(f"bad payload node {t}")


def save_setup_payload(path: str, payload):
    import json
    arrays = {}
    struct = _enc(payload, arrays, "r")
    arrays["__struct__"] = np.frombuffer(
        json.dumps(struct).encode(), dtype=np.uint8).copy()
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    import os
    os.replace(tmp if tmp.endswith(".npz") else tmp + ".npz", path)


def load_setup_payload(path: str):
    import json
    z = np.load(path)
    struct = json.loads(bytes(z["__struct__"]).decode())
    return _dec(struct, z)


def save_chain_info(path: str, info: dict):
    """Vertex-chain checkpoint (amg/composite.coarsen_chain_info output —
    the production inner='amg' hierarchy: level CSRs, transfer factors,
    masks, Chebyshev bounds, dense coarse inverse)."""
    d = {"num_levels": np.asarray(len(info["mats"])),
         "lmaxs": np.asarray(info["lmaxs"]),
         "coarse_inv": info["coarse_inv"]}
    for l, m in enumerate(info["mats"]):
        _pack_csr(d, f"A{l}", m.tocsr())
    for l, m in enumerate(info["prolongs"]):
        _pack_csr(d, f"P{l}", m.tocsr())
    for l, s in enumerate(info["shapes"]):
        d[f"shape{l}"] = np.asarray(s)
    for l, m in enumerate(info["masks"]):
        d[f"mask{l}"] = m
    for l, fs in enumerate(info["factors"]):
        for k, F in enumerate(fs):
            d[f"fac{l}.{k}"] = F
    np.savez_compressed(path, **d)


def load_chain_info(path: str) -> dict:
    z = np.load(path)
    L = int(z["num_levels"])
    dim = len(z["shape0"])
    return {
        "mats": [_unpack_csr(z, f"A{l}") for l in range(L)],
        "prolongs": [_unpack_csr(z, f"P{l}") for l in range(L - 1)],
        "shapes": [tuple(int(x) for x in z[f"shape{l}"]) for l in range(L)],
        "masks": [z[f"mask{l}"] for l in range(L)],
        "factors": [[z[f"fac{l}.{k}"] for k in range(dim)]
                    for l in range(L - 1)],
        "lmaxs": list(z["lmaxs"]),
        "coarse_inv": z["coarse_inv"],
    }
