"""Element partitioning and SPMD assembly plans.

Replaces the reference's per-rank mesh files + gslib gather-scatter setup
(/root/reference/domain.tpp:236-302) with a statically computed plan:

- elements are split into ``num_shards`` contiguous chunks (the reference's
  1 rank = 1 GPU partition, poisson.cpp:84-89), padded so every shard has
  identical shapes (SPMD requirement);
- each shard gets a local node numbering (dedup by global id, like
  domain.tpp:249-281) expressed as a dense ``gather_ids`` map;
- nodes shared between shards ("boundary nodes", detected exactly as the
  reference does: local multiplicity != global multiplicity,
  domain.tpp:253-267) get an index into a compact global interface vector,
  exchanged on-device with one psum instead of gslib's host-side MPI
  (domain.tpp:590-594 bounces D2H->gs->H2D; we never leave HBM).

All arrays are stacked with a leading shard axis so they can be dropped
straight into ``jax.shard_map``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .generator import GlobalMesh

__all__ = ["ShardedDomain", "StructuredInfo", "partition_mesh"]


@dataclass
class StructuredInfo:
    """Marks a shard partition as slab-aligned on a structured box lattice,
    enabling the dense tensor-stencil dssum (ops/gather_scatter.
    structured_dssum) instead of generic gather/scatter.

    The element grid is (..., m1, m0) with m0 = x fastest; shards split the
    *last* dimension into balanced slabs of ``layer_counts[p]`` layers each
    (q or q+1 layers, q = m_last // P — the reference supports any element
    partition, domain.tpp:45). Every shard's lattice is padded to
    ``slab_elems`` = max(layer_counts) layers; pad layers carry zero
    geometry/mask and every device field is zero there.
    """
    elem_shape: tuple[int, ...]   # global (mx, my[, mz])
    slab_elems: int               # max layers per shard (padded slab size)
    poly_degree: int
    layer_counts: tuple[int, ...] = ()   # real layers per shard

    @property
    def ragged(self) -> bool:
        """True when shards have unequal real layer counts (the shard
        count does not divide the last element dimension)."""
        return len(set(self.layer_counts)) > 1

    @property
    def layer_starts(self) -> tuple[int, ...]:
        """First physical layer of each shard."""
        out, acc = [], 0
        for c in self.layer_counts:
            out.append(acc)
            acc += c
        return tuple(out)

    def local_grid(self):
        """Local element-grid shape in storage order (slowest..fastest)."""
        rev = tuple(reversed(self.elem_shape[:-1]))
        return (self.slab_elems,) + rev


@dataclass
class ShardedDomain:
    """Per-shard stacked arrays describing a partitioned SEM problem.

    Shapes use P = len(owned) (the shards THIS process materializes —
    all of them in single-process runs), E = padded elements/shard,
    npe = points per element, NN = padded local nodes/shard (+1 trash
    slot at index NN), B = padded boundary nodes/shard, BG = global
    interface nodes (+1 trash slot at index BG).
    """

    dim: int
    poly_degree: int
    num_shards: int                  # GLOBAL shard count
    num_total_elements: int          # real (unpadded) element count
    num_global_nodes: int

    geom: np.ndarray                 # (P, E, npe, nG), zero for pad elements
    mass: np.ndarray                 # (P, E, npe), zero for pad elements
    coords: np.ndarray               # (P, E, npe, dim)
    dirichlet_mask: np.ndarray       # (P, E*npe), 0 for pad points
    glo_num: np.ndarray              # (P, E, npe) int64 (pad -> -1)
    elem_valid: np.ndarray           # (P, E) bool
    inv_degree_pts: np.ndarray       # (P, E*npe) 1/global multiplicity, pad 0

    gather_ids: np.ndarray           # (P, E*npe) int32 in [0, NN]; NN = trash
    num_local_nodes: int             # NN (max over shards)
    node_valid: np.ndarray           # (P, NN+1) float, 1 for real nodes
    inv_degree: np.ndarray           # (P, NN+1) float, 1/global multiplicity

    bnode_local: np.ndarray          # (P, B) int32 local node id (pad -> NN)
    bnode_global: np.ndarray         # (P, B) int32 interface id (pad -> BG)
    num_boundary_global: int         # BG

    structured: "StructuredInfo | None" = None
    owned: tuple[int, ...] = ()      # global shard indices materialized here
    elem_offsets: tuple[int, ...] = ()  # global element offset per shard
    #   (all num_shards + 1 entries — needed for partition-invariant
    #   global orderings even when only a slice of shards is owned)

    @property
    def num_points_per_elem(self) -> int:
        return self.geom.shape[2]

    @property
    def elems_per_shard(self) -> int:
        return self.geom.shape[1]

    @property
    def points_per_shard(self) -> int:
        return self.geom.shape[1] * self.geom.shape[2]


def partition_mesh(mesh: GlobalMesh, num_shards: int,
                   structured: bool | str = "auto",
                   owned=None) -> ShardedDomain:
    """Partition a GlobalMesh into num_shards SPMD shards.

    structured: True/"auto" aligns shard boundaries to slabs of the last
    element-grid dimension, enabling the dense tensor-stencil dssum; False
    forces the generic (unstructured) contiguous split.

    owned: global shard indices to MATERIALIZE host arrays for (default
    all). In a multi-host run every process passes its own contiguous
    slice — the reference's per-rank mesh files (domain.tpp:45): setup
    memory stays O(local), only the cheap global index pass is shared.
    """
    E_tot = mesh.num_elements
    npe = mesh.num_points_per_elem
    P = num_shards
    owned = tuple(range(P)) if owned is None else tuple(owned)

    use_structured = (structured is True or structured == "auto") \
        and getattr(mesh, "structured_layout", True)
    if structured is True and not getattr(mesh, "structured_layout", True):
        raise ValueError("mesh elements are not in structured slab order")
    sinfo = None
    if use_structured:
        m_last = mesh.elem_shape[-1]
        plane = int(np.prod(mesh.elem_shape[:-1]))  # elements per slab layer
        # balanced layer partition: q or q+1 layers per shard (arbitrary
        # shard counts, like the reference's per-rank element files,
        # domain.tpp:45); all shards padded to the max slab
        q, r = divmod(m_last, P)
        counts = tuple(q + (1 if p < r else 0) for p in range(P))
        slab_layers = max(counts)
        E = slab_layers * plane                      # padded elements/shard
        bounds = np.concatenate(
            [[0], np.cumsum(counts)]).astype(np.int64) * plane
        sinfo = StructuredInfo(elem_shape=mesh.elem_shape,
                               slab_elems=slab_layers,
                               poly_degree=mesh.poly_degree,
                               layer_counts=counts)
    else:
        E = -(-E_tot // P)  # padded elements per shard
        # contiguous element chunks (the reference's per-rank files are
        # likewise a static partition of the element list, domain.tpp:45)
        bounds = np.linspace(0, E_tot, P + 1).astype(np.int64)

    # which shards touch each global node -> interface nodes. This pass is
    # O(global) but index-only; it runs on every process (the reference
    # likewise derives boundary nodes from global node degrees,
    # domain.tpp:253-267).
    N_glob = mesh.num_nodes
    # node ids are dense 0..N_glob-1, so shard node sets are presence
    # bitmasks — O(N) scatter instead of an O(N log N) sorted unique
    # (three sorted uniques over 13M ids cost ~34 s at PB_146 scale)
    touched = np.zeros((N_glob,), dtype=np.int64)
    nn_sizes, b_sizes = [], []

    def _present(p):
        m = np.zeros((N_glob,), dtype=bool)
        m[mesh.glo_num[bounds[p]:bounds[p + 1]].ravel()] = True
        return m

    for p in range(P):
        pres = _present(p)
        touched += pres
        nn_sizes.append(int(pres.sum()))
    interface_mask = touched > 1
    interface = np.flatnonzero(interface_mask)
    BG = interface.size
    iface_index = np.full((N_glob,), -1, dtype=np.int64)
    iface_index[interface] = np.arange(BG)
    # max interface nodes per shard (global max for static shapes)
    for p in range(P):
        b_sizes.append(int(np.count_nonzero(_present(p) & interface_mask)))

    degree_global = np.bincount(mesh.glo_num.ravel(), minlength=N_glob)
    NN = max(nn_sizes)
    B = max(max(b_sizes, default=0), 1)

    Pl = len(owned)
    if Pl == 1 and owned == (0,) and P == 1:
        # single-shard fast path: the shard IS the mesh — hand out
        # views instead of allocating + copying ~2.5 GB of padded
        # per-shard arrays (nothing downstream mutates these; Domain
        # astypes them into its own buffers). uniq == arange(N) here,
        # so gather ids are the global ids themselves.
        node_valid = np.zeros((1, NN + 1))
        node_valid[0, :NN] = 1.0
        inv_degree = np.zeros((1, NN + 1))
        inv_degree[0, :NN] = 1.0 / degree_global
        return ShardedDomain(
            dim=mesh.dim,
            poly_degree=mesh.poly_degree,
            num_shards=1,
            num_total_elements=E_tot,
            num_global_nodes=N_glob,
            geom=mesh.geom[None],
            mass=mesh.mass[None],
            coords=mesh.coords[None],
            dirichlet_mask=np.ascontiguousarray(
                mesh.dirichlet_mask).reshape(1, E * npe),
            glo_num=mesh.glo_num.astype(np.int64, copy=False)[None],
            elem_valid=np.ones((1, E), dtype=bool),
            inv_degree_pts=(1.0 / np.ascontiguousarray(
                mesh.node_degree).reshape(1, E * npe)),
            gather_ids=np.ascontiguousarray(mesh.glo_num).reshape(
                1, E * npe).astype(np.int32),
            num_local_nodes=NN,
            node_valid=node_valid,
            inv_degree=inv_degree,
            bnode_local=np.full((1, B), NN, dtype=np.int32),
            bnode_global=np.full((1, B), BG, dtype=np.int32),
            num_boundary_global=BG,
            structured=sinfo,
            owned=(0,),
            elem_offsets=tuple(int(b) for b in bounds),
        )

    geom = np.zeros((Pl, E, npe, mesh.num_geom))
    mass_arr = np.zeros((Pl, E, npe))
    coords = np.zeros((Pl, E, npe, mesh.dim))
    mask = np.zeros((Pl, E * npe))
    glo = np.full((Pl, E, npe), -1, dtype=np.int64)
    valid = np.zeros((Pl, E), dtype=bool)
    inv_deg_pts = np.zeros((Pl, E * npe))
    gather_ids = np.full((Pl, E * npe), NN, dtype=np.int32)
    node_valid = np.zeros((Pl, NN + 1))
    inv_degree = np.zeros((Pl, NN + 1))
    bnode_local = np.full((Pl, B), NN, dtype=np.int32)
    bnode_global = np.full((Pl, B), BG, dtype=np.int32)

    for k, p in enumerate(owned):
        lo, hi = bounds[p], bounds[p + 1]
        ne = hi - lo
        geom[k, :ne] = mesh.geom[lo:hi]
        mass_arr[k, :ne] = mesh.mass[lo:hi]
        coords[k, :ne] = mesh.coords[lo:hi]
        mask[k, :ne * npe] = mesh.dirichlet_mask[lo:hi].ravel()
        glo[k, :ne] = mesh.glo_num[lo:hi]
        valid[k, :ne] = True
        inv_deg_pts[k, :ne * npe] = 1.0 / mesh.node_degree[lo:hi].ravel()

        gids = mesh.glo_num[lo:hi].ravel()
        # unique + inverse via presence ranks (ids dense, see above)
        pres = np.zeros((N_glob,), dtype=bool)
        pres[gids] = True
        uniq = np.flatnonzero(pres)
        rank = np.cumsum(pres, dtype=np.int64) - 1
        inv = rank[gids]
        gather_ids[k, :inv.size] = inv.astype(np.int32)
        node_valid[k, :uniq.size] = 1.0
        inv_degree[k, :uniq.size] = 1.0 / degree_global[uniq]
        is_iface = iface_index[uniq] >= 0
        bl = np.flatnonzero(is_iface).astype(np.int32)
        bnode_local[k, :bl.size] = bl
        bnode_global[k, :bl.size] = iface_index[uniq[is_iface]].astype(
            np.int32)

    return ShardedDomain(
        dim=mesh.dim,
        poly_degree=mesh.poly_degree,
        num_shards=P,
        num_total_elements=E_tot,
        num_global_nodes=N_glob,
        geom=geom,
        mass=mass_arr,
        coords=coords,
        dirichlet_mask=mask,
        glo_num=glo,
        elem_valid=valid,
        inv_degree_pts=inv_deg_pts,
        gather_ids=gather_ids,
        num_local_nodes=NN,
        node_valid=node_valid,
        inv_degree=inv_degree,
        bnode_local=bnode_local,
        bnode_global=bnode_global,
        num_boundary_global=BG,
        structured=sinfo,
        owned=owned,
        elem_offsets=tuple(int(b) for b in bounds),
    )
