"""Full-domain-decomposition + polynomial-reduction preconditioner.

TPU-native redesign of the reference's ``Subdomain`` class
(/root/reference/subdomain.{hpp,tpp}): every shard solves a *local
composite problem covering the entire global domain* — its own elements at
full order N, rings of neighbor layers at successively reduced orders
N-r, N-2r, ..., 1 (subdomain.tpp:93-120 levels; :432-553 region growth),
and the far field at order 1 — with a small fixed number of rank-local
FGMRES iterations (subdomain.hpp:229-230, subdomain.tpp:4309-4489).

Redesign for slab-partitioned structured lattices (the reference's
benchmark family):

- Regions: on a slab partition, the reference's expander-grown overlap
  rings (subdomain.tpp:487-510) are exactly z-layers, so each shard's
  composite is a *stack of layer groups* with per-group polynomial order.
- SPMD uniformity: layer positions are indexed cyclically relative to the
  shard's own slab, so every shard runs the identical program on rolled
  geometry; the one non-physical (wrap-around) interface per shard is
  disabled by a per-shard adjacency mask.
- The reference's per-apply gslib exchange of ring data
  (subdomain.tpp:4626) becomes cyclic ``ppermute`` of dense restricted
  layer blocks; the coarsest-level MPI_Allgatherv (subdomain.tpp:4620-21)
  becomes one ``all_gather`` of the order-1 restricted field.
- Non-conforming coupling between groups of different order
  (subdomain.tpp:920-1582 hanging-node constraints Q) happens on whole
  interface planes as dense J (x) J tensor contractions: fine-side face
  planes are interpolatory images of the coarse plane, their adjoint
  contributions collapse onto the coarse plane before conforming assembly.

The far field is compressed by merging z element layers (``far_coarsen``,
the reference's superdomain compression role S10, subdomain.tpp:1632-2579
— there via a BoomerAMG-derived composite prolongation, here by geometric
h-coarsening of the order-1 far mesh, whose vertex planes are an exact
subset of the fine ones for the vertex-warped mesh family). The composite
solve is preconditioned by the matrix-free hybrid V-cycle (inner="amg"),
the assembled low-order FEM hierarchy (inner="fem-amg", S12/S13), Jacobi,
or plain QQt (the reference's use_preconditioner=false bring-up mode).

Arbitrary shard counts are supported (the reference strong-scales with
any rank count, run.py:26): the layer partition is balanced (q or q+1
layers per shard) and every shard's composite uses identical static group
shapes with trailing pad layers (zero geometry/mask) in the own-slab and
far-field groups; the two affected group-interface planes are addressed
dynamically per shard. The far-field z-compression (far_coarsen) requires
an aligned partition; inner='fem-amg' likewise.

Remaining v1 constraint: meshes must be structured (slab-partitionable
box/Kershaw lattices).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..mesh.partition import partition_mesh
from ..ops import sem
from ..ops import interp
from ..ops import gather_scatter as gs
from ..utils.gll import diff_matrix, interp_matrix
from .preconditioners import Preconditioner
from . import krylov

__all__ = ["composite_dd"]


@dataclass(frozen=True)
class _GroupSpec:
    order: int          # polynomial order of this layer group
    layers: int         # number of element layers (in zcoarse units)
    start_pos: int      # first layer position (cyclic, FINE layer units)
    zcoarse: int = 1    # z element-merge factor (1 = fine layers)

    @property
    def fine_extent(self) -> int:
        return self.layers * self.zcoarse


def _build_group_specs(S, V, L, orders, total_layers, far_zcoarse: int = 1,
                       sup_overlap: int = 1):
    """Layer groups in cyclic position order: own slab, rings above
    (orders[0..L-1], V layers each), far field (order 1), rings below
    (mirrored). Follows the reference's region growth semantics
    (subdomain.tpp:479-531: ring l grown at poly_degree[l]).

    With far_zcoarse > 1 the far field is compressed (the reference's
    superdomain compression role, S10, subdomain.tpp:1632-2579):
    ``sup_overlap`` coarse-layer-widths of FINE order-1 layers are kept on
    each side (the reference's superdomain_overlap — overlap between the
    subdomain fringe and the compressed superdomain, subdomain.tpp:
    1860-1992), and the middle is carried on z-merged layers."""
    groups = [_GroupSpec(orders[0], S, 0)]
    if total_layers == S:
        return groups  # single shard: the composite is the whole domain
    pos = S
    for l in range(L):
        groups.append(_GroupSpec(orders[l], V, pos))
        pos += V
    far = total_layers - S - 2 * V * L
    if far < 0:
        raise ValueError(
            f"mesh too small for overlap: need >= {S + 2 * V * L} layers, "
            f"have {total_layers}")
    if far > 0:
        F = far_zcoarse
        ov = sup_overlap * F if F > 1 else 0
        if F > 1 and ((far - 2 * ov) % F != 0 or far - 2 * ov < F):
            # explicit far_coarsen must satisfy the same alignment
            # conditions _auto_far_zcoarse checks (a bad factor would
            # silently mis-wrap the far-field layout under python -O)
            raise ValueError(
                f"far_coarsen={F} misaligned: the far field "
                f"({far} layers minus 2x{ov} fine overlap) must be a "
                f"positive multiple of {F}")
        if ov > 0:
            groups.append(_GroupSpec(orders[-1], ov, pos))
            pos += ov
        mid = far - 2 * ov
        groups.append(_GroupSpec(orders[-1], mid // F, pos, zcoarse=F))
        pos += mid
        if ov > 0:
            groups.append(_GroupSpec(orders[-1], ov, pos))
            pos += ov
    for l in range(L - 1, -1, -1):
        groups.append(_GroupSpec(orders[l], V, pos))
        pos += V
    assert pos == total_layers
    return groups


def _auto_far_zcoarse(S, V, L, m_last, sup_overlap: int = 1):
    """Largest F in {8,4,2} aligned for every shard: F must divide the own
    slab (shard bases), the ring extent (far start offset), and m_last,
    with room for the fine overlap layers plus >= 2 merged layers."""
    far = m_last - S - 2 * V * L
    for F in (8, 4, 2):
        if far - 2 * sup_overlap * F >= 2 * F and far % F == 0 \
                and S % F == 0 and (V * L) % F == 0 and m_last % F == 0:
            return F
    return 1


def _z_coarsen_order1_mesh(mesh1, F: int, plane_shape, dim: int):
    """An order-1 mesh whose z element layers each merge F fine layers.

    The mesh family is vertex-warped trilinear (mesh/generator.py), so the
    coarse mesh's vertex planes are exactly every F-th fine vertex plane —
    the coarse geometry is a subset grid of the fine one. Returns a
    lightweight object with the GlobalMesh fields the composite setup
    reads (poly_degree, coords, geom, dirichlet_mask, node_degree)."""
    from types import SimpleNamespace
    from ..mesh.generator import geometric_factors
    from ..amg.composite import _block_grid_coords

    m_last = mesh1.elem_shape[-1]
    blocks = [_block_grid_coords(mesh1, q, plane_shape, dim)
              for q in range(m_last)]
    X = np.concatenate([blocks[0]] + [b[1:] for b in blocks[1:]], axis=0)
    Xc = X[::F]                      # (m_last/F + 1, my+1, mx+1, dim)
    vshape = Xc.shape[:-1]
    mzc = vshape[0] - 1
    rev_elems = tuple(s - 1 for s in vshape)      # (mzc, my, mx)
    E = int(np.prod(rev_elems))

    # element corner coords, storage (E, n_z=2, n_y=2, n_x=2, dim),
    # x-fastest element ordering
    corners = np.empty((E,) + (2,) * dim + (dim,))
    grids = np.indices(rev_elems).reshape(dim, -1)   # (dim, E) z-major
    for loc in np.ndindex(*(2,) * dim):
        sel = tuple(grids[d] + loc[d] for d in range(dim))
        corners[(slice(None),) + loc] = Xc[sel]
    coords = corners.reshape(E, 2 ** dim, dim)
    geom, _ = geometric_factors(coords, dim, 1)

    # closed-form vertex multiplicity and boundary mask on the tensor grid
    deg = np.ones(vshape)
    mask = np.ones(vshape)
    for d in range(dim):
        idx = np.arange(vshape[d])
        interior = (idx > 0) & (idx < vshape[d] - 1)
        shp = [1] * dim
        shp[d] = vshape[d]
        deg = deg * np.where(interior, 2.0, 1.0).reshape(shp)
        mask = mask * interior.astype(float).reshape(shp)

    def per_elem(field):
        out = np.empty((E,) + (2,) * dim)
        for loc in np.ndindex(*(2,) * dim):
            sel = tuple(grids[d] + loc[d] for d in range(dim))
            out[(slice(None),) + loc] = field[sel]
        return out.reshape(E, 2 ** dim)

    return SimpleNamespace(
        poly_degree=1,
        elem_shape=tuple(reversed(rev_elems[1:])) + (mzc,),
        coords=coords,
        geom=geom,
        dirichlet_mask=per_elem(mask),
        node_degree=per_elem(deg).astype(np.int32),
    )


def composite_dd(domain, mesh_builder, poly_reduction: int,
                 subdomain_overlap: int = 1,
                 superdomain_overlap: int = 1,
                 num_iterations: int = 4,
                 inner: str = "amg",
                 inner_solver: str = "fgmres",
                 num_vcycles: int = 1,
                 cheby_order: int = 2,
                 ptype=None,
                 max_coarse: int = 600,
                 far_coarsen="auto",
                 fine_mesh=None,
                 chain_cache: str | None = None,
                 vertex_iters: int = 0) -> Preconditioner:
    """Build the composite DD+polynomial-reduction preconditioner.

    domain: the fine-level Domain (structured, slab-partitioned).
    mesh_builder(N_c): same element grid meshed at order N_c.
    poly_reduction: the reference's CLI poly_reduction (poisson.cpp:63).
    subdomain_overlap: ring thickness in layers (reference sub_overlap).
    superdomain_overlap: when the far field is compressed (far_coarsen),
      this many merged-layer-widths of FINE order-1 layers are kept on
      each side of the compressed region (the reference's sup_overlap:
      overlap between the subdomain fringe and the compressed
      superdomain, subdomain.tpp:1860-1992). No effect at far_coarsen=1.
    num_iterations: fixed inner FGMRES iterations (subdomain.hpp:229-230).
    inner_solver: "fgmres" (subdomain.tpp:4309-4489) or "fcg"
      (subdomain.tpp:4161-4268) — the reference dispatches the composite
      solve by the same preconditioner_type flag as the outer solver
      (domain.tpp:637-646). FCG skips the Arnoldi basis storage and
      Gram-Schmidt contractions (one dssum + two fused dots per
      iteration), at the cost of assuming effective SPD-ness of the
      composite operator; both run the same fixed iteration count.
    inner: the composite solve's own preconditioner — "amg" is the
      reference's low-order FEM V-cycle (S12/S13, subdomain.tpp:2749-3704,
      rebuilt in amg/), "jacobi" the assembled-diagonal stand-in, "none"
      the reference's use_preconditioner=false path (subdomain.tpp:4192).
    num_vcycles / cheby_order: V-cycle hyperparameters (subdomain.hpp:
      231-234, defaults 1 and 2 as the reference).
    ptype: preconditioner precision (the reference's PTYPE, config.hpp:20);
      the whole composite solve runs in ptype with casts at the
      tree-operator boundary (subdomain.okl:268-282). Default: the
      domain's dtype (no mixed precision).
    max_coarse: coarsest-level size for the dense MXU solve.
    far_coarsen: far-field z element-merge factor — the reference's
      superdomain compression role (S10, subdomain.tpp:1632-2579): the
      far field is carried on a z-coarsened order-1 mesh, shrinking the
      per-shard composite from O(E_total) toward O(E_total / F). "auto"
      picks the largest aligned factor in {8,4,2,1} (always 1 for the
      fem-amg oracle); pass 1 to disable.
    fine_mesh: the order-N GlobalMesh if already built (avoids
      regenerating it; must equal mesh_builder(N)).
    vertex_iters: EXPERIMENTAL Krylov acceleration of the inner='amg'
      coarse-grid correction — the vertex problem is solved by this many
      fixed PCG iterations preconditioned by the chain V-cycle instead
      of a single V-cycle (0, the default, keeps the single cycle). The
      plain chain V-cycle's own error-propagation rate on Kershaw
      eps=0.3 is 0.89-0.93 at every grid size (point-Chebyshev smoothing
      is not robust to the mesh anisotropy) and PCG reaches a
      1e-2-accurate vertex correction in 7-8 iterations
      size-independently — but measured end-to-end on TPU (16^3/32^3
      N=7) the more-exact correction did NOT reduce outer iterations
      (12->14 and 16->20 at vertex_iters=8): the single under-relaxed
      cycle evidently acts as damping for the trilinear
      vertex->composite prolongation error, which is the real
      coarse-grid accuracy limit. Kept as a study knob; default off.
      The chain always runs in >=f32 even under a bf16 ptype (the
      coarse correction must not round off — same role as the
      reference's hypre-precision coarse solve, subdomain.tpp:4080-4088).
    """
    if inner_solver not in ("fgmres", "fcg"):
        raise ValueError(f"inner_solver={inner_solver!r} "
                         "(use 'fgmres' or 'fcg')")
    sd = domain.sharded
    if sd.structured is None:
        # generic (non-slab) partitions: the unstructured composite path
        # (element graph + expander growth + oriented face constraints)
        from .unstructured import composite_dd_unstructured
        if far_coarsen not in ("auto", 1):
            raise ValueError("far_coarsen requires a structured slab "
                             "partition (z-layer merging)")
        return composite_dd_unstructured(
            domain, mesh_builder, poly_reduction,
            subdomain_overlap=subdomain_overlap,
            superdomain_overlap=superdomain_overlap,
            num_iterations=num_iterations, inner=inner,
            inner_solver=inner_solver,
            num_vcycles=num_vcycles, cheby_order=cheby_order,
            ptype=ptype, max_coarse=max_coarse, fine_mesh=fine_mesh,
            setup_cache=chain_cache)
    dim = domain.dim
    N = domain.poly_degree
    dtype = ptype if ptype is not None else domain.dtype
    Pn = sd.num_shards
    elem_shape = sd.structured.elem_shape
    m_last = elem_shape[-1]
    counts = sd.structured.layer_counts      # real layers per shard
    bases = sd.structured.layer_starts       # first physical layer
    S = sd.structured.slab_elems             # padded slab slots (= max)
    ragged = sd.structured.ragged
    if min(counts) < 1:
        raise ValueError(
            f"every shard needs >= 1 element layer: {m_last} layers over "
            f"{Pn} shards leaves empty shards")
    plane_shape = tuple(reversed(elem_shape[:-1]))  # e.g. (my, mx)

    # level hierarchy N, N-r, ..., 1 (subdomain.tpp:93-120)
    orders = [N]
    while orders[-1] > 1:
        orders.append(max(orders[-1] - poly_reduction, 1))
    L = len(orders)
    V = subdomain_overlap
    if min(counts) < V * L:
        raise ValueError(
            f"own slab (min {min(counts)} layers) must cover the ring "
            f"depth ({V * L}) so rings come from nearest neighbors only")

    if ragged:
        # uneven slabs: the own and far groups carry trailing pad layers
        # so all shards share static shapes; compression and the assembled
        # fem-amg oracle both assume layer-aligned shard boundaries
        if far_coarsen not in ("auto", 1) and int(far_coarsen) > 1:
            raise ValueError(
                "far_coarsen > 1 requires the shard count to divide the "
                f"last element dimension ({m_last} layers, {Pn} shards)")
        Fz = 1
        if m_last - max(counts) - 2 * V * L < 1:
            raise ValueError(
                f"mesh too small for uneven slabs: the largest shard "
                f"({max(counts)} layers) plus rings (2x{V * L}) must leave "
                f">= 1 far layer of {m_last}")
        far_slot = m_last - min(counts) - 2 * V * L
        groups = _build_group_specs(S, V, L, orders,
                                    S + 2 * V * L + far_slot,
                                    far_zcoarse=1,
                                    sup_overlap=superdomain_overlap)
    else:
        if far_coarsen == "auto":
            # the assembled fem-amg oracle assumes fine layers: auto must
            # never pick a factor the chosen inner cannot use
            Fz = (1 if inner == "fem-amg"
                  else _auto_far_zcoarse(S, V, L, m_last,
                                         superdomain_overlap))
        else:
            Fz = int(far_coarsen)
            if Fz > 1 and (S % Fz or (V * L) % Fz or m_last % Fz):
                # mirror _auto_far_zcoarse's shard-alignment conditions
                # for an explicit factor (every shard's far region must
                # start and end on a merged-layer boundary)
                raise ValueError(
                    f"far_coarsen={Fz} must divide the slab ({S}), the "
                    f"ring extent ({V * L}) and the layer count ({m_last})")
        if Fz > 1 and inner == "fem-amg":
            raise ValueError(
                "far_coarsen > 1 requires inner='amg' (the assembled "
                "fem-amg path assumes fine layers)")
        groups = _build_group_specs(S, V, L, orders, m_last, far_zcoarse=Fz,
                                    sup_overlap=superdomain_overlap)
    G = len(groups)
    # far-field group indices: between the above-rings and below-rings
    # (1-3 groups: [fine overlap], compressed middle, [fine overlap])
    far_idxs = list(range(1 + L, G - L)) if G > 1 + 2 * L else []
    far_set = set(far_idxs)

    # host meshes at every order (geometry source; replaces the reference's
    # gs-tree population of region copies, subdomain.tpp:644-805).
    # fine_mesh lets the caller pass the order-N mesh it already built for
    # the Domain instead of regenerating it (the dominant host setup cost
    # at scale: float64 Jacobian inversion over every global element)
    order_set = sorted(set(g.order for g in groups) | set(orders))
    mesh_by_order = {
        o: (fine_mesh if o == N and fine_mesh is not None
            else mesh_builder(o))
        for o in order_set}
    mesh_far = (_z_coarsen_order1_mesh(mesh_by_order[1], Fz, plane_shape,
                                       dim) if Fz > 1 else None)

    def layer_slice(mesh_o, phys_layers, field):
        """Extract per-layer element data and convert to lattice layout.

        phys_layers: array of physical layer indices (in stack order).
        field: (E_total, npe[, F]) element data of the order-o mesh.
        Returns lattice array (len(layers)*n_o, MY_o, MX_o [, F])."""
        from ..mesh.layout import elements_to_lattice
        n_o = mesh_o.poly_degree + 1
        plane = int(np.prod(plane_shape))
        a = np.asarray(field)
        row_shape = ((n_o,) + tuple(ps * n_o for ps in plane_shape)
                     + tuple(a.shape[2:]))
        rows = [elements_to_lattice(a[lz * plane:(lz + 1) * plane],
                                    (1,) + plane_shape, n_o, dim)
                if lz >= 0 else np.zeros(row_shape)
                for lz in phys_layers]
        return np.concatenate(rows, axis=0)

    def group_phys(g, gi, p):
        """Physical FINE layer index for each of the group's layer slots
        (z-coarsened groups: the fine index of the slot's first merged
        layer); -1 marks pad slots (ragged partitions only)."""
        s, b = counts[p], bases[p]
        if not ragged:
            return [(b + g.start_pos + k * g.zcoarse) % m_last
                    for k in range(g.layers)]
        # uneven slabs: slot positions shift by the shard's deficit
        # (s - S) for the groups between own and far; groups after the
        # far pads sit at shard-independent positions (start_pos - S +
        # min(counts) since far real extent shrinks by the same deficit)
        if gi == 0:
            off, real = 0, s
        elif far_set and gi > min(far_set):
            off, real = g.start_pos - S + min(counts), g.layers
        elif gi in far_set:
            off, real = g.start_pos + (s - S), m_last - s - 2 * V * L
        else:
            off, real = g.start_pos + (s - S), g.layers
        return ([(b + off + k) % m_last for k in range(real)]
                + [-1] * (g.layers - real))

    # per-shard physical layer maps and interface adjacency (OWNED shards
    # only: a multi-host process never materializes another's host data —
    # the reference's per-rank setup, domain.tpp:45); interface gi -> gi+1
    # is physical unless it sits on the global z boundary
    shard_list = list(sd.owned)
    phys_lists = {p: [group_phys(g, gi, p) for gi, g in enumerate(groups)]
                  for p in shard_list}
    adj = np.zeros((len(shard_list), G))
    for k, p in enumerate(shard_list):
        for gi in range(G):
            adj[k, gi] = 0.0 if phys_lists[p][(gi + 1) % G][0] == 0 else 1.0

    # per-shard, per-group device data
    group_data = []   # list over groups of dicts with (P, ...) arrays
    for gi, g in enumerate(groups):
        o = g.order
        n_o = o + 1
        mesh_o = mesh_far if g.zcoarse > 1 else mesh_by_order[o]
        geom_list, mask_list, wt_list = [], [], []
        for p in shard_list:
            phys = phys_lists[p][gi]
            if g.zcoarse > 1:
                # the far mesh is z-merged: fine start index -> coarse
                phys = [q // g.zcoarse if q >= 0 else -1 for q in phys]
            geom_list.append(layer_slice(mesh_o, phys, mesh_o.geom,
                                         ))
            mask_list.append(layer_slice(mesh_o, phys,
                                         mesh_o.dirichlet_mask[..., None])[..., 0])
            wt_list.append(layer_slice(
                mesh_o, phys,
                (1.0 / mesh_o.node_degree.astype(np.float64))[..., None])[..., 0])
        group_data.append({
            # tuple of per-factor lattices (see sem.stiffness_apply_lattice)
            "geom": tuple(
                domain.shard_put(np.stack([gl[..., k] for gl in geom_list]),
                                 dtype=dtype)
                for k in range(geom_list[0].shape[-1])),
            "mask": domain.shard_put(np.stack(mask_list), dtype=dtype),
            "weight": domain.shard_put(np.stack(wt_list), dtype=dtype),
            "D": jnp.asarray(diff_matrix(n_o), dtype=dtype),
        })

    # interface transfer matrices J (n_hi_pts, n_lo_pts) coarse->fine in 1D
    Jmats = {}
    for gi in range(G):
        o_a = groups[gi].order
        o_b = groups[(gi + 1) % G].order
        for (of, oc) in [(max(o_a, o_b), min(o_a, o_b))]:
            if (oc, of) not in Jmats:
                Jmats[(oc, of)] = jnp.asarray(
                    interp_matrix(oc + 1, of + 1), dtype=dtype)

    # 1-D restriction cascade matrices between consecutive levels
    Jlvl = [jnp.asarray(interp_matrix(orders[i + 1] + 1, orders[i] + 1),
                        dtype=dtype) for i in range(L - 1)]

    extra = {
        "groups": group_data,
        "adj": domain.shard_put(adj, dtype=dtype),
        "J": Jmats,
        "Jlvl": Jlvl,
    }

    phys_rows = None
    if ragged:
        # per-shard scalars for the dynamic group interfaces (shard_map
        # slices the (P,) arrays to per-shard scalars): real own layers,
        # real far layers, first physical layer
        extra["rg"] = {
            "s": domain.shard_put(np.asarray(
                [counts[p] for p in shard_list], dtype=np.int32)),
            "far": domain.shard_put(np.asarray(
                [m_last - counts[p] - 2 * V * L for p in shard_list],
                dtype=np.int32)),
            "base": domain.shard_put(np.asarray(
                [bases[p] for p in shard_list], dtype=np.int32)),
        }
        # static row map compacting the all_gathered padded coarse slabs
        # (P * S * n_c rows) to physical plane order (m_last * n_c rows)
        n_cl = orders[-1] + 1
        pr = []
        for p in range(Pn):
            for j in range(counts[p]):
                pr.extend(range((p * S + j) * n_cl,
                                (p * S + j + 1) * n_cl))
        phys_rows = np.asarray(pr, dtype=np.int32)

    if Fz > 1:
        # z prolongation fine-far -> coarse-far lattice (order-1 layers):
        # P[(e,i), (c,j)] = linear shape function of coarse node j at fine
        # plane e+i; restriction in tree_rhs applies P^T (replicated)
        far_g = next(g for g in groups if g.zcoarse > 1)
        nf, nc = far_g.fine_extent, far_g.layers
        Pz = np.zeros((2 * nf, 2 * nc))
        for k in range(2 * nf):
            e, i = divmod(k, 2)
            z = e + i
            c = min(e // Fz, nc - 1)
            t = (z - c * Fz) / Fz
            Pz[k, 2 * c] += 1.0 - t
            Pz[k, 2 * c + 1] += t
        extra["Rzfar"] = jnp.asarray(Pz.T, dtype=dtype)

    def core_specs(ax):
        specs = {
            "groups": [{"geom": tuple(P(ax) for _ in gd["geom"]),
                        "mask": P(ax), "weight": P(ax),
                        "D": P()} for gd in group_data],
            "adj": P(ax),
            "J": {k: P() for k in Jmats},
            "Jlvl": [P() for _ in Jlvl],
        }
        if "Rzfar" in extra:
            specs["Rzfar"] = P()
        if "rg" in extra:
            specs["rg"] = {k: P(ax) for k in extra["rg"]}
        return specs

    amg_specs = None
    if inner == "amg":
        # matrix-free hybrid (TPU-native redesign of S12/S13): Chebyshev
        # smoothing directly on the composite SEM operator — MXU tensor
        # contractions + structured dssum, no assembled fine matrix, no
        # gathers (XLA TPU gathers measured at ~0.1 Gnnz/s) — plus a
        # replicated vertex-grid Q1 Galerkin chain in stencil form (the
        # reference superdomain-Q1 + BoomerAMG role, subdomain.tpp:
        # 1642-1858, by direct P1 re-discretization).
        from ..amg.composite import vertex_q1_hierarchy
        from ..amg.vcycle import pack_chain
        chain_info = None
        if chain_cache is not None:
            import os
            if os.path.exists(chain_cache):
                from ..runtime.checkpoint import load_chain_info
                chain_info = load_chain_info(chain_cache)
        if chain_info is None:
            mesh1 = mesh_by_order.get(1) or mesh_builder(1)
            chain_info = vertex_q1_hierarchy(mesh1, plane_shape, m_last,
                                             dim, max_coarse=max_coarse)
            if chain_cache is not None:
                from ..runtime.checkpoint import save_chain_info
                save_chain_info(chain_cache, chain_info)
        # the chain runs in >=f32 even when the composite runs bf16: it
        # is the vertex grid (tiny), and the PCG-accelerated correction
        # (vertex_iters) needs a non-rounded operator to converge
        chain_dtype = jnp.float32 if dtype == jnp.bfloat16 else dtype
        chain = pack_chain(chain_info, dtype=chain_dtype)

        # per-group trilinear vertex->lattice factors: dense per-axis
        # contraction matrices (gather-free transfers)
        from ..utils.gll import gll_points_weights

        def lin_blend(n_o):
            r_, _ = gll_points_weights(n_o)
            return (r_ + 1.0) / 2.0

        P1p = []   # per group, per plane dim (replicated)
        P1z = []   # per group, z factor (per shard: cyclic physical layers)
        for gi, g in enumerate(groups):
            n_o = g.order + 1
            t = lin_blend(n_o)
            facs = []
            for ps in plane_shape:
                F = np.zeros((ps * n_o, ps + 1))
                for e in range(ps):
                    F[e * n_o:(e + 1) * n_o, e] = 1.0 - t
                    F[e * n_o:(e + 1) * n_o, e + 1] = t
                facs.append(jnp.asarray(F, dtype=dtype))
            P1p.append(facs)
            mats = []
            for p in shard_list:
                F = np.zeros((g.layers * n_o, m_last + 1))
                for k, q in enumerate(phys_lists[p][gi]):
                    if q < 0:
                        continue   # pad slot: zero rows
                    # fine vertex planes bounding layer k (z-coarsened
                    # layers span zcoarse fine planes, always F-aligned)
                    F[k * n_o:(k + 1) * n_o, q] = 1.0 - t
                    F[k * n_o:(k + 1) * n_o, q + g.zcoarse] = t
                mats.append(F)
            P1z.append(domain.shard_put(np.stack(mats), dtype=dtype))

        extra["amg"] = {"chain": chain, "P1p": P1p, "P1z": P1z}

        def amg_specs_fn(ax):
            return {
                "chain": jax.tree.map(lambda _: P(), chain),
                "P1p": [[P() for _ in fs] for fs in P1p],
                "P1z": [P(ax) for _ in P1z],
                "lmax0": P(ax),
            }

        amg_specs = amg_specs_fn
    elif inner == "fem-amg":
        # reference-faithful path: composite low-order FEM matrix (S12)
        # with a BSR-matrix hierarchy (S13) — the correctness oracle.
        # Covers uniform AND ragged slab partitions (pad slots map to
        # zero Q rows) and multi-process runs (the hierarchy build is
        # replicated over shards like the reference's element graph,
        # subdomain.tpp:198-430; values stack for owned shards only).
        # Use for validation at small/medium sizes, 'amg' for production.
        from ..amg.composite import build_composite_hierarchy, pad_hier_dofs
        from ..amg.vcycle import pack_hierarchies
        build_all = domain.multiprocess
        shard_set = list(range(Pn)) if build_all else shard_list
        hiers = [build_composite_hierarchy(
            groups, mesh_by_order, plane_shape, m_last, bases[p], dim,
            max_coarse=max_coarse,
            phys_by_group=[group_phys(g, gi, p)
                           for gi, g in enumerate(groups)] if ragged
            else None) for p in shard_set]
        if ragged:
            pad_hier_dofs(hiers)
        extra["amg"] = pack_hierarchies(
            hiers, dtype=dtype, stack=domain.spmd,
            select=(shard_list if build_all else None),
            put=(domain.shard_put if build_all else None))

    def extra_specs(ax):
        specs = core_specs(ax)
        if inner == "amg":
            specs["amg"] = amg_specs(ax)
        elif inner == "fem-amg":
            specs["amg"] = jax.tree.map(lambda _: P(ax), extra["amg"])
        return specs

    # ---- static shape info ----
    def lat_shape(g):
        n_o = g.order + 1
        return (g.layers * n_o,) + tuple(ps * n_o for ps in plane_shape)

    group_lats = [lat_shape(g) for g in groups]
    group_sizes = [int(np.prod(s)) for s in group_lats]
    own_lat = group_lats[0]

    # ring block positions within the *neighbor's* restricted slab:
    # above-ring level l = neighbor-above's layers [l*V, (l+1)*V)
    # below-ring level l = neighbor-below's layers [s-(l+1)*V, s-l*V)
    # (far_idxs computed at group construction above)

    def make_ops(extra):
        """Shard-local composite ops from the (squeezed) extra pytree.
        Factored out of build() so setup-time device computations (the
        Chebyshev lambda_max power iteration) trace the identical code."""
        ax = domain.axis_name
        groups_x = extra["groups"]
        adj_x = extra["adj"]        # (G,)
        Jx = extra["J"]
        Jlvl_x = extra["Jlvl"]
        Rzfar_x = extra.get("Rzfar")
        rg = extra.get("rg")        # ragged scalars (s, far, base) or None

        # dynamic group-interface planes (ragged partitions): the own and
        # far groups carry trailing pad layers, so their real top plane is
        # at a shard-varying lattice index. Both meet only same-order
        # neighbors (ring 0 is at order N; the far neighbors at order 1),
        # so the cross-order interface code stays static.
        dyn_top = {}
        if rg is not None:
            dyn_top[0] = rg["s"] * (groups[0].order + 1) - 1
            if far_idxs:
                dyn_top[far_idxs[0]] = rg["far"] * (orders[-1] + 1) - 1
            for gi in dyn_top:
                if groups[gi].order != groups[(gi + 1) % G].order:
                    raise AssertionError(
                        "dynamic-plane group must meet a same-order "
                        "neighbor (structural invariant)")

        def top_of(gi, U):
            if gi in dyn_top:
                return jax.lax.dynamic_index_in_dim(U, dyn_top[gi], 0,
                                                    keepdims=False)
            return U[-1]

        def add_top(gi, U, val):
            if gi in dyn_top:
                idx = dyn_top[gi]
                cur = jax.lax.dynamic_index_in_dim(U, idx, 0,
                                                   keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    U, cur + val, idx, 0)
            return U.at[-1].add(val)

        # ---- composite fields are LISTS of per-group lattice arrays ----
        # (never flattened/concatenated: 1-D<->3-D reshapes materialize
        # layout copies far below HBM bandwidth — see solvers/krylov.py;
        # the generic Krylov solvers operate on the list pytree directly).
        # split/join exist only for consumers that need an assembled flat
        # vector (the fem-amg oracle's CSR hierarchy).
        def split(vec):
            out = []
            off = 0
            for sz, shp in zip(group_sizes, group_lats):
                out.append(vec[off:off + sz].reshape(shp))
                off += sz
            return out

        def join(parts):
            return jnp.concatenate([p.reshape(-1) for p in parts])

        # ---- composite operator: per-group batched SEM apply ----
        def comp_operator(parts):
            return [sem.stiffness_apply_lattice(U, gd["geom"], gd["D"], dim)
                    for gd, U in zip(groups_x, parts)]

        # ---- composite direct stiffness summation ----
        def plane_to_coarse(plane_f, of, oc):
            J = Jx[(oc, of)]
            return interp.lattice_tensor_apply(plane_f, J.T, dim - 1)

        def plane_to_fine(plane_c, of, oc):
            J = Jx[(oc, of)]
            return interp.lattice_tensor_apply(plane_c, J, dim - 1)

        def comp_assemble(parts):
            """Stages 1+2 of comp_dssum — the GATHER half (the
            reference's assemble region, Qt accumulation): collapse fine
            interface faces onto coarse planes, then conforming per-group
            assembly. Exposed separately so the phase taxonomy can report
            assemble vs unassemble rows (poisson.cpp:259-358)."""
            # 1. collapse fine interface faces onto coarse planes (adjoint
            #    of the hanging-node constraints, subdomain.tpp:1496-1582)
            contrib_lo = [None] * G   # addition to group g's top plane
            contrib_hi = [None] * G   # addition to group g's bottom plane
            for gi in range(G):
                gj = (gi + 1) % G
                o_i, o_j = groups[gi].order, groups[gj].order
                a = adj_x[gi]
                top = top_of(gi, parts[gi])
                bot = parts[gj][0]
                if o_i == o_j:
                    contrib_lo[gi] = a * bot
                    contrib_hi[gj] = a * top
                elif o_i > o_j:
                    # gi fine, gj coarse: fine face collapses onto coarse
                    contrib_hi[gj] = a * plane_to_coarse(top, o_i, o_j)
                else:
                    contrib_lo[gi] = a * plane_to_coarse(bot, o_j, o_i)

            # 2. conforming per-group assembly, with the collapsed
            #    contributions added to the boundary planes first. For
            #    same-order interfaces both sides receive the other's
            #    original plane in step 1, so after assembly they hold the
            #    identical shared value (the group-boundary plane is not
            #    touched by intra-group z sums; pad planes hold zeros, so
            #    a dynamic real-top plane only ever receives zeros from
            #    the padding above it).
            summed = []
            for gi in range(G):
                U = parts[gi]
                if contrib_hi[gi] is not None:
                    U = U.at[0].add(contrib_hi[gi])
                if contrib_lo[gi] is not None:
                    U = add_top(gi, U, contrib_lo[gi])
                summed.append(gs.lattice_face_sum(U, groups[gi].order + 1))
            return summed

        def comp_dssum(parts, apply_mask=True):
            if G == 1 and apply_mask and gs._use_pallas_face_sum(parts[0]):
                # single group (P=1: the composite is the whole domain,
                # adjacency mask = 0 so stages 1/3 are inert): fuse the
                # final mask multiply into the one-pass face-sum kernel
                from ..ops.pallas_kernels import lattice_face_sum_3d
                return [lattice_face_sum_3d(parts[0], groups[0].order + 1,
                                            mask=groups_x[0]["mask"])]
            summed = comp_assemble(parts)

            # 3. distribute assembled owner planes back to the other side
            final = list(summed)
            for gi in range(G):
                gj = (gi + 1) % G
                o_i, o_j = groups[gi].order, groups[gj].order
                a = adj_x[gi]
                if o_i == o_j:
                    # same order: both sides share the assembled value
                    # (both computed the identical sum in step 2)
                    pass
                elif o_i > o_j:
                    # fine top plane := J (assembled coarse bottom plane)
                    fine = plane_to_fine(summed[gj][0], o_i, o_j)
                    final[gi] = final[gi].at[-1].set(
                        a * fine + (1.0 - a) * summed[gi][-1])
                else:
                    fine = plane_to_fine(summed[gi][-1], o_j, o_i)
                    final[gj] = final[gj].at[0].set(
                        a * fine + (1.0 - a) * summed[gj][0])

            if not apply_mask:
                return final
            return [U * gd["mask"]
                    for U, gd in zip(final, groups_x)]

        # ---- composite inner products (rank-local, no psum:
        #      subdomain.tpp:4491-4557). Plain point-space dots: with the
        #      symmetric composite QQt, <q, S q> = |Qt q|^2 >= 0, so the
        #      GMRES norms stay well defined. (A multiplicity weight makes
        #      W*S non-symmetric across cross-order interfaces and can
        #      drive <q, S q>_w negative -> NaN; observed at order 7<->1.)
        def comp_dot(a, b):
            return krylov.tree_dot(a, b)

        # ---- tree operator: outer residual -> composite RHS
        #      (subdomain.tpp:4566-4646) ----
        n_per_lvl = [o + 1 for o in orders]

        def tree_cascade(r):
            # restriction cascade on the own slab (subdomain.okl:284-366;
            # the reference's tree_construction.subdomain timed region,
            # poisson.cpp:322-341); r arrives shaped (own lattice)
            r_lvl = [r]
            for Jl in Jlvl_x:
                r_lvl.append(interp.lattice_tensor_apply(
                    r_lvl[-1], Jl.T, dim))
            return r_lvl

        def _rings_above(r_lvl):
            # rings above: cyclic ppermute from the shard above
            nsh = jax.lax.axis_size(ax) if ax is not None else 1
            down = [((i + 1) % nsh, i) for i in range(nsh)]
            parts = []
            for l in range(L):
                n_l = n_per_lvl[l]
                block = jax.lax.dynamic_slice_in_dim(
                    r_lvl[l], l * V * n_l, V * n_l, axis=0)
                if ax is not None and nsh > 1:
                    block = jax.lax.ppermute(block, ax, down)
                parts.append(block)
            return parts

        def _rings_below(r_lvl):
            # rings below: level L-1 ... 0, from the shard below (the
            # sender slices its own slab, so ragged partitions use the
            # sender's real layer count)
            nsh = jax.lax.axis_size(ax) if ax is not None else 1
            up = [(i, (i + 1) % nsh) for i in range(nsh)]
            parts = []
            for l in range(L - 1, -1, -1):
                n_l = n_per_lvl[l]
                s_send = rg["s"] if rg is not None else S
                block = jax.lax.dynamic_slice_in_dim(
                    r_lvl[l], (s_send - (l + 1) * V) * n_l, V * n_l, axis=0)
                if ax is not None and nsh > 1:
                    block = jax.lax.ppermute(block, ax, up)
                parts.append(block)
            return parts

        def _far_parts(r_lvl):
            # far field: all_gather the coarsest level, roll to my cyclic
            # frame, slice each far group's positions (the reference's
            # Allgatherv, subdomain.tpp:4620-4621); z-coarsened groups are
            # restricted onto their merged layers (superdomain
            # compression, S10)
            nsh = jax.lax.axis_size(ax) if ax is not None else 1
            parts = []
            if far_idxs:
                n_c = n_per_lvl[-1]
                if ax is not None and nsh > 1:
                    full = jax.lax.all_gather(r_lvl[-1], ax, axis=0,
                                              tiled=True)
                    shard_id = jax.lax.axis_index(ax)
                else:
                    full = r_lvl[-1]
                    shard_id = 0
                if rg is not None:
                    # uneven slabs: compact the gathered padded slabs to
                    # physical plane order, then roll my far start to row 0
                    # (a single far group; its pad tail is zero-masked)
                    full = full[jnp.asarray(phys_rows)]
                    far_g = groups[far_idxs[0]]
                    shift = -((rg["base"] + rg["s"] + V * L) * n_c)
                    rolled = jnp.roll(full, shift, axis=0)
                    far = rolled[:far_g.layers * n_c]
                    zmask = (jnp.arange(far_g.layers * n_c)
                             < rg["far"] * n_c).astype(far.dtype)
                    parts.append(far * zmask.reshape(
                        (-1,) + (1,) * (far.ndim - 1)))
                else:
                    # full: (m_last*n_c, MY_c, MX_c) in physical z order
                    shift = -(shard_id * S * n_c)
                    rolled = jnp.roll(full, shift, axis=0)
                    for fi in far_idxs:
                        far_g = groups[fi]
                        far = jax.lax.dynamic_slice_in_dim(
                            rolled, far_g.start_pos * n_c,
                            far_g.fine_extent * n_c, axis=0)
                        if far_g.zcoarse > 1:
                            far = interp.axis_contract(Rzfar_x, far, 0)
                        parts.append(far)
            return parts

        def tree_rhs(r):
            r_lvl = tree_cascade(r)
            parts = [r_lvl[0]]  # group 0: own slab at order N
            if G == 1:
                return parts
            parts.extend(_rings_above(r_lvl))
            parts.extend(_far_parts(r_lvl))
            parts.extend(_rings_below(r_lvl))
            return parts

        # phase-taxonomy sub-kinds (poisson.cpp:322-358 schema): the
        # tree exchange split into its ring-ppermute and
        # coarse-all_gather(+superdomain-restrict) legs, each chained on
        # top of the shared restriction cascade so the marginal vs
        # tree_cascade is the leg's own cost
        def tree_rings(r):
            r_lvl = tree_cascade(r)
            if G == 1:
                return [r_lvl[0]]
            return ([r_lvl[0]] + _rings_above(r_lvl)
                    + _rings_below(r_lvl))

        def tree_coarse(r):
            r_lvl = tree_cascade(r)
            if G == 1:
                return [r_lvl[0]]
            return [r_lvl[0]] + _far_parts(r_lvl)

        return {"split": split, "join": join,
                "comp_operator": comp_operator, "comp_dssum": comp_dssum,
                "comp_assemble": comp_assemble,
                "comp_dot": comp_dot, "tree_rhs": tree_rhs,
                "tree_cascade": tree_cascade,
                "tree_rings": tree_rings, "tree_coarse": tree_coarse,
                "groups_x": groups_x}

    def comp_inv_diag_of(ops_c):
        """Continuous inverse assembled diagonal of the composite SEM
        operator (matrix-free, exact for conforming nodes); a per-group
        list like every composite field."""
        groups_x = ops_c["groups_x"]
        diag = [sem.stiffness_diagonal_lattice(gd["geom"], gd["D"], dim)
                for gd in groups_x]
        diag_c = ops_c["comp_dssum"](diag, apply_mask=False)
        return [jnp.where(d > 0, 1.0 / d, 0.0) for d in diag_c]

    vert_shape = (m_last + 1,) + tuple(ps + 1 for ps in plane_shape)

    def build(arrays, extra, ops):
        operator_f, dssum_f, dot_f, dot2_f = ops
        ops_c = make_ops(extra)
        split, join = ops_c["split"], ops_c["join"]
        comp_operator = ops_c["comp_operator"]
        comp_dssum = ops_c["comp_dssum"]
        comp_dot = ops_c["comp_dot"]
        tree_rhs = ops_c["tree_rhs"]
        groups_x = extra["groups"]

        # ---- inner solve: fixed FGMRES (subdomain.tpp:4309-4489) ----
        vcycle_parts = {}
        if inner == "amg":
            # matrix-free hybrid V-cycle: Chebyshev smoothing on the
            # composite SEM operator itself + vertex-grid stencil chain
            from ..amg.vcycle import cheby_smooth, chain_vcycle
            from ..ops.interp import axis_contract
            amg_x = extra["amg"]
            chain = amg_x["chain"]
            lmax0 = amg_x["lmax0"]
            comp_inv_diag = comp_inv_diag_of(ops_c)

            def A_mf(x):
                return comp_dssum(comp_operator(x), apply_mask=True)

            chain_dt = chain["masks"][0].dtype

            def restrict_to_vertex(parts):
                acc = None
                for gi in range(G):
                    U = parts[gi] * groups_x[gi]["weight"]
                    V = axis_contract(amg_x["P1z"][gi].T, U, 0)
                    for d, F in enumerate(amg_x["P1p"][gi]):
                        V = axis_contract(F.T, V, d + 1)
                    acc = V if acc is None else acc + V
                return (acc.reshape(-1).astype(chain_dt)
                        * chain["masks"][0])

            def vertex_solve(w):
                """Coarse-grid correction on the vertex problem: fixed
                PCG iterations preconditioned by the chain V-cycle
                (vertex_iters=0: one V-cycle). Rank-local like the whole
                composite solve (subdomain.tpp:4491-4557)."""
                if vertex_iters <= 0:
                    return chain_vcycle(chain, w, cheby_order=cheby_order)
                from ..ops.stencil import stencil_apply
                coefs0 = chain["levels"][0]["coefs"]
                Av = lambda x: stencil_apply(coefs0, x, dim)
                z0 = chain_vcycle(chain, w, cheby_order=cheby_order)

                def body(_, carry):
                    x, r, p, rz = carry
                    Ap = Av(p)
                    pAp = jnp.vdot(p, Ap)
                    alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
                    x = x + alpha * p
                    r = r - alpha * Ap
                    z = chain_vcycle(chain, r, cheby_order=cheby_order)
                    rz_new = jnp.vdot(r, z)
                    beta = rz_new / jnp.where(rz == 0, 1.0, rz)
                    return (x, r, z + beta * p, rz_new)

                x, _, _, _ = jax.lax.fori_loop(
                    0, vertex_iters, body,
                    (jnp.zeros_like(w), w, z0, jnp.vdot(w, z0)))
                return x

            def prolong_from_vertex(v):
                V0 = v.astype(dtype).reshape(vert_shape)
                outs = []
                for gi in range(G):
                    V = axis_contract(amg_x["P1z"][gi], V0, 0)
                    for d, F in enumerate(amg_x["P1p"][gi]):
                        V = axis_contract(F, V, d + 1)
                    outs.append(V * groups_x[gi]["mask"])
                return outs

            def inner_precond(rr):
                fc = comp_dssum(rr, apply_mask=True)
                x = cheby_smooth(A_mf, comp_inv_diag, lmax0, fc, None,
                                 cheby_order)
                for _ in range(num_vcycles):
                    r = jax.tree.map(jnp.subtract, fc, A_mf(x))
                    v = vertex_solve(restrict_to_vertex(r))
                    x = jax.tree.map(jnp.add, x, prolong_from_vertex(v))
                    x = cheby_smooth(A_mf, comp_inv_diag, lmax0, fc, x,
                                     cheby_order)
                return x

            # V-cycle leg closures for the phase taxonomy (the
            # reference's down_leg/coarse_grid_solver/up_leg split,
            # poisson.cpp:277-293)
            vcycle_parts = {
                "inner_smooth": lambda x: cheby_smooth(
                    A_mf, comp_inv_diag, lmax0, x, None, cheby_order),
                "inner_transfer": lambda x: prolong_from_vertex(
                    restrict_to_vertex(x)),
                "inner_coarse": lambda x: prolong_from_vertex(
                    vertex_solve(restrict_to_vertex(x))),
            }
        elif inner == "fem-amg":
            # the reference's low-order FEM AMG V-cycle (S12/S13,
            # subdomain.tpp:3987-4159), all-device (amg/vcycle.py). The
            # assembled CSR hierarchy needs a flat composite vector, so
            # this oracle path pays the split/join layout copies.
            from ..amg.vcycle import composite_preconditioner
            amg_apply = composite_preconditioner(
                extra["amg"], cheby_order=cheby_order,
                num_cycles=num_vcycles)
            comp_mask = jnp.concatenate(
                [gd["mask"].reshape(-1) for gd in groups_x])

            def inner_precond(rr):
                return split(amg_apply(join(rr)) * comp_mask)
        elif inner == "jacobi":
            # continuous inverse assembled diagonal of the composite
            comp_inv_diag = comp_inv_diag_of(ops_c)

            def inner_precond(rr):
                return jax.tree.map(jnp.multiply,
                                    comp_dssum(rr, apply_mask=True),
                                    comp_inv_diag)
        else:
            # the reference's use_preconditioner=false bring-up mode
            # (subdomain.tpp:4192-4193): plain composite QQt
            def inner_precond(rr):
                return comp_dssum(rr, apply_mask=True)

        def comp_dot2(a, b, c, d):
            # fused rank-local double dot (the reference's
            # projection_inner_products, subdomain.okl role; no psum —
            # the composite problem is rank-local, subdomain.tpp:4491)
            return comp_dot(a, b), comp_dot(c, d)

        def _solve_inner(r):
            # STYPE -> PTYPE cast at the tree-operator boundary
            # (copy_from_domain_data, subdomain.okl:268-274)
            f_comp = tree_rhs(r.astype(dtype))
            if inner_solver == "fcg":
                res = krylov.fcg(
                    comp_operator, inner_precond,
                    lambda rr: comp_dssum(rr, apply_mask=True),
                    comp_dot, comp_dot2, f_comp,
                    max_iterations=num_iterations,
                    tolerance=0.0)
            else:
                res = krylov.fgmres(
                    comp_operator, inner_precond,
                    lambda rr: comp_dssum(rr, apply_mask=True),
                    comp_dot, f_comp,
                    max_iterations=num_iterations,
                    num_vectors=num_iterations,
                    tolerance=0.0)
            # extract the own-slab group and cast back
            # (copy_to_domain_data, subdomain.okl:276-282); outer
            # stitching makes it continuous
            z = res.u[0].astype(domain.dtype)
            return (dssum_f(z, apply_mask=True, apply_weight=True),
                    res.residual_history)

        def precond(r):
            return _solve_inner(r)[0]

        # inner-solve observability (the reference prints per-inner-
        # iteration residuals, subdomain.tpp:4430): Domain.precond_probe
        # jits this to expose one application's inner history
        precond.probe = _solve_inner
        # per-region closures for the device-measured phase taxonomy
        # (runtime/phases.py; the reference's timed regions,
        # poisson.cpp:259-358): Domain.phase_chain microbenches each
        precond.parts = {
            "tree_rhs": lambda r: tree_rhs(r.astype(dtype)),
            "tree_cascade":
                lambda r: ops_c["tree_cascade"](r.astype(dtype)),
            "tree_rings":
                lambda r: ops_c["tree_rings"](r.astype(dtype)),
            "tree_coarse":
                lambda r: ops_c["tree_coarse"](r.astype(dtype)),
            "comp_operator": comp_operator,
            "comp_dssum": lambda x: comp_dssum(x, apply_mask=True),
            "comp_assemble": ops_c["comp_assemble"],
            "inner_precond": inner_precond,
            **vcycle_parts,
        }
        return precond

    if inner == "amg":
        # Chebyshev needs lambda_max(D^-1 A) of the composite SEM
        # operator; estimated once at setup by device power iteration over
        # the same traced ops (hypre's eigenvalue-estimate role,
        # subdomain.tpp:3496-3497)
        core = {k: extra[k] for k in ("groups", "adj", "J", "Jlvl",
                                      "Rzfar", "rg")
                if k in extra}

        def _lmax_impl(core_x):
            ops_c = make_ops(core_x)
            invd = comp_inv_diag_of(ops_c)
            groups_x = core_x["groups"]
            tm = jax.tree.map
            mask = [gd["mask"] for gd in groups_x]
            w = [gd["weight"] for gd in groups_x]
            off = 0
            x0 = []
            for gi, m in enumerate(mask):
                sz = group_sizes[gi]
                x0.append(jnp.sin(
                    (jnp.arange(sz, dtype=dtype) + off)
                    * 0.7311).reshape(m.shape) * m)
                off += sz

            def wdot(a, b):
                return krylov.tree_dot(tm(jnp.multiply, w, a), b)

            def body(_, carry):
                x, lam = carry
                y = tm(jnp.multiply, invd,
                       ops_c["comp_dssum"](ops_c["comp_operator"](x),
                                           apply_mask=True))
                num = wdot(y, y)
                den = jnp.maximum(wdot(x, x), 1e-30)
                lam = jnp.sqrt(num / den)
                scale = 1.0 / jnp.maximum(jnp.sqrt(num), 1e-30)
                return (tm(lambda yl: scale * yl, y), lam)

            # seed lam from x0 so it carries the same shard-varying vma
            # type as the loop body's output (shard_map scan requirement)
            lam0 = krylov.tree_dot(x0, x0) * 0.0 + 1.0
            _, lam = jax.lax.fori_loop(0, 20, body, (x0, lam0))
            return lam * 1.1    # safety: power iteration converges from below

        if domain.spmd:
            ax = domain.axis_name
            cspecs = core_specs(ax)

            def _spmd_lmax(core_x):
                sq = jax.tree.map(
                    lambda s, x: x[0] if s == P(ax) else x, cspecs, core_x,
                    is_leaf=lambda s: isinstance(s, P))
                return _lmax_impl(sq)[None]

            fn = jax.shard_map(_spmd_lmax, mesh=domain.device_mesh,
                               in_specs=(cspecs,), out_specs=P(ax))
            extra["amg"]["lmax0"] = jax.jit(fn)(core)
        else:
            extra["amg"]["lmax0"] = jax.jit(_lmax_impl)(core)

    return Preconditioner(
        build=build, extra=extra, _extra_specs=extra_specs,
        # region provenance for the composite field dump
        # (io/fields.save_composite_fields; subdomain.tpp:4649-4791)
        region_info={
            "kind": "structured",
            "orders": [g.order for g in groups],
            "zcoarse": [g.zcoarse for g in groups],
            "layers": [g.layers for g in groups],
            "plane_shape": tuple(plane_shape),
            "phys": {p_: [list(ph) for ph in phys_lists[p_]]
                     for p_ in shard_list},
        })
