"""Unstructured-mesh composite DD + polynomial-reduction preconditioner.

The reference's headline capability beyond structured boxes: the same
full-domain-decomposition preconditioner on arbitrary (Nek5000-style) hex
meshes — pebble beds PB_146/PB_1568 (/root/reference/run.py:51-79) — built
on the global element graph (subdomain.tpp:198-430), expander region
growth (:432-553), and edge/face orientation matching for the region
gather matrices (:1179-1494).

TPU-native redesign (element-batched, setup-absorbed indices):

- Region elements are grouped BY ORDER into classes (own + ring 0 at
  order N; ring l at order N-l*r; ring L-1 + far at order 1). Each class
  is one dense element batch -> the mixed-order operator apply is C
  MXU-batched ``sem.stiffness_apply`` calls instead of the reference's
  per-point level indirection (subdomain.okl:4-101).
- Same-order assembly uses per-class node scatter/gather plans from the
  order-l mesh's glo_num. Cross-order continuity slaves fine face nodes
  to the coarse trace (mesh/graph.slave_constraints); face ORIENTATION is
  absorbed into the setup-side indices and Lagrange weights, so the
  device applies orientation-free padded (ids, cols, wts) segment ops.
- The reference's per-apply gslib tree exchange (subdomain.tpp:4626)
  becomes one ``all_gather`` per level of the restricted own-element
  field, followed by static per-shard element takes — every byte stays
  in HBM and rides ICI.

Ring growth is by vertex adjacency with ``subdomain_overlap`` steps per
level, exactly the reference's semantics. Cross-order element contacts
through an edge/vertex only (no shared face) are left uncoupled in the
composite — a preconditioner-quality approximation (the operator stays
SPD on the composite space); the convergence tests pin the resulting
iteration counts.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..mesh import graph as gr
from ..ops import sem
from ..ops import interp
from ..utils.gll import diff_matrix, interp_matrix
from .preconditioners import Preconditioner
from . import krylov

__all__ = ["composite_dd_unstructured"]


def _class_setup(mesh_o, elems, E_pad, with_geom=True):
    """Node plan for one order class: elems (with -1 pads) -> dense local
    node ids, geometry, masks. ``with_geom=False`` skips the heavy field
    materialization for shards this process does not own (multi-host
    local-only setup: only the index pass is replicated, like the
    reference's replicated element graph, subdomain.tpp:198-430)."""
    n_o = mesh_o.poly_degree + 1
    npe = mesh_o.num_points_per_elem
    Ec = elems.shape[0]
    real = elems >= 0
    safe = np.where(real, elems, 0)

    glo = np.where(real[:, None], mesh_o.glo_num[safe], -1)
    # unique + inverse via a presence bitmask (ids dense in mesh_o) —
    # a sorted unique over 13M ids plus a python id->local dict cost
    # tens of seconds per class at pebble-bed sizes
    sel = glo[real]
    pres = np.zeros((mesh_o.num_nodes,), dtype=bool)
    pres[sel] = True
    uniq = np.flatnonzero(pres)
    rank = np.cumsum(pres, dtype=np.int64) - 1
    NN = uniq.size
    gids = np.full((Ec, npe), NN, dtype=np.int32)
    gids[real] = rank[sel].reshape(-1, npe).astype(np.int32)

    geom = None
    if with_geom:
        geom = np.zeros((Ec, npe, mesh_o.num_geom))
        geom[real] = mesh_o.geom[safe[real]]
    nmask = np.ones(NN + 1)
    nmask[NN] = 0.0
    nmask[gids[real].ravel()] = mesh_o.dirichlet_mask[safe[real]].ravel()

    return {
        "n": n_o, "npe": npe, "E": Ec, "NN": NN,
        "gids": gids.reshape(-1), "geom": geom, "nmask": nmask,
        "uniq": uniq,   # sorted global ids; local id = searchsorted
    }


def composite_dd_unstructured(domain, mesh_builder, poly_reduction: int,
                              subdomain_overlap: int = 1,
                              superdomain_overlap: int = 1,
                              num_iterations: int = 4,
                              inner: str = "jacobi",
                              inner_solver: str = "fgmres",
                              num_vcycles: int = 1,
                              cheby_order: int = 2,
                              ptype=None,
                              max_coarse: int = 600,
                              fine_mesh=None,
                              far_compress="auto",
                              setup_cache: str | None = None
                              ) -> Preconditioner:
    """Composite preconditioner for generic (non-slab) partitions.

    Same contract as solvers.subdomain.composite_dd; ``mesh_builder(o)``
    must return the SAME elements (same ids, same local frames) meshed at
    order o — the scramble generator guarantees this across orders.

    setup_cache: optional npz path checkpointing the ENTIRE host setup
    (element graph, regions, node plans, slave constraints, superdomain
    BSR blocks, face plans, aggregation hierarchy, Chebyshev bound). The
    host setup is minutes of single-core numpy/scipy at pebble-bed
    production sizes; a cached rebuild is one raw-npz load. The caller's
    path must encode every parameter that shapes the setup (mesh tag,
    orders, overlaps, shard count, inner, max_coarse, ptype).
    """
    sd = domain.sharded
    dim = domain.dim
    N = domain.poly_degree
    dtype = ptype if ptype is not None else domain.dtype
    Pn = sd.num_shards
    E_pad = sd.elems_per_shard

    # level hierarchy N, N-r, ..., 1 (subdomain.tpp:93-120)
    orders = [N]
    while orders[-1] > 1:
        orders.append(max(orders[-1] - poly_reduction, 1))
    L = len(orders)
    V = subdomain_overlap

    if jax.process_count() > 1 and setup_cache is not None:
        # payload arrays are owned-shards-stacked: key the cache file by
        # this process's shard-ownership layout so each process reads
        # exactly the payload it wrote (a cache from a different layout
        # resolves to a different path and simply misses)
        import os as _os
        own = list(sd.owned) if sd.owned else list(range(Pn))
        root, ext = _os.path.splitext(setup_cache)
        setup_cache = (f"{root}_pp{jax.process_index()}"
                       f"of{jax.process_count()}_o{own[0]}-{own[-1]}{ext}")
    payload = None
    if setup_cache is not None:
        import os
        if os.path.exists(setup_cache):
            from ..runtime.checkpoint import load_setup_payload
            payload = load_setup_payload(setup_cache)

    if payload is not None and inner == "fem-amg" \
            and payload.get("fem") is None:
        # cache written for a different inner: the fem hierarchy needs
        # the raw constraint lists, which only the full build has
        payload = None
    if payload is not None:
        # checkpointed host setup: skip the graph/region/constraint
        # construction entirely (identical arrays by construction)
        classes = payload["classes"]
        slaves = payload["slaves"]
        sup = payload["sup"]
        fb_meta = payload["fb_meta"]
        nv = payload["nv"]
        fem_host = payload.get("fem")
        C = L                       # one class per level order
    else:
        fem_host = None
        order_set = sorted(set(orders) | {1})
        mesh_by_order = {
            o: (fine_mesh if o == N and fine_mesh is not None
                else mesh_builder(o))
            for o in order_set}
        mesh1 = mesh_by_order[1]
        verts = mesh1.glo_num            # (E, 2^dim) corner vertex ids
        adj = gr.element_adjacency(verts)

        # multi-host local-only setup: the index pass (regions, class sizes,
        # slave-constraint sizes, superdomain shapes) is replicated on every
        # process — partition-invariant global maxima are SPMD shape
        # requirements — but the heavy per-shard arrays (geometry, node
        # plans, BSR values) are materialized only for owned shards
        # (domain.shard_put assembles the global jax.Arrays, the reference's
        # per-rank mesh files role, domain.tpp:45)
        owned = list(sd.owned) if sd.owned else list(range(Pn))
        owned_set = set(owned)

        # fine partition bounds (contiguous element chunks; global offsets so
        # the region/ownership maps are partition-process independent)
        bounds = np.asarray(sd.elem_offsets, dtype=np.int64)
        own_counts = np.diff(bounds)
        owner_of = np.repeat(np.arange(Pn), own_counts)
        slot_of = np.concatenate([np.arange(c) for c in own_counts])

        # ---- per-shard regions: class c elements (class 0 = own + ring 0 at
        #      order N, slots [0, E_pad) = the own block in partition order) ----
        C = L                                   # one class per level order
        class_elems = [[] for _ in range(C)]    # [class][shard] -> ids w/ -1
        region_sets, far_sets = [], []
        for p in range(Pn):
            own = np.arange(bounds[p], bounds[p + 1])
            rings, far = gr.grow_regions(adj, own, L, overlap=V)
            own_padded = np.concatenate(
                [own, np.full(E_pad - own.size, -1, dtype=np.int64)])
            class_elems[0].append(np.concatenate([own_padded, rings[0]]))
            for l in range(1, L - 1):
                class_elems[l].append(rings[l])
            region_sets.append((own, rings))
            far_sets.append(far)

        # superdomain compression (the reference's S10 composite prolongation,
        # subdomain.tpp:1860-2579): when the far field is large, represent it
        # algebraically — kept-fine vertices near the rings + smoothed
        # aggregates for the deep far field — instead of carrying every far
        # element. The structure must be identical across shards (SPMD).
        if far_compress == "auto":
            compress = (L > 1
                        and min(f.size for f in far_sets) >= 128
                        and not any(f.size == 0 for f in far_sets))
        else:
            compress = bool(far_compress) and L > 1 \
                and not any(f.size == 0 for f in far_sets)

        for p in range(Pn):
            own, rings = region_sets[p]
            far = far_sets[p]
            if L > 1:
                ring_last = rings[L - 1]
                if compress:
                    class_elems[L - 1].append(ring_last)
                else:
                    class_elems[L - 1].append(np.concatenate([ring_last, far]))
            else:
                class_elems[0][p] = np.concatenate([class_elems[0][p], far])

        # pad class element lists to the max count over shards
        for c in range(C):
            Ec = max(e.size for e in class_elems[c])
            class_elems[c] = [
                np.concatenate([e, np.full(Ec - e.size, -1, dtype=np.int64)])
                for e in class_elems[c]]

        # ---- per-class node plans + slave constraints ----
        classes = []        # per class: stacked per-shard arrays
        slaves = []         # per class pair (c fine -> c+1 coarse)
        cls_setups = [[_class_setup(mesh_by_order[orders[c]], class_elems[c][p],
                                    E_pad, with_geom=(p in owned_set))
                       for p in range(Pn)] for c in range(C)]

        nv = mesh1.num_nodes
        Po = len(owned)
        for c in range(C):
            n_o = orders[c] + 1
            mesh_o = mesh_by_order[orders[c]]
            per = cls_setups[c]
            NNs = [s["NN"] for s in per]
            NN = max(NNs)
            Ec = per[0]["E"]
            npe_c = per[0]["npe"]
            # stacked device arrays: owned shards only (multi-host local-only
            # setup); maxima above stay global for SPMD shape consistency
            gids = np.stack([
                np.where(per[p]["gids"] == per[p]["NN"], NN, per[p]["gids"])
                for p in owned])
            nmask = np.zeros((Po, NN + 1))
            for k, p in enumerate(owned):
                nmask[k, :per[p]["NN"]] = per[p]["nmask"][:per[p]["NN"]]
            geom = np.stack([per[p]["geom"] for p in owned])
            # element source slots in the all_gathered padded fine arrays;
            # element corner vertex ids + inverse point multiplicity (for the
            # vertex-space coarse correction of the hybrid inner)
            src = np.zeros((Po, Ec), dtype=np.int32)
            valid = np.zeros((Po, Ec))
            vids = np.full((Po, Ec, 2 ** dim), nv, dtype=np.int32)
            pw = np.zeros((Po, Ec * npe_c))
            for k, p in enumerate(owned):
                e = class_elems[c][p]
                real = e >= 0
                safe = np.where(real, e, 0)
                src[k] = np.where(
                    real, owner_of[safe] * E_pad + slot_of[safe], 0)
                valid[k] = real.astype(float)
                vids[k][real] = verts[safe][real]
                w = (1.0 / mesh_o.node_degree[safe]) * real[:, None]
                pw[k] = w.reshape(-1)
            classes.append({
                "order": orders[c], "n": n_o, "E": Ec, "NN": NN,
                "gids": gids, "nmask": nmask, "geom": geom,
                "src": src, "valid": valid, "vids": vids, "pw": pw,
                "D": diff_matrix(n_o),
            })

        per_slv_ids = {}    # [c][p] class-local fine slave node ids
        per_slv_cols = {}   # [c][p] class-local coarse constraint node ids
        per_slv_wts = {}    # [c][p] constraint weights (raw, un-padded)
        for c in range(C - 1):
            nf, nc = orders[c] + 1, orders[c + 1] + 1
            glo_f = mesh_by_order[orders[c]].glo_num
            glo_c = mesh_by_order[orders[c + 1]].glo_num
            per_ids, per_cols, per_wts = [], [], []
            for p in range(Pn):
                ef = class_elems[c][p]
                ec = class_elems[c + 1][p]
                pairs = gr.face_pairs(verts, ef[ef >= 0], ec[ec >= 0], dim)
                ids, cols, wts = gr.slave_constraints(
                    pairs, verts, glo_f, glo_c, nf, nc, dim)
                lf_u = cls_setups[c][p]["uniq"]
                lc_u = cls_setups[c + 1][p]["uniq"]
                per_ids.append(np.searchsorted(lf_u, ids).astype(np.int32))
                Kc = nc ** (dim - 1)
                if ids.size:
                    per_cols.append(np.searchsorted(lc_u, cols).astype(
                        np.int32).reshape(ids.size, Kc))
                else:
                    per_cols.append(np.zeros((0, Kc), dtype=np.int32))
                per_wts.append(wts)
            per_slv_ids[c] = per_ids
            per_slv_cols[c] = per_cols
            per_slv_wts[c] = per_wts
            Ns = max(a.size for a in per_ids)     # global max (SPMD shapes)
            K = nc ** (dim - 1)
            ids_a = np.full((Po, Ns), classes[c]["NN"], dtype=np.int32)
            cols_a = np.full((Po, Ns, K), classes[c + 1]["NN"], dtype=np.int32)
            wts_a = np.zeros((Po, Ns, K))
            for j, p in enumerate(owned):
                k = per_ids[p].size
                if k:
                    ids_a[j, :k] = per_ids[p]
                    cols_a[j, :k] = per_cols[p]
                    wts_a[j, :k] = per_wts[p]
            slaves.append({"ids": ids_a, "cols": cols_a, "wts": wts_a})

        # ---- superdomain compression setup (S10): per-shard algebraic far
        #      field. Each far element's Q1 contribution lands exactly once in
        #      the composite (SEM classes carry own+rings, A_sup carries far);
        #      superdomain_overlap element layers of the far zone keep fine
        #      vertex DOFs, the deep rest is aggregated. ----
        sup = None
        if compress:
            import scipy.sparse as sp
            from ..amg.aggregation import (q1_vertex_matrix_subset,
                                           superdomain_basis)
            from ..amg.composite import _mask_fold
            vmask_glob = np.ones(nv)
            vmask_glob[mesh1.glo_num[mesh1.dirichlet_mask < 0.5]] = 0.0
            degree_v = np.bincount(verts.ravel(), minlength=nv).astype(float)

            per = []
            for p in range(Pn):
                own, rings = region_sets[p]
                far = far_sets[p]
                region = np.concatenate([own] + list(rings))
                # kept-fine far layers: superdomain_overlap adjacency steps
                reg_mask = np.zeros(adj.shape[0], dtype=bool)
                reg_mask[region] = True
                grown = reg_mask.copy()
                for _ in range(max(superdomain_overlap, 1)):
                    grown |= (adj @ grown.astype(np.int8)).astype(bool)
                far_mask = np.zeros(adj.shape[0], dtype=bool)
                far_mask[far] = True
                ov_elems = np.flatnonzero(grown & far_mask)

                in_far = np.zeros(nv, dtype=bool)
                in_far[verts[far].ravel()] = True
                keep_fine = np.zeros(nv, dtype=bool)
                keep_fine[verts[ov_elems].ravel()] = True
                keep_fine &= in_far
                deep = in_far & ~keep_fine & (vmask_glob > 0.5)

                A_far = _mask_fold(q1_vertex_matrix_subset(mesh1, far),
                                   vmask_glob)
                P_sup, fine_idx = superdomain_basis(A_far, keep_fine, deep)
                A_sup = (P_sup.T @ A_far @ P_sup).tocsr()
                # interface vertices shared with the coarsest SEM class
                lc_u = cls_setups[C - 1][p]["uniq"]
                pos = np.searchsorted(lc_u, fine_idx)
                inb = (pos < lc_u.size) & (
                    lc_u[np.minimum(pos, lc_u.size - 1)] == fine_idx)
                iface = [(int(pos[k]), int(k))
                         for k in np.flatnonzero(inb)]
                mask_sup = np.ones(P_sup.shape[1])
                mask_sup[:fine_idx.size] = vmask_glob[fine_idx]
                # vertex-restriction weight: fraction of the vertex's elements
                # that live in the far zone (the far field's share of the
                # global vertex residual)
                far_deg = np.bincount(verts[far].ravel(), minlength=nv)
                wrest = np.ones(P_sup.shape[1])
                wrest[:fine_idx.size] = far_deg[fine_idx] / degree_v[fine_idx]
                per.append({
                    "A": A_sup, "P": P_sup, "mask": mask_sup, "wrest": wrest,
                    "iface": iface, "far": far,
                })

            ns = max(d["A"].shape[0] for d in per)
            Ef = max(d["far"].size for d in per)
            Ni = max(len(d["iface"]) for d in per)
            A_pad, P_pad, Pt_pad = [], [], []
            mask_a = np.zeros((Po, ns))
            wrest_a = np.zeros((Po, ns))
            diag_a = np.zeros((Po, ns))
            ifc_a = np.full((Po, Ni), classes[C - 1]["NN"], dtype=np.int32)
            ifs_a = np.full((Po, Ni), ns, dtype=np.int32)
            sup_src = np.zeros((Po, Ef), dtype=np.int32)
            sup_valid = np.zeros((Po, Ef))
            sup_vids = np.full((Po, Ef, 2 ** dim), nv, dtype=np.int32)
            for p, d in enumerate(per):
                # resized CSRs for ALL shards (cheap; bsr_stack derives the
                # global pad count from every pattern, values only for owned)
                A = sp.csr_matrix(d["A"])
                A.resize((ns, ns))
                A_pad.append(A)
                Pm = sp.csr_matrix(d["P"])
                Pm.resize((nv, ns))
                P_pad.append(Pm)
                Pt_pad.append(Pm.T.tocsr())
            for j, p in enumerate(owned):
                d = per[p]
                k = d["A"].shape[0]
                mask_a[j, :k] = d["mask"]
                wrest_a[j, :k] = d["wrest"]
                diag_a[j, :k] = d["A"].diagonal()
                for i, (ci, si) in enumerate(d["iface"]):
                    ifc_a[j, i] = ci
                    ifs_a[j, i] = si
                f = d["far"]
                sup_src[j, :f.size] = owner_of[f] * E_pad + slot_of[f]
                sup_valid[j, :f.size] = 1.0
                sup_vids[j, :f.size] = verts[f]
            from ..ops.csr import bsr_stack
            sup = {
                "A": bsr_stack(A_pad, dtype=dtype, select=owned),
                "P": bsr_stack(P_pad, dtype=dtype, select=owned),
                "Pt": bsr_stack(Pt_pad, dtype=dtype, select=owned),
                "mask": mask_a, "wrest": wrest_a, "diag": diag_a,
                "ifc": ifc_a, "ifs": ifs_a,
                "src": sup_src, "valid": sup_valid, "vids": sup_vids,
                "ns": ns,
            }

        # ---- face-block assembly plans + touched-node compaction ----
        # The per-class scatter/gather assembly dominates the composite solve
        # on TPU (~30 ms/pass at 2.1M pts); replace it with the face-pair
        # exchange (ops/face_dssum.py, exact) and run the slave/superdomain
        # constraint algebra on a COMPACT vector of just the touched nodes.
        # The index pass runs for every shard (global pad maxima are SPMD
        # shape requirements); stacked device arrays are owned-only.
        fb_meta = None
        if dim == 3:
            from ..ops import face_dssum as fd
            ok = True
            cls_plans = []          # [c][p] -> plan arrays
            cls_NR = []
            cls_NG = []
            for c in range(C):
                n_c = orders[c] + 1
                plans_c, NRs, NGs = [], [], []
                for p in range(Pn):
                    s = cls_setups[c][p]
                    gl = s["gids"].reshape(s["E"], s["npe"]).astype(np.int64)
                    gl = np.where(gl == s["NN"], -1, gl)
                    deg_c = np.bincount(gl[gl >= 0],
                                        minlength=s["NN"]).astype(np.int64)
                    deg_pts = np.where(gl >= 0, deg_c[np.maximum(gl, 0)], 0)
                    plan, meta = fd.build_face_plan(gl, n_c, deg_pts)
                    if plan is None:
                        ok = False
                        break
                    # plan's rest_ids index its own compact node list; remap
                    # to CLASS-LOCAL node ids so the compact vector can be
                    # shared with the slave algebra? No — keep the plan
                    # self-contained; slave algebra uses its own compact set.
                    plans_c.append(plan)
                    NRs.append(meta["num_rest_nodes"])
                    NGs.append(meta["num_edge_groups"])
                if not ok:
                    break
                cls_plans.append(plans_c)
                cls_NR.append(max(NRs) if NRs else 0)
                cls_NG.append(max(NGs) if NGs else 0)
            if ok:
                # touched-node sets per class: slave cols from below, slave
                # ids to above, superdomain interface on the coarsest class
                cls_T = []          # [c][p] -> sorted class-local node ids
                for c in range(C):
                    per_T = []
                    for p in range(Pn):
                        parts_T = []
                        if c > 0 and per_slv_cols[c - 1][p].size:
                            parts_T.append(per_slv_cols[c - 1][p].reshape(-1))
                        if c < C - 1 and per_slv_ids[c][p].size:
                            parts_T.append(per_slv_ids[c][p])
                        if c == C - 1 and sup is not None:
                            parts_T.append(np.asarray(
                                [ci for ci, _ in per[p]["iface"]],
                                dtype=np.int64))
                        T = (np.unique(np.concatenate(parts_T))
                             if parts_T else np.zeros(0, np.int64))
                        per_T.append(T)
                    cls_T.append(per_T)
                cls_NT = [max(t.size for t in cls_T[c]) for c in range(C)]

                # remap slave/sup index arrays into T-compact numbering and
                # build per-class write-back maps (owned shards only)
                def tmap_of(c, p):
                    T = cls_T[c][p]
                    m = np.full(cls_setups[c][p]["NN"] + 1, cls_NT[c],
                                dtype=np.int32)
                    m[T] = np.arange(T.size, dtype=np.int32)
                    return m

                for c in range(C - 1):
                    s = slaves[c]
                    for j, p in enumerate(owned):
                        mf = tmap_of(c, p)
                        mc = tmap_of(c + 1, p)
                        nn_f = cls_setups[c][p]["NN"]
                        nn_c = cls_setups[c + 1][p]["NN"]
                        real = s["ids"][j] < nn_f
                        s["ids"][j] = np.where(
                            real, mf[np.minimum(s["ids"][j], nn_f)],
                            cls_NT[c])
                        realc = s["cols"][j] < nn_c
                        s["cols"][j] = np.where(
                            realc, mc[np.minimum(s["cols"][j], nn_c)],
                            cls_NT[c + 1])
                if sup is not None:
                    for j, p in enumerate(owned):
                        mt = tmap_of(C - 1, p)
                        nn_t = cls_setups[C - 1][p]["NN"]
                        real = sup["ifc"][j] < nn_t
                        sup["ifc"][j] = np.where(
                            real, mt[np.minimum(sup["ifc"][j], nn_t)],
                            cls_NT[C - 1])

                fb_meta = {"n": [orders[c] + 1 for c in range(C)],
                           "NR": cls_NR, "NT": cls_NT, "NG": cls_NG}
                for c in range(C):
                    shapes = fd.max_shapes(cls_plans[c])
                    padded = [fd.plan_pad_to(cls_plans[c][p], cls_NR[c],
                                             shapes) for p in owned]
                    fbp = {key: np.stack([pl[key] for pl in padded])
                           for key in padded[0]}
                    for key in ("rowmask", "emask", "eM"):
                        fbp[key] = fbp[key].astype(np.float64)
                    trep = np.zeros((Po, cls_NT[c] + 1), dtype=np.int32)
                    NPT = 0
                    tp_list, ti_list = [], []
                    for j, p in enumerate(owned):
                        T = cls_T[c][p]
                        tm = tmap_of(c, p)
                        gl = cls_setups[c][p]["gids"]
                        sel = np.flatnonzero(np.isin(
                            gl, T, assume_unique=False))
                        tp_list.append(sel.astype(np.int64))
                        ti_list.append(tm[gl[sel]])
                        # representative point per touched node: reversed
                        # fancy assignment keeps the FIRST occurrence
                        first = np.zeros(cls_NT[c] + 1, dtype=np.int32)
                        first[tm[gl[sel]][::-1]] = sel[::-1]
                        trep[j] = first
                        NPT = max(NPT, sel.size)
                    tpts = np.full((Po, NPT), 2 ** 31 - 1, dtype=np.int64)
                    tids = np.full((Po, NPT), cls_NT[c], dtype=np.int32)
                    for j in range(Po):
                        k = tp_list[j].size
                        tpts[j, :k] = tp_list[j]
                        tids[j, :k] = ti_list[j]
                    classes[c]["fbp"] = fbp
                    classes[c]["trep"] = trep
                    classes[c]["tpts"] = tpts
                    classes[c]["tids"] = tids
                    # point-space mask (replaces nmask[gids] gather)
                    pm = np.zeros((Po, classes[c]["E"]
                                   * classes[c]["n"] ** dim))
                    for j, p in enumerate(owned):
                        s = cls_setups[c][p]
                        pm[j] = s["nmask"][np.minimum(s["gids"], s["NN"])]
                    classes[c]["pmask"] = pm

        if inner == "fem-amg":
            # reference-faithful S12/S13: composite low-order FEM matrix
            # (exact SEM-Q1 for order-1 classes, Kuhn P1 on GLL subcells
            # above) + aggregation hierarchy per shard, padded to
            # SPMD-uniform shapes (amg/unstructured_fem.py). The setup is
            # replicated over shards — like the reference's replicated
            # element graph (subdomain.tpp:198-430) — so multi-process
            # runs produce consistent stacked patterns.
            from ..amg.unstructured_fem import (
                build_unstructured_fem_shard, pad_fem_shards)
            fem_shards = []
            for p in range(Pn):
                slv_p = [(per_slv_ids[c][p], per_slv_cols[c][p],
                          per_slv_wts[c][p]) for c in range(C - 1)]
                sup_p = None
                if sup is not None:
                    sup_p = {"A": per[p]["A"], "iface": per[p]["iface"],
                             "mask": per[p]["mask"]}
                fem_shards.append(build_unstructured_fem_shard(
                    orders, mesh_by_order,
                    [class_elems[c][p] for c in range(C)],
                    [cls_setups[c][p] for c in range(C)],
                    slv_p, sup_p, max_coarse=max_coarse))
            fem_host = pad_fem_shards(
                fem_shards, ns_pad=sup["ns"] if sup is not None else 0)

    # ---- device pytree (shard_put: squeezed single-device, stacked
    #      single-process SPMD, global jax.Arrays multi-process) ----
    sh = domain.shard_put

    def sh_bsr(b):
        from ..ops.csr import BsrMatrix
        return BsrMatrix(vals=sh(np.asarray(b.vals)),
                         bcols=sh(np.asarray(b.bcols)),
                         brows=sh(np.asarray(b.brows)),
                         n_rows=b.n_rows, n_cols=b.n_cols,
                         layout=b.layout)

    def _cls_device(cl):
        out = {
            "gids": sh(cl["gids"]),
            "nmask": sh(cl["nmask"], dtype=dtype),
            "geom": sh(cl["geom"], dtype=dtype),
            "src": sh(cl["src"]),
            "valid": sh(cl["valid"], dtype=dtype),
            "vids": sh(cl["vids"]),
            "pw": sh(cl["pw"], dtype=dtype),
            "D": jnp.asarray(cl["D"], dtype=dtype),
        }
        if "fbp" in cl:
            out["fbp"] = {
                k: sh(v, dtype=(dtype if v.dtype == np.float64 else None))
                for k, v in cl["fbp"].items()}
            out["trep"] = sh(cl["trep"])
            out["tpts"] = sh(cl["tpts"])
            out["tids"] = sh(cl["tids"])
            out["pmask"] = sh(cl["pmask"], dtype=dtype)
        return out

    extra = {
        "classes": [_cls_device(cl) for cl in classes],
        "slv": [{
            "ids": sh(s["ids"]),
            "cols": sh(s["cols"]),
            "wts": sh(s["wts"], dtype=dtype),
        } for s in slaves],
        "Jlvl": [jnp.asarray(interp_matrix(orders[i + 1] + 1,
                                           orders[i] + 1), dtype=dtype)
                 for i in range(L - 1)],
    }
    if sup is not None:
        extra["sup"] = {
            "A": sh_bsr(sup["A"]),
            "P": sh_bsr(sup["P"]),
            "Pt": sh_bsr(sup["Pt"]),
            "mask": sh(sup["mask"], dtype=dtype),
            "wrest": sh(sup["wrest"], dtype=dtype),
            "diag": sh(sup["diag"], dtype=dtype),
            "ifc": sh(sup["ifc"]),
            "ifs": sh(sup["ifs"]),
            "src": sh(sup["src"]),
            "valid": sh(sup["valid"], dtype=dtype),
            "vids": sh(sup["vids"]),
        }

    if inner == "fem-amg":
        # stacked device hierarchy (values for owned shards only; the
        # pad counts come from every shard's pattern — SPMD-consistent)
        from ..ops.csr import CooMatrix
        from ..ops.csr import bsr_stack as _bstack
        from ..ops.csr import coo_stack as _cstack
        owned_l = list(sd.owned) if sd.owned else list(range(Pn))
        nlev_f = len(fem_host[0]["chain"]["mats"])
        # block-8 packing for multi-million-row fem matrices: simplicial
        # FEM patterns fill 16x16 blocks poorly and the padded values
        # array alone OOM'd HBM at PB_146 (9.45M DOFs, 118M nnz)
        _fb = 8 if fem_host[0]["chain"]["mats"][0].shape[0] > 4_000_000 \
            else 16

        def _stk(mats):
            return sh_bsr(_bstack(mats, block=_fb, dtype=dtype,
                                  select=owned_l))

        def _stk_t(mats):
            # TRANSFER operators (Q/Qt selection, P/R interpolation):
            # 1-10 scattered entries per row fill 8x8 blocks at 2-6%, so
            # the padded BSR values dominate HBM at pebble-bed sizes
            # (Q 2.8 GB, P0/R0 3.9 GB each vs 0.1-0.6 GB as sorted COO);
            # the gather+segment-sum apply stays oracle-fast
            c = _cstack(mats, dtype=dtype, select=owned_l)
            return CooMatrix(vals=sh(np.asarray(c.vals)),
                             cols=sh(np.asarray(c.cols)),
                             rows=sh(np.asarray(c.rows)),
                             n_rows=c.n_rows, n_cols=c.n_cols)

        def _arr(xs, dt=dtype):
            return sh(np.stack([np.asarray(xs[p]) for p in owned_l]),
                      dtype=dt)

        fem_levels = []
        for l in range(nlev_f):
            diags = [fh["chain"]["mats"][l].diagonal() for fh in fem_host]
            fem_levels.append({
                "A": _stk([fh["chain"]["mats"][l] for fh in fem_host]),
                "invd": _arr([np.where(d != 0, 1.0 / d, 0.0)
                              for d in diags]),
                "lmax": _arr([
                    fh["chain"]["lmaxs"][l] if l < nlev_f - 1 else 1.0
                    for fh in fem_host]),
            })
        extra["fem"] = {
            "levels": fem_levels,
            "prolongs": [_stk_t([fh["chain"]["prolongs"][l]
                                 for fh in fem_host])
                         for l in range(nlev_f - 1)],
            "restricts": [_stk_t([fh["chain"]["prolongs"][l].T.tocsr()
                                  for fh in fem_host])
                          for l in range(nlev_f - 1)],
            "coarse_inv": _arr([fh["chain"]["coarse_inv"]
                                for fh in fem_host]),
            "Q": _stk_t([fh["Q"] for fh in fem_host]),
            "Qt": _stk_t([fh["Q"].T.tocsr() for fh in fem_host]),
            "dof_mask": _arr([fh["dof_mask"] for fh in fem_host]),
        }

    def core_specs(ax):
        def cspec(cl):
            s = {"gids": P(ax), "nmask": P(ax), "geom": P(ax),
                 "src": P(ax), "valid": P(ax), "vids": P(ax),
                 "pw": P(ax), "D": P()}
            if "fbp" in cl:
                s["fbp"] = {k: P(ax) for k in cl["fbp"]}
                s.update(trep=P(ax), tpts=P(ax), tids=P(ax), pmask=P(ax))
            return s

        specs = {
            "classes": [cspec(cl) for cl in classes],
            "slv": [{"ids": P(ax), "cols": P(ax), "wts": P(ax)}
                    for _ in slaves],
            "Jlvl": [P() for _ in extra["Jlvl"]],
        }
        if sup is not None:
            specs["sup"] = jax.tree.map(lambda _: P(ax), extra["sup"])
        if inner == "fem-amg":
            specs["fem"] = jax.tree.map(lambda _: P(ax), extra["fem"])
        return specs

    amg_pack = None
    if inner == "amg":
        # hybrid V-cycle (matrix-free redesign of S12/S13 for unstructured
        # meshes): Chebyshev smoothing directly on the composite SEM
        # operator + a replicated smoothed-aggregation hierarchy on the
        # global element-vertex Q1 matrix (the reference's superdomain-Q1
        # + BoomerAMG role, subdomain.tpp:1642-1858 / 3482-3489)
        from ..amg.aggregation import (q1_vertex_matrix, aggregation_chain,
                                       pack_level_chain)
        from ..utils.gll import gll_points_weights
        if payload is not None and payload.get("agg_info") is not None:
            agg_info, vmask = payload["agg_info"], payload["agg_vmask"]
        else:
            A_v, vmask = q1_vertex_matrix(
                mesh1 if payload is None else mesh_builder(1))
            agg_info = aggregation_chain(A_v, vmask,
                                         max_coarse=max_coarse)
        chain = pack_level_chain(agg_info, dtype=dtype)

        # trilinear corner-blend matrices (npe_o, 2^dim) per class: the
        # gather-free vertex<->nodal transfer factors
        def blend_matrix(n_o):
            r_, _ = gll_points_weights(n_o)
            t = (r_ + 1.0) / 2.0
            fac = np.stack([1.0 - t, t])          # (2, n)
            B = np.ones((2 ** dim,) + (n_o,) * dim)
            for cbit in range(2 ** dim):
                for d in range(dim):              # storage axis (0=slow)
                    bit = (cbit >> (dim - 1 - d)) & 1
                    shp = [1] * dim
                    shp[d] = n_o
                    B[cbit] = B[cbit] * fac[bit].reshape(shp)
            return B.reshape(2 ** dim, -1).T      # (npe, 2^dim)

        amg_pack = {
            "chain": chain,
            "vmask": jnp.asarray(vmask, dtype=dtype),
            "B": [jnp.asarray(blend_matrix(orders[c] + 1), dtype=dtype)
                  for c in range(C)],
        }
        extra["amg"] = amg_pack

    def extra_specs(ax):
        specs = core_specs(ax)
        if amg_pack is not None:
            specs["amg"] = {
                "chain": jax.tree.map(lambda _: P(), amg_pack["chain"]),
                "vmask": P(),
                "B": [P() for _ in amg_pack["B"]],
                "lmax0": P(ax),
            }
        return specs

    cls_sizes = [cl["E"] * cl["n"] ** dim for cl in classes]
    cls_shapes = [(cl["E"], cl["n"] ** dim) for cl in classes]
    NNs = [cl["NN"] for cl in classes]

    def make_ops(extra_x):
        ax = domain.axis_name
        cls_x = extra_x["classes"]
        slv_x = extra_x["slv"]
        Jlvl_x = extra_x["Jlvl"]
        sup_x = extra_x.get("sup")

        # Composite fields are LISTS: one (E_c, npe_c) block per order
        # class, plus the algebraic superdomain DOF vector when the far
        # field is compressed (the reference's split operator apply:
        # batched SEM on the subdomain + CSR SpMV on the superdomain,
        # subdomain.tpp:3942-3967). The generic Krylov solvers consume the
        # list pytree directly — nothing is concatenated.
        from ..ops.csr import bsr_spmv

        def comp_operator(parts):
            out = [sem.stiffness_apply(U, cx["geom"], cx["D"], dim)
                   for U, cx in zip(parts, cls_x)]
            if sup_x is not None:
                out.append(bsr_spmv(sup_x["A"], parts[C]))
            return out

        use_fb = fb_meta is not None and "fbp" in cls_x[0]

        def comp_dssum(parts, apply_mask=True):
            if use_fb:
                return comp_dssum_fb(parts, apply_mask)
            # scatter to per-class assembled nodes
            ws = []
            for c in range(C):
                w = jnp.zeros((NNs[c] + 1,), dtype=parts[c].dtype)
                ws.append(w.at[cls_x[c]["gids"]].add(
                    parts[c].reshape(-1), mode="drop"))
            # collapse slaved fine nodes onto the coarse trace, fine->coarse
            # (adjoint of the hanging-node rows, subdomain.tpp:1496-1582)
            for c in range(C - 1):
                s = slv_x[c]
                contrib = s["wts"] * ws[c][s["ids"]][:, None]
                ws[c + 1] = ws[c + 1].at[s["cols"]].add(contrib, mode="drop")
            w_sup = None
            if sup_x is not None:
                # interface stitching with the superdomain's kept-fine
                # vertices (S11, subdomain.tpp:2581-2747): both sides of a
                # shared vertex take the summed value
                w_sup = parts[C]
                shared = (ws[C - 1][sup_x["ifc"]]
                          + w_sup[sup_x["ifs"]])
                ws[C - 1] = ws[C - 1].at[sup_x["ifc"]].set(shared,
                                                           mode="drop")
                w_sup = w_sup.at[sup_x["ifs"]].set(shared, mode="drop")
            # prolong the assembled coarse trace back, coarse->fine
            for c in range(C - 2, -1, -1):
                s = slv_x[c]
                vals = (s["wts"] * ws[c + 1][s["cols"]]).sum(axis=1)
                ws[c] = ws[c].at[s["ids"]].set(vals, mode="drop")
            outs = []
            for c in range(C):
                w = ws[c] * cls_x[c]["nmask"] if apply_mask else ws[c]
                outs.append(w[cls_x[c]["gids"]].reshape(cls_shapes[c]))
            if sup_x is not None:
                outs.append(w_sup * sup_x["mask"] if apply_mask else w_sup)
            return outs

        def comp_dssum_fb(parts, apply_mask=True):
            # face-block exact assembly per class (ops/face_dssum.py),
            # with the slave/superdomain constraint algebra run on a
            # COMPACT vector of just the touched nodes — the full-size
            # class scatters/gathers of the fallback path are the
            # composite solve's dominant TPU cost (30 -> 2.15 ms/pass)
            from ..ops import face_dssum as fd
            ys, wTs = [], []
            for c in range(C):
                cx = cls_x[c]
                if cls_shapes[c][0] == 0:       # empty ring class
                    ys.append(parts[c])
                    wTs.append(jnp.zeros((cx["trep"].shape[0],),
                                         parts[c].dtype))
                    continue
                y = fd.face_assemble(parts[c], cx["fbp"],
                                     fb_meta["n"][c], fb_meta["NR"][c],
                                     num_edge_groups=fb_meta["NG"][c])
                ys.append(y)
                # compact touched-node values (trash slot NT reads
                # point 0 — every use of it is masked or dropped)
                wTs.append(y.reshape(-1)[cx["trep"]])
            for c in range(C - 1):
                s = slv_x[c]
                contrib = s["wts"] * wTs[c][s["ids"]][:, None]
                wTs[c + 1] = wTs[c + 1].at[s["cols"]].add(contrib,
                                                          mode="drop")
            w_sup = None
            if sup_x is not None:
                w_sup = parts[C]
                shared = wTs[C - 1][sup_x["ifc"]] + w_sup[sup_x["ifs"]]
                wTs[C - 1] = wTs[C - 1].at[sup_x["ifc"]].set(
                    shared, mode="drop")
                w_sup = w_sup.at[sup_x["ifs"]].set(shared, mode="drop")
            for c in range(C - 2, -1, -1):
                s = slv_x[c]
                vals = (s["wts"] * wTs[c + 1][s["cols"]]).sum(axis=1)
                wTs[c] = wTs[c].at[s["ids"]].set(vals, mode="drop")
            outs = []
            for c in range(C):
                cx = cls_x[c]
                if cls_shapes[c][0] == 0:
                    outs.append(ys[c])
                    continue
                y = ys[c].reshape(-1)
                y = y.at[cx["tpts"]].set(wTs[c][cx["tids"]], mode="drop")
                if apply_mask:
                    y = y * cx["pmask"]
                outs.append(y.reshape(cls_shapes[c]))
            if sup_x is not None:
                outs.append(w_sup * sup_x["mask"] if apply_mask else w_sup)
            return outs

        def comp_assemble(parts):
            """The GATHER half of comp_dssum_fb — per-class exact
            face/edge/rest assembly sums (the reference's assemble
            region; Qt accumulation) without the constraint write-back
            or mask. Exposed for the phase taxonomy's assemble vs
            unassemble rows (poisson.cpp:259-358)."""
            from ..ops import face_dssum as fd
            ys = []
            for c in range(C):
                cx = cls_x[c]
                if cls_shapes[c][0] == 0:
                    ys.append(parts[c])
                    continue
                ys.append(fd.face_assemble(
                    parts[c], cx["fbp"], fb_meta["n"][c],
                    fb_meta["NR"][c], num_edge_groups=fb_meta["NG"][c]))
            if sup_x is not None:
                ys.append(parts[C])
            return ys

        def comp_dot(a, b):
            return krylov.tree_dot(a, b)

        def tree_cascade(r):
            # restriction cascade on the own elements (subdomain.okl:
            # 284-366; tree_construction.subdomain region, poisson.cpp:
            # 322-341)
            r_lvl = [r.reshape(E_pad, -1)]
            for Jl in Jlvl_x:
                r_lvl.append(interp.restrict(r_lvl[-1], Jl, dim))
            return r_lvl

        def tree_rhs(r, with_sup=True):
            # comm/compute overlap (round 5): each level's all_gather is
            # issued BEFORE the next level's restriction contraction —
            # the gather has no consumer until the takes below, so XLA's
            # async collectives fly it behind the remaining cascade
            # compute (the reference's gslib tree exchange + coarse
            # Allgatherv are blocking, subdomain.tpp:4613-4631)
            blocks = []
            cur = r.reshape(E_pad, -1)
            for c in range(C):
                if ax is not None and jax.lax.axis_size(ax) > 1:
                    # one all_gather per level; rings/far are then static
                    # per-shard takes
                    blocks.append(jax.lax.all_gather(cur, ax, axis=0,
                                                     tiled=True))
                else:
                    blocks.append(cur)
                if c < C - 1:
                    cur = interp.restrict(cur, Jlvl_x[c], dim)
            gathered_last = blocks[C - 1]
            parts = []
            for c in range(C):
                sel = blocks[c][cls_x[c]["src"]]
                parts.append(sel * cls_x[c]["valid"][:, None])
            if sup_x is not None and with_sup:
                # superdomain RHS: vertex-assemble the far elements'
                # restricted residual, project with P^T (the reference's
                # Pt.multiply, subdomain.tpp:4635-4645)
                sel = gathered_last[sup_x["src"]] * sup_x["valid"][:, None]
                w_v = jnp.zeros((nv + 1,), dtype=sel.dtype)
                w_v = w_v.at[sup_x["vids"]].add(sel, mode="drop")
                parts.append(bsr_spmv(sup_x["Pt"], w_v[:nv]))
            return parts

        return {"comp_operator": comp_operator,
                "comp_dssum": comp_dssum,
                "comp_assemble": (comp_assemble if use_fb else None),
                "comp_dot": comp_dot,
                "tree_rhs": tree_rhs, "tree_cascade": tree_cascade,
                # phase sub-kind: level gathers + takes WITHOUT the
                # superdomain projection (tree_rhs − tree_levels = the
                # superdomain-project leg of the tree exchange)
                "tree_levels": lambda r: tree_rhs(r, with_sup=False),
                "cls_x": cls_x, "sup_x": sup_x}

    def comp_inv_diag_of(ops_c):
        cls_x = ops_c["cls_x"]
        diag = [sem.stiffness_diagonal(cx["geom"], cx["D"], dim)
                for cx in cls_x]
        if ops_c["sup_x"] is not None:
            diag.append(ops_c["sup_x"]["diag"])
        diag_c = ops_c["comp_dssum"](diag, apply_mask=False)
        return [jnp.where(d > 0, 1.0 / d, 0.0) for d in diag_c]

    def build(arrays, extra_x, ops):
        operator_f, dssum_f, dot_f, dot2_f = ops
        ops_c = make_ops(extra_x)
        comp_operator = ops_c["comp_operator"]
        comp_dssum = ops_c["comp_dssum"]
        comp_dot = ops_c["comp_dot"]
        tree_rhs = ops_c["tree_rhs"]
        tm = jax.tree.map

        vcycle_parts = {}
        if inner == "amg":
            from ..amg.vcycle import cheby_smooth, vcycle_apply
            from ..ops.csr import bsr_spmv
            amg_x = extra_x["amg"]
            cls_x = ops_c["cls_x"]
            sup_x = ops_c["sup_x"]
            comp_inv_diag = comp_inv_diag_of(ops_c)
            comp_mask = [cx["nmask"][cx["gids"]].reshape(cls_shapes[c])
                         for c, cx in enumerate(cls_x)]
            if sup_x is not None:
                comp_mask.append(sup_x["mask"])
            lmax0 = amg_x["lmax0"]
            nvp = amg_x["vmask"].shape[0]

            def A_mf(x):
                return comp_dssum(comp_operator(x), apply_mask=True)

            def restrict_to_vertex(parts):
                acc = jnp.zeros((nvp + 1,), dtype=parts[0].dtype)
                for c, cx in enumerate(cls_x):
                    W = (cx["pw"] * parts[c].reshape(-1)).reshape(
                        parts[c].shape)
                    contrib = jnp.einsum("pc,ep->ec", amg_x["B"][c], W)
                    acc = acc.at[cx["vids"]].add(contrib, mode="drop")
                acc = acc[:nvp]
                if sup_x is not None:
                    acc = acc + bsr_spmv(sup_x["P"],
                                         parts[C] * sup_x["wrest"])
                return acc * amg_x["vmask"]

            def prolong_from_vertex(v):
                vp = jnp.concatenate([v * amg_x["vmask"],
                                      jnp.zeros((1,), v.dtype)])
                outs = []
                for c, cx in enumerate(cls_x):
                    vals = vp[cx["vids"]]             # (Ec, 2^dim)
                    outs.append(jnp.einsum("pc,ec->ep", amg_x["B"][c],
                                           vals))
                if sup_x is not None:
                    outs.append(bsr_spmv(sup_x["Pt"], vp[:nvp]))
                return [o * m for o, m in zip(outs, comp_mask)]

            def inner_precond(rr):
                fc = comp_dssum(rr, apply_mask=True)
                x = cheby_smooth(A_mf, comp_inv_diag, lmax0, fc, None,
                                 cheby_order)
                for _ in range(num_vcycles):
                    r = tm(jnp.subtract, fc, A_mf(x))
                    v = vcycle_apply(amg_x["chain"], restrict_to_vertex(r),
                                     cheby_order=cheby_order)
                    x = tm(jnp.add, x, prolong_from_vertex(v))
                    x = cheby_smooth(A_mf, comp_inv_diag, lmax0, fc, x,
                                     cheby_order)
                return x

            # V-cycle leg closures for the phase taxonomy
            # (poisson.cpp:277-293 legs split)
            vcycle_parts = {
                "inner_smooth": lambda x: cheby_smooth(
                    A_mf, comp_inv_diag, lmax0, x, None, cheby_order),
                "inner_transfer": lambda x: prolong_from_vertex(
                    restrict_to_vertex(x)),
                "inner_coarse": lambda x: prolong_from_vertex(
                    vcycle_apply(amg_x["chain"], restrict_to_vertex(x),
                                 cheby_order=cheby_order)),
            }
        elif inner == "jacobi":
            comp_inv_diag = comp_inv_diag_of(ops_c)

            def inner_precond(rr):
                return tm(jnp.multiply, comp_dssum(rr, apply_mask=True),
                          comp_inv_diag)
        elif inner == "fem-amg":
            # the reference's low-order FEM AMG V-cycle on the composite
            # (S12/S13, subdomain.tpp:3987-4159), all-device: gather the
            # unassembled composite residual to FEM DOFs (Q^T), V-cycle
            # on the aggregation hierarchy, scatter back (Q)
            from ..amg.vcycle import vcycle_apply
            from ..ops.csr import sparse_spmv as _bspmv
            fem_x = extra_x["fem"]
            fem_tree = {"levels": fem_x["levels"],
                        "prolongs": fem_x["prolongs"],
                        "restricts": fem_x["restricts"],
                        "coarse_inv": fem_x["coarse_inv"]}
            sup_x0 = ops_c["sup_x"]

            def inner_precond(rr):
                flat = jnp.concatenate([p.reshape(-1) for p in rr])
                f = _bspmv(fem_x["Qt"], flat) * fem_x["dof_mask"]
                v = vcycle_apply(fem_tree, f, cheby_order=cheby_order,
                                 num_cycles=num_vcycles)
                z = _bspmv(fem_x["Q"], v * fem_x["dof_mask"])
                outs = []
                off = 0
                for c in range(C):
                    outs.append(z[off:off + cls_sizes[c]].reshape(
                        cls_shapes[c]))
                    off += cls_sizes[c]
                if sup_x0 is not None:
                    outs.append(z[off:])
                return outs
        elif inner == "none":
            def inner_precond(rr):
                return comp_dssum(rr, apply_mask=True)
        else:
            raise NotImplementedError(
                f"unstructured composite inner={inner!r} "
                "(use 'amg', 'fem-amg', 'jacobi' or 'none')")

        def comp_dot2(a, b, c, d):
            # fused rank-local double dot (no psum: rank-local composite,
            # subdomain.tpp:4491-4557)
            return comp_dot(a, b), comp_dot(c, d)

        def _solve_inner(r):
            # STYPE -> PTYPE cast at the tree boundary (subdomain.okl:268)
            f_comp = tree_rhs(r.astype(dtype))
            # the inner Krylov state lives FLAT per class: element-layout
            # leaves (E, n, n, n) with n=8 tile-pad their minor dim to
            # 128 (16x) wherever XLA materializes them at while/switch
            # boundaries (observed 819 MB temps for 51 MB fields at
            # PB_146); 1-D leaves tile clean. The composite ops reshape
            # at their own boundary, adjacent to the einsum producers/
            # consumers where layout assignment is free.
            shps = [p.shape for p in f_comp]

            def wrap(fn, *fa, **fk):
                def g(fl):
                    shaped = [q.reshape(s) for q, s in zip(fl, shps)]
                    return [o.reshape(-1) for o in fn(shaped, *fa, **fk)]
                return g

            op_f = wrap(comp_operator)
            pre_f = wrap(inner_precond)
            ds_f = wrap(comp_dssum, apply_mask=True)
            f_flat = [p.reshape(-1) for p in f_comp]
            if inner_solver == "fcg":
                # fixed-iteration inner FCG (subdomain.tpp:4161-4268)
                res = krylov.fcg(
                    op_f, pre_f, ds_f,
                    comp_dot, comp_dot2, f_flat,
                    max_iterations=num_iterations,
                    tolerance=0.0)
            else:
                res = krylov.fgmres(
                    op_f, pre_f, ds_f,
                    comp_dot, f_flat,
                    max_iterations=num_iterations,
                    num_vectors=num_iterations,
                    tolerance=0.0)
            # own elements sit in class 0's leading E_pad slots
            npe_c = int(np.prod(shps[0][1:]))
            z = res.u[0][:E_pad * npe_c].astype(domain.dtype)
            return (dssum_f(z, apply_mask=True, apply_weight=True),
                    res.residual_history)

        def precond(r):
            return _solve_inner(r)[0]

        # inner-solve observability + per-region phase closures (the
        # reference's subdomain.tpp:4430 prints / poisson.cpp:259-358
        # timed regions; see Domain.precond_probe / Domain.phase_chain)
        precond.probe = _solve_inner
        precond.parts = {
            "tree_rhs": lambda r: tree_rhs(r.astype(dtype)),
            "tree_cascade":
                lambda r: ops_c["tree_cascade"](r.astype(dtype)),
            "tree_levels":
                lambda r: ops_c["tree_levels"](r.astype(dtype)),
            "comp_operator": comp_operator,
            "comp_dssum": lambda x: comp_dssum(x, apply_mask=True),
            "inner_precond": inner_precond,
            **vcycle_parts,
        }
        if ops_c["comp_assemble"] is not None:
            precond.parts["comp_assemble"] = ops_c["comp_assemble"]
        return precond

    if inner == "amg" and payload is not None \
            and payload.get("lmax0") is not None:
        # (Po,)-stacked per-owned values -> squeezed / stacked / global
        extra["amg"]["lmax0"] = sh(np.atleast_1d(payload["lmax0"]),
                                   dtype=dtype)
    elif inner == "amg":
        # Chebyshev lambda_max(D^-1 S A) of the composite, by device power
        # iteration over the same traced ops (hypre's eigenvalue-estimate
        # role, subdomain.tpp:3496-3497)
        core = {k: extra[k] for k in ("classes", "slv", "Jlvl", "sup")
                if k in extra}

        def _lmax_impl(core_x):
            ops_c = make_ops(core_x)
            invd = comp_inv_diag_of(ops_c)
            cls_x = ops_c["cls_x"]
            tm2 = jax.tree.map
            mask = [cx["nmask"][cx["gids"]].reshape(cls_shapes[c])
                    for c, cx in enumerate(cls_x)]
            if ops_c["sup_x"] is not None:
                mask.append(ops_c["sup_x"]["mask"])
            off = 0
            x0 = []
            for m in mask:
                sz = int(np.prod(m.shape))
                x0.append(jnp.sin(
                    (jnp.arange(sz, dtype=dtype) + off)
                    * 0.7311).reshape(m.shape) * m)
                off += sz

            def body(_, carry):
                x, lam = carry
                y = tm2(jnp.multiply, invd, ops_c["comp_dssum"](
                    ops_c["comp_operator"](x), apply_mask=True))
                num = krylov.tree_dot(y, y)
                den = jnp.maximum(krylov.tree_dot(x, x), 1e-30)
                lam = jnp.sqrt(num / den)
                scale = 1.0 / jnp.maximum(jnp.sqrt(num), 1e-30)
                return (tm2(lambda yl: scale * yl, y), lam)

            lam0 = krylov.tree_dot(x0, x0) * 0.0 + 1.0
            _, lam = jax.lax.fori_loop(0, 20, body, (x0, lam0))
            return lam * 1.1

        if domain.spmd:
            ax = domain.axis_name
            cspecs = core_specs(ax)

            def _spmd_lmax(core_x):
                sq2 = jax.tree.map(
                    lambda s, x: x[0] if s == P(ax) else x, cspecs, core_x,
                    is_leaf=lambda s: isinstance(s, P))
                return _lmax_impl(sq2)[None]

            fn = jax.shard_map(_spmd_lmax, mesh=domain.device_mesh,
                               in_specs=(cspecs,), out_specs=P(ax))
            extra["amg"]["lmax0"] = jax.jit(fn)(core)
        else:
            extra["amg"]["lmax0"] = jax.jit(_lmax_impl)(core)

    if setup_cache is not None and payload is None:
        from ..runtime.checkpoint import save_setup_payload
        sav = {"classes": classes, "slaves": slaves, "sup": sup,
               "fb_meta": fb_meta, "nv": nv, "fem": fem_host,
               "agg_info": None, "agg_vmask": None, "lmax0": None}
        if inner == "amg":
            sav["agg_info"] = agg_info
            sav["agg_vmask"] = vmask
            # float64 numpy holds every ptype's value exactly (f32/bf16
            # round-trip bitwise; jnp would silently clamp to f32 when
            # x64 is off). Stored (Po,)-stacked per OWNED shards: a
            # multi-process global array is fetched through its
            # addressable shards only.
            lm = extra["amg"]["lmax0"]
            if domain.multiprocess:
                shl = sorted(lm.addressable_shards,
                             key=lambda s: s.index[0].start or 0)
                lm_np = np.concatenate(
                    [np.asarray(s.data).reshape(-1) for s in shl])
            else:
                lm_np = np.asarray(lm).reshape(-1)
            sav["lmax0"] = lm_np.astype(np.float64)
        save_setup_payload(setup_cache, sav)

    return Preconditioner(
        build=build, extra=extra, _extra_specs=extra_specs,
        # region provenance for the composite field dump (the payload
        # path has no element lists — dumping needs a fresh setup)
        region_info=(None if payload is not None else {
            "kind": "unstructured",
            "orders": list(orders),
            "elems": {p_: [class_elems[c][p_] for c in range(C)]
                      for p_ in (list(sd.owned) if sd.owned
                                 else range(Pn))},
        }))
