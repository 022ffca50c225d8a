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


def _class_setup(mesh_o, elems, E_pad):
    """Node plan for one order class: elems (with -1 pads) -> dense local
    node ids, geometry, masks."""
    n_o = mesh_o.poly_degree + 1
    npe = mesh_o.num_points_per_elem
    Ec = elems.shape[0]
    real = elems >= 0
    safe = np.where(real, elems, 0)

    glo = np.where(real[:, None], mesh_o.glo_num[safe], -1)
    uniq, inv = np.unique(glo[real], return_inverse=True)
    NN = uniq.size
    gids = np.full((Ec, npe), NN, dtype=np.int32)
    gids[real] = inv.reshape(-1, npe).astype(np.int32)

    geom = np.zeros((Ec, npe, mesh_o.num_geom))
    geom[real] = mesh_o.geom[safe][real]
    nmask = np.ones(NN + 1)
    nmask[NN] = 0.0
    pm = mesh_o.dirichlet_mask[safe]
    nmask[gids[real].ravel()] = pm[real].ravel()

    # global node id -> local, for the slave constraint wiring
    lookup = {int(g): i for i, g in enumerate(uniq)}
    return {
        "n": n_o, "npe": npe, "E": Ec, "NN": NN,
        "gids": gids.reshape(-1), "geom": geom, "nmask": nmask,
        "lookup": lookup,
    }


def composite_dd_unstructured(domain, mesh_builder, poly_reduction: int,
                              subdomain_overlap: int = 1,
                              num_iterations: int = 4,
                              inner: str = "jacobi",
                              num_vcycles: int = 1,
                              cheby_order: int = 2,
                              ptype=None,
                              max_coarse: int = 600,
                              fine_mesh=None) -> Preconditioner:
    """Composite preconditioner for generic (non-slab) partitions.

    Same contract as solvers.subdomain.composite_dd; ``mesh_builder(o)``
    must return the SAME elements (same ids, same local frames) meshed at
    order o — the scramble generator guarantees this across orders.
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

    order_set = sorted(set(orders) | {1})
    mesh_by_order = {
        o: (fine_mesh if o == N and fine_mesh is not None
            else mesh_builder(o))
        for o in order_set}
    mesh1 = mesh_by_order[1]
    verts = mesh1.glo_num            # (E, 2^dim) corner vertex ids
    adj = gr.element_adjacency(verts)

    if domain.multiprocess:
        raise NotImplementedError(
            "the unstructured composite path is single-process for now "
            "(multi-host local-only setup covers the structured path)")

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
    for p in range(Pn):
        own = np.arange(bounds[p], bounds[p + 1])
        rings, far = gr.grow_regions(adj, own, L, overlap=V)
        own_padded = np.concatenate(
            [own, np.full(E_pad - own.size, -1, dtype=np.int64)])
        class_elems[0].append(np.concatenate([own_padded, rings[0]]))
        for l in range(1, L - 1):
            class_elems[l].append(rings[l])
        # coarsest class: ring L-1 + far (both order 1); L == 1 puts
        # everything in class 0
        if L > 1:
            class_elems[L - 1].append(np.concatenate([rings[L - 1], far]))
        else:
            class_elems[0][-1] = np.concatenate([class_elems[0][-1], far])

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
                                E_pad)
                   for p in range(Pn)] for c in range(C)]

    nv = mesh1.num_nodes
    for c in range(C):
        n_o = orders[c] + 1
        mesh_o = mesh_by_order[orders[c]]
        per = cls_setups[c]
        NNs = [s["NN"] for s in per]
        NN = max(NNs)
        Ec = per[0]["E"]
        npe_c = per[0]["npe"]
        gids = np.stack([
            np.where(s["gids"] == s["NN"], NN, s["gids"]) for s in per])
        nmask = np.zeros((Pn, NN + 1))
        for p, s in enumerate(per):
            nmask[p, :s["NN"]] = s["nmask"][:s["NN"]]
        geom = np.stack([s["geom"] for s in per])
        # element source slots in the all_gathered padded fine arrays;
        # element corner vertex ids + inverse point multiplicity (for the
        # vertex-space coarse correction of the hybrid inner)
        src = np.zeros((Pn, Ec), dtype=np.int32)
        valid = np.zeros((Pn, Ec))
        vids = np.full((Pn, Ec, 2 ** dim), nv, dtype=np.int32)
        pw = np.zeros((Pn, Ec * npe_c))
        for p in range(Pn):
            e = class_elems[c][p]
            real = e >= 0
            safe = np.where(real, e, 0)
            src[p] = np.where(
                real, owner_of[safe] * E_pad + slot_of[safe], 0)
            valid[p] = real.astype(float)
            vids[p][real] = verts[safe][real]
            w = (1.0 / mesh_o.node_degree[safe]) * real[:, None]
            pw[p] = w.reshape(-1)
        classes.append({
            "order": orders[c], "n": n_o, "E": Ec, "NN": NN,
            "gids": gids, "nmask": nmask, "geom": geom,
            "src": src, "valid": valid, "vids": vids, "pw": pw,
            "D": diff_matrix(n_o),
        })

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
            lf = cls_setups[c][p]["lookup"]
            lc = cls_setups[c + 1][p]["lookup"]
            per_ids.append(np.asarray([lf[int(g)] for g in ids],
                                      dtype=np.int32))
            Kc = nc ** (dim - 1)
            if ids.size:
                per_cols.append(np.asarray(
                    [[lc[int(g)] for g in row] for row in cols],
                    dtype=np.int32).reshape(ids.size, Kc))
            else:
                per_cols.append(np.zeros((0, Kc), dtype=np.int32))
            per_wts.append(wts)
        Ns = max(a.size for a in per_ids)
        K = nc ** (dim - 1)
        ids_a = np.full((Pn, Ns), classes[c]["NN"], dtype=np.int32)
        cols_a = np.full((Pn, Ns, K), classes[c + 1]["NN"], dtype=np.int32)
        wts_a = np.zeros((Pn, Ns, K))
        for p in range(Pn):
            k = per_ids[p].size
            if k:
                ids_a[p, :k] = per_ids[p]
                cols_a[p, :k] = per_cols[p]
                wts_a[p, :k] = per_wts[p]
        slaves.append({"ids": ids_a, "cols": cols_a, "wts": wts_a})

    # ---- device pytree ----
    sq = (lambda x: x) if domain.spmd else (lambda x: x[0])
    extra = {
        "classes": [{
            "gids": jnp.asarray(sq(cl["gids"])),
            "nmask": jnp.asarray(sq(cl["nmask"]), dtype=dtype),
            "geom": jnp.asarray(sq(cl["geom"]), dtype=dtype),
            "src": jnp.asarray(sq(cl["src"])),
            "valid": jnp.asarray(sq(cl["valid"]), dtype=dtype),
            "vids": jnp.asarray(sq(cl["vids"])),
            "pw": jnp.asarray(sq(cl["pw"]), dtype=dtype),
            "D": jnp.asarray(cl["D"], dtype=dtype),
        } for cl in classes],
        "slv": [{
            "ids": jnp.asarray(sq(s["ids"])),
            "cols": jnp.asarray(sq(s["cols"])),
            "wts": jnp.asarray(sq(s["wts"]), dtype=dtype),
        } for s in slaves],
        "Jlvl": [jnp.asarray(interp_matrix(orders[i + 1] + 1,
                                           orders[i] + 1), dtype=dtype)
                 for i in range(L - 1)],
    }

    def core_specs(ax):
        return {
            "classes": [{"gids": P(ax), "nmask": P(ax), "geom": P(ax),
                         "src": P(ax), "valid": P(ax), "vids": P(ax),
                         "pw": P(ax), "D": P()}
                        for _ in classes],
            "slv": [{"ids": P(ax), "cols": P(ax), "wts": P(ax)}
                    for _ in slaves],
            "Jlvl": [P() for _ in extra["Jlvl"]],
        }

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
        A_v, vmask = q1_vertex_matrix(mesh1)
        chain = pack_level_chain(
            aggregation_chain(A_v, vmask, max_coarse=max_coarse),
            dtype=dtype)

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

        def split(vec):
            out, off = [], 0
            for sz, shp in zip(cls_sizes, cls_shapes):
                out.append(vec[off:off + sz].reshape(shp))
                off += sz
            return out

        def join(parts):
            return jnp.concatenate([x.reshape(-1) for x in parts])

        def comp_operator(vec):
            parts = split(vec)
            return join([
                sem.stiffness_apply(U, cx["geom"], cx["D"], dim)
                for U, cx in zip(parts, cls_x)])

        def comp_dssum(vec, apply_mask=True):
            parts = split(vec)
            # scatter to per-class assembled nodes
            ws = []
            for c in range(C):
                w = jnp.zeros((NNs[c] + 1,), dtype=vec.dtype)
                ws.append(w.at[cls_x[c]["gids"]].add(
                    parts[c].reshape(-1), mode="drop"))
            # collapse slaved fine nodes onto the coarse trace, fine->coarse
            # (adjoint of the hanging-node rows, subdomain.tpp:1496-1582)
            for c in range(C - 1):
                s = slv_x[c]
                contrib = s["wts"] * ws[c][s["ids"]][:, None]
                ws[c + 1] = ws[c + 1].at[s["cols"]].add(contrib, mode="drop")
            # prolong the assembled coarse trace back, coarse->fine
            for c in range(C - 2, -1, -1):
                s = slv_x[c]
                vals = (s["wts"] * ws[c + 1][s["cols"]]).sum(axis=1)
                ws[c] = ws[c].at[s["ids"]].set(vals, mode="drop")
            outs = []
            for c in range(C):
                w = ws[c] * cls_x[c]["nmask"] if apply_mask else ws[c]
                outs.append(w[cls_x[c]["gids"]])
            return jnp.concatenate(outs)

        def comp_dot(a, b):
            return krylov.tree_dot(a, b)

        def tree_rhs(r):
            # restriction cascade on the own elements (subdomain.okl:284-366)
            r_lvl = [r.reshape(E_pad, -1)]
            for Jl in Jlvl_x:
                r_lvl.append(interp.restrict(r_lvl[-1], Jl, dim))
            parts = []
            for c in range(C):
                block = r_lvl[c]
                if ax is not None and jax.lax.axis_size(ax) > 1:
                    # one all_gather per level; rings/far are then static
                    # per-shard takes (replaces the reference's gslib tree
                    # exchange + coarse Allgatherv, subdomain.tpp:4613-4631)
                    block = jax.lax.all_gather(block, ax, axis=0, tiled=True)
                sel = block[cls_x[c]["src"]]
                parts.append(sel * cls_x[c]["valid"][:, None])
            return join(parts)

        return {"split": split, "join": join, "comp_operator": comp_operator,
                "comp_dssum": comp_dssum, "comp_dot": comp_dot,
                "tree_rhs": tree_rhs, "cls_x": cls_x}

    def comp_inv_diag_of(ops_c):
        cls_x = ops_c["cls_x"]
        diag = ops_c["join"]([
            sem.stiffness_diagonal(cx["geom"], cx["D"], dim)
            for cx in cls_x])
        diag_c = ops_c["comp_dssum"](diag, apply_mask=False)
        return jnp.where(diag_c > 0, 1.0 / diag_c, 0.0)

    def build(arrays, extra_x, ops):
        operator_f, dssum_f, dot_f, dot2_f = ops
        ops_c = make_ops(extra_x)
        comp_operator = ops_c["comp_operator"]
        comp_dssum = ops_c["comp_dssum"]
        comp_dot = ops_c["comp_dot"]
        tree_rhs = ops_c["tree_rhs"]

        if inner == "amg":
            from ..amg.vcycle import cheby_smooth, vcycle_apply
            amg_x = extra_x["amg"]
            cls_x = ops_c["cls_x"]
            comp_inv_diag = comp_inv_diag_of(ops_c)
            comp_mask = jnp.concatenate(
                [cx["nmask"][cx["gids"]] for cx in cls_x])
            lmax0 = amg_x["lmax0"]
            nvp = amg_x["vmask"].shape[0]

            def A_mf(x):
                return comp_dssum(comp_operator(x), apply_mask=True)

            def restrict_to_vertex(r):
                parts = ops_c["split"](r)
                acc = jnp.zeros((nvp + 1,), dtype=r.dtype)
                for c, cx in enumerate(cls_x):
                    W = (cx["pw"] * parts[c].reshape(-1)).reshape(
                        parts[c].shape)
                    contrib = jnp.einsum("pc,ep->ec", amg_x["B"][c], W)
                    acc = acc.at[cx["vids"]].add(contrib, mode="drop")
                return acc[:nvp] * amg_x["vmask"]

            def prolong_from_vertex(v):
                vp = jnp.concatenate([v * amg_x["vmask"],
                                      jnp.zeros((1,), v.dtype)])
                outs = []
                for c, cx in enumerate(cls_x):
                    vals = vp[cx["vids"]]             # (Ec, 2^dim)
                    outs.append(jnp.einsum("pc,ec->ep", amg_x["B"][c],
                                           vals).reshape(-1))
                return jnp.concatenate(outs)

            def inner_precond(rr):
                fc = comp_dssum(rr, apply_mask=True)
                x = cheby_smooth(A_mf, comp_inv_diag, lmax0, fc, None,
                                 cheby_order)
                for _ in range(num_vcycles):
                    r = fc - A_mf(x)
                    v = vcycle_apply(amg_x["chain"], restrict_to_vertex(r),
                                     cheby_order=cheby_order)
                    x = x + prolong_from_vertex(v) * comp_mask
                    x = cheby_smooth(A_mf, comp_inv_diag, lmax0, fc, x,
                                     cheby_order)
                return x
        elif inner == "jacobi":
            comp_inv_diag = comp_inv_diag_of(ops_c)

            def inner_precond(rr):
                return comp_dssum(rr, apply_mask=True) * comp_inv_diag
        elif inner == "none":
            def inner_precond(rr):
                return comp_dssum(rr, apply_mask=True)
        else:
            raise NotImplementedError(
                f"unstructured composite inner={inner!r} "
                "(use 'amg', 'jacobi' or 'none')")

        def precond(r):
            # STYPE -> PTYPE cast at the tree boundary (subdomain.okl:268)
            f_comp = tree_rhs(r.astype(dtype))
            res = krylov.fgmres(
                comp_operator, inner_precond,
                lambda rr: comp_dssum(rr, apply_mask=True),
                comp_dot, f_comp,
                max_iterations=num_iterations,
                num_vectors=num_iterations,
                tolerance=0.0)
            # own elements sit in class 0's leading E_pad slots
            z = res.u[:E_pad * (N + 1) ** dim].astype(domain.dtype)
            return dssum_f(z, apply_mask=True, apply_weight=True)

        return precond

    if inner == "amg":
        # Chebyshev lambda_max(D^-1 S A) of the composite, by device power
        # iteration over the same traced ops (hypre's eigenvalue-estimate
        # role, subdomain.tpp:3496-3497)
        core = {k: extra[k] for k in ("classes", "slv", "Jlvl")}

        def _lmax_impl(core_x):
            ops_c = make_ops(core_x)
            invd = comp_inv_diag_of(ops_c)
            cls_x = ops_c["cls_x"]
            mask = jnp.concatenate(
                [cx["nmask"][cx["gids"]] for cx in cls_x])
            n_tot = mask.shape[0]
            x0 = jnp.sin(jnp.arange(n_tot, dtype=dtype) * 0.7311) * mask

            def body(_, carry):
                x, lam = carry
                y = invd * ops_c["comp_dssum"](
                    ops_c["comp_operator"](x), apply_mask=True)
                num = jnp.dot(y, y)
                den = jnp.maximum(jnp.dot(x, x), 1e-30)
                lam = jnp.sqrt(num / den)
                return (y / jnp.maximum(jnp.sqrt(num), 1e-30), lam)

            lam0 = jnp.dot(x0, x0) * 0.0 + 1.0
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

    return Preconditioner(build=build, extra=extra,
                          _extra_specs=extra_specs)
