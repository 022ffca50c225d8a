"""Microbench: generic (unstructured) dssum strategies at production size.

The unstructured composite spends ~all its time in gather/scatter node
assembly (artifacts/unstructured_production_16cubed.json: 1 s/iter vs
47 ms/iter structured on identical point counts). Candidates:

(a) scatter-add Qt + gather Q      (current: ops/gather_scatter.dssum)
(b) node-sources gather-sum: per-node (NN+1, maxdeg) source table,
    w = u_ext[srcs].sum(1); out = w[ids]  — no scatter at all
(c) like (b) but with the source table split by degree class
    (deg-1 identity copy + deg-2 pairs + rare high-degree tail)

All difference-timed inside one jit chain (BASELINE.md methodology).
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg

    N = 7
    mesh = mg.scramble_mesh(mg.kershaw_mesh((16, 16, 16), N, epsilon=0.3),
                            seed=7)
    glo = mesh.glo_num.reshape(-1)
    uniq, ids = np.unique(glo, return_inverse=True)
    NN = uniq.size
    Npts = ids.size
    print(f"points={Npts} nodes={NN}", file=sys.stderr)

    # node-sources table
    deg = np.bincount(ids, minlength=NN)
    maxdeg = int(deg.max())
    srcs = np.full((NN, maxdeg), Npts, dtype=np.int32)
    fill = np.zeros(NN, dtype=np.int64)
    for i, node in enumerate(ids):
        srcs[node, fill[node]] = i
        fill[node] += 1
    print(f"maxdeg={maxdeg} deg histogram={np.bincount(deg)[1:]}",
          file=sys.stderr)

    ids_d = jnp.asarray(ids.astype(np.int32))
    srcs_d = jnp.asarray(srcs)
    u = jnp.asarray(np.random.default_rng(0).random(Npts)
                    .astype(np.float32))

    def timed(make, *args, iters=20):
        f1 = jax.jit(make(iters))
        f2 = jax.jit(make(2 * iters))
        float(f1(*args)); float(f2(*args))
        b1 = b2 = float("inf")
        for _ in range(3):
            t = time.time(); float(f1(*args)); b1 = min(b1, time.time() - t)
            t = time.time(); float(f2(*args)); b2 = min(b2, time.time() - t)
        return (b2 - b1) / iters

    def make_scatter(nit):
        def f(u):
            def body(i, x):
                w = jnp.zeros((NN + 1,), x.dtype).at[ids_d].add(
                    x, mode="drop")
                return w[ids_d] * (1.0 / maxdeg)
            return jax.lax.fori_loop(0, nit, body, u)[0]
        return f

    def make_gather(nit):
        def f(u):
            def body(i, x):
                xe = jnp.concatenate([x, jnp.zeros((1,), x.dtype)])
                w = xe[srcs_d].sum(axis=1)
                return w[ids_d] * (1.0 / maxdeg)
            return jax.lax.fori_loop(0, nit, body, u)[0]
        return f

    dt_a = timed(make_scatter, u)
    print(f"(a) scatter+gather: {dt_a*1e3:.2f} ms/dssum", file=sys.stderr)
    dt_b = timed(make_gather, u)
    print(f"(b) sources gather-sum: {dt_b*1e3:.2f} ms/dssum",
          file=sys.stderr)

    # (c) degree-split: identity for deg-1, pair-add for deg-2, generic
    # tail for deg>=3 (scatter on the small remainder)
    one = np.flatnonzero(deg == 1)
    two = np.flatnonzero(deg == 2)
    hi = np.flatnonzero(deg >= 3)
    print(f"deg1={one.size} deg2={two.size} hi={hi.size}", file=sys.stderr)
    # per-point partner for deg-2 nodes: the other copy of the same node
    s2 = srcs[two, :2]
    # point-indexed view: out[p] depends only on its node class
    node_of_pt = ids
    cls = np.zeros(Npts, dtype=np.int8)
    cls[np.isin(node_of_pt, two)] = 1
    cls[np.isin(node_of_pt, hi)] = 2
    partner = np.arange(Npts, dtype=np.int32)
    pos_in = np.zeros(Npts, dtype=np.int8)
    lookup2 = {}
    for node in two:
        a, b = srcs[node, 0], srcs[node, 1]
        partner[a], partner[b] = b, a
    partner_d = jnp.asarray(partner)
    cls1 = jnp.asarray((cls == 1).astype(np.float32))
    # high-degree tail as compact scatter
    hi_pts = np.flatnonzero(cls == 2).astype(np.int32)
    hi_nodes_compact = np.unique(node_of_pt[hi_pts])
    remap = {int(n): i for i, n in enumerate(hi_nodes_compact)}
    hi_node_ids = np.asarray([remap[int(n)] for n in node_of_pt[hi_pts]],
                             dtype=np.int32)
    hi_pts_d = jnp.asarray(hi_pts)
    hi_node_ids_d = jnp.asarray(hi_node_ids)
    NH = hi_nodes_compact.size

    def make_split(nit):
        def f(u):
            def body(i, x):
                # deg-2: one permutation gather + masked add
                y = x + cls1 * x[partner_d]
                # high-degree tail: compact scatter + gather
                xv = x[hi_pts_d]
                w = jnp.zeros((NH + 1,), x.dtype).at[hi_node_ids_d].add(
                    xv, mode="drop")
                y = y.at[hi_pts_d].set(w[hi_node_ids_d], mode="drop")
                return y * (1.0 / maxdeg)
            return jax.lax.fori_loop(0, nit, body, u)[0]
        return f

    dt_c = timed(make_split, u)
    print(f"(c) degree-split: {dt_c*1e3:.2f} ms/dssum", file=sys.stderr)

    # ------------------------------------------------------------------
    # (d) face-block dssum: conforming-face exchange as element-row
    # gathers + batched one-hot matmuls (MXU); only deg>=3 / unpaired
    # nodes go through a compact scatter. TPU-first: no per-element
    # random access on the hot 97%.
    E = mesh.num_elements
    n = N + 1
    npe = n ** 3
    g3 = glo.reshape(E, n, n, n)
    deg_pts = deg[ids].reshape(E, npe)

    # 6 face slices in storage order (z, y, x): (axis, side)
    def face_slice(arr, a, s):
        sl = [slice(None)] * 4
        sl[1 + a] = 0 if s == 0 else n - 1
        return arr[tuple(sl)]       # (E, n, n)

    faces_glo = np.stack([face_slice(g3, a, s).reshape(E, n * n)
                          for a in range(3) for s in (0, 1)], axis=1)
    # match faces by sorted corner-id key
    corner = faces_glo[:, :, [0, n - 1, n * n - n, n * n - 1]]
    keys = np.sort(corner, axis=2)
    fmap = {}
    partner_ef = np.full((E, 6), E * 6, dtype=np.int64)  # pad row
    for e in range(E):
        for f in range(6):
            k = tuple(keys[e, f])
            if k in fmap:
                oe, of = fmap.pop(k)
                partner_ef[e, f] = oe * 6 + of
                partner_ef[oe, of] = e * 6 + f
            else:
                fmap[(k)] = (e, f)
    matched = partner_ef < E * 6
    print(f"matched faces: {matched.sum()} / {E*6}", file=sys.stderr)

    # orientation perms + deg-2 row masks -> one-hot (E, 6, nn, nn)
    nn = n * n
    Pmats = np.zeros((E, 6, nn, nn), dtype=np.float32)
    pf_glo = np.zeros_like(faces_glo)
    ok = matched.reshape(-1)
    pf_glo.reshape(E * 6, nn)[ok] = faces_glo.reshape(E * 6, nn)[
        partner_ef.reshape(-1)[ok]]
    for e in range(E):
        for f in range(6):
            if not matched[e, f]:
                continue
            mine = faces_glo[e, f]
            theirs = pf_glo[e, f]
            order_m = np.argsort(mine)
            order_t = np.argsort(theirs)
            # perm[i] = j with theirs[j] == mine[i]
            perm = np.empty(nn, dtype=np.int64)
            perm[order_m] = order_t
            rows = np.flatnonzero(deg[mine] == 2)
            Pmats[e, f, rows, perm[rows]] = 1.0
    Pm_d = jnp.asarray(Pmats)
    partner_d2 = jnp.asarray(partner_ef.reshape(-1).astype(np.int32))

    # compact scatter for everything not handled by the face pass:
    # deg>=3 nodes plus deg-2 nodes not paired via a conforming face
    handled = np.zeros(Npts, dtype=bool)
    pts3 = np.arange(Npts).reshape(E, npe)
    pts4 = pts3.reshape(E, n, n, n)
    for a in range(3):
        for s in (0, 1):
            f = a * 2 + s
            fp = face_slice(pts4, a, s).reshape(E, nn)
            # fp indexes global points; degree lookup goes via node ids
            sel = matched[:, f][:, None] & (deg[ids[fp]] == 2)
            handled[fp[sel]] = True
    rest = np.flatnonzero(~handled & (deg[ids] >= 2))
    rest_nodes = ids[rest]
    runiq, rids = np.unique(rest_nodes, return_inverse=True)
    NR = runiq.size
    rest_d = jnp.asarray(rest.astype(np.int32))
    rids_d = jnp.asarray(rids.astype(np.int32))
    print(f"face-handled pts={handled.sum()} scatter-rest={rest.size}",
          file=sys.stderr)

    fidx = [(a, s) for a in range(3) for s in (0, 1)]
    # compact representation: perm indices + deg-2 row mask (instead of
    # one-hot matmul: 6 MB vs 400 MB of operand reads per apply)
    perm_idx = np.zeros((E, 6, nn), dtype=np.int32)
    rowmask = np.zeros((E, 6, nn), dtype=np.float32)
    for e in range(E):
        for f in range(6):
            if not matched[e, f]:
                continue
            mine = faces_glo[e, f]
            theirs = pf_glo[e, f]
            order_m = np.argsort(mine)
            order_t = np.argsort(theirs)
            perm = np.empty(nn, dtype=np.int64)
            perm[order_m] = order_t
            perm_idx[e, f] = perm
            rowmask[e, f, deg[mine] == 2] = 1.0
    perm_d = jnp.asarray(perm_idx)
    rowmask_d = jnp.asarray(rowmask)

    def dssum_faceblock(x, Pm, partner2, perm, rmask, use_onehot):
        x4 = x.reshape(E, n, n, n)
        faces = jnp.stack(
            [face_slice(x4, a, s).reshape(E, nn) for a, s in fidx],
            axis=1)                                    # (E, 6, nn)
        faces_flat = jnp.concatenate(
            [faces.reshape(E * 6, nn), jnp.zeros((1, nn), x.dtype)])
        out = x4
        for f, (a, s) in enumerate(fidx):
            pvals = faces_flat[partner2[f::6]]         # (E, nn) row gather
            if use_onehot:
                add = jnp.einsum("eij,ej->ei", Pm[:, f], pvals)
            else:
                add = jnp.take_along_axis(pvals, perm[:, f],
                                          axis=1) * rmask[:, f]
            sl = [slice(None)] * 4
            sl[1 + a] = 0 if s == 0 else n - 1
            out = out.at[tuple(sl)].add(add.reshape(E, n, n))
        y = out.reshape(-1)
        w = jnp.zeros((NR + 1,), x.dtype).at[rids_d].add(
            y[rest_d], mode="drop")
        y = y.at[rest_d].set(w[rids_d], mode="drop")
        return y

    # correctness vs (a)
    ref = np.asarray(jnp.zeros((NN + 1,), u.dtype).at[ids_d].add(
        u, mode="drop")[ids_d])
    for oh in (True, False):
        got = np.asarray(dssum_faceblock(u, Pm_d, partner_d2, perm_d,
                                         rowmask_d, oh))
        err = np.abs(ref - got).max()
        print(f"(d) faceblock onehot={oh} max|diff| = {err:.3e}",
              file=sys.stderr)

    def make_face(use_onehot):
        def mk(nit):
            def f(u, Pm, partner2, perm, rmask):
                def body(i, x):
                    return dssum_faceblock(
                        x, Pm, partner2, perm, rmask,
                        use_onehot) * (1.0 / maxdeg)
                return jax.lax.fori_loop(0, nit, body, u)[0]
            return f
        return mk

    dt_d = timed(make_face(True), u, Pm_d, partner_d2, perm_d, rowmask_d)
    print(f"(d) face-block one-hot matmul: {dt_d*1e3:.2f} ms/dssum",
          file=sys.stderr)
    dt_e = timed(make_face(False), u, Pm_d, partner_d2, perm_d, rowmask_d)
    print(f"(e) face-block take_along_axis: {dt_e*1e3:.2f} ms/dssum",
          file=sys.stderr)

    # ------------------------------------------------------------------
    # (f) face-block with selector-contraction extraction/injection:
    # minor-axis (lane) slicing lowers to slow TPU code (see
    # ops/gather_scatter.lattice_face_sum); einsum with a one-hot
    # selector reads/writes the array at full bandwidth instead.
    sel0 = jnp.zeros((n,), u.dtype).at[0].set(1.0)
    sel1 = jnp.zeros((n,), u.dtype).at[n - 1].set(1.0)
    sels = {0: sel0, 1: sel1}

    def extract_face(x4, a, s):
        sel = sels[s]
        if a == 0:
            return x4[:, 0 if s == 0 else n - 1]
        if a == 1:
            return jnp.einsum("ezyx,y->ezx", x4, sel)
        return jnp.einsum("ezyx,x->ezy", x4, sel)

    def inject_face(add3, a, s):
        sel = sels[s]
        if a == 1:
            return jnp.einsum("ezx,y->ezyx", add3, sel)
        return jnp.einsum("ezy,x->ezyx", add3, sel)

    def dssum_fb2(x, Pm, partner2, rmask):
        x4 = x.reshape(E, n, n, n)
        faces = jnp.stack(
            [extract_face(x4, a, s).reshape(E, nn) for a, s in fidx],
            axis=1)
        faces_flat = jnp.concatenate(
            [faces.reshape(E * 6, nn), jnp.zeros((1, nn), x.dtype)])
        out = x4
        for f, (a, s) in enumerate(fidx):
            pvals = faces_flat[partner2[f::6]]
            add = jnp.einsum("eij,ej->ei", Pm[:, f], pvals).astype(x.dtype)
            add3 = add.reshape(E, n, n)
            if a == 0:
                out = out.at[:, 0 if s == 0 else n - 1].add(add3)
            else:
                out = out + inject_face(add3, a, s)
        y = out.reshape(-1)
        w = jnp.zeros((NR + 1,), x.dtype).at[rids_d].add(
            y[rest_d], mode="drop")
        y = y.at[rest_d].set(w[rids_d], mode="drop")
        return y

    Pm_bf = Pm_d.astype(jnp.bfloat16)
    got = np.asarray(dssum_fb2(u, Pm_d, partner_d2, rowmask_d))
    err2 = np.abs(ref - got).max()
    print(f"(f) selector faceblock max|diff| = {err2:.3e}",
          file=sys.stderr)

    def make_fb2(Pm):
        def mk(nit):
            def f(u, Pm, partner2, rmask):
                def body(i, x):
                    return dssum_fb2(x, Pm, partner2,
                                     rmask) * (1.0 / maxdeg)
                return jax.lax.fori_loop(0, nit, body, u)[0]
            return f
        return mk

    dt_f = timed(make_fb2(Pm_d), u, Pm_d, partner_d2, rowmask_d)
    print(f"(f) selector faceblock f32: {dt_f*1e3:.2f} ms/dssum",
          file=sys.stderr)
    dt_g = timed(make_fb2(Pm_bf), u, Pm_bf, partner_d2, rowmask_d)
    print(f"(g) selector faceblock bf16 perms: {dt_g*1e3:.2f} ms/dssum",
          file=sys.stderr)

    # (h) rest-scatter alone (what the face pass leaves behind)
    def make_rest(nit):
        def f(u):
            def body(i, x):
                w = jnp.zeros((NR + 1,), x.dtype).at[rids_d].add(
                    x[rest_d], mode="drop")
                return x.at[rest_d].set(w[rids_d],
                                        mode="drop") * (1.0 / maxdeg)
            return jax.lax.fori_loop(0, nit, body, u)[0]
        return f

    dt_h = timed(make_rest, u)
    print(f"(h) rest-scatter alone: {dt_h*1e3:.2f} ms", file=sys.stderr)

    # ------------------------------------------------------------------
    # (j) EXACT dihedral-class face exchange: a conforming hex face meets
    # its partner in one of 8 dihedral orientations. Compute all 8 static
    # transforms of the partner-face block (flips/transposes — exact
    # index ops), then select per element with 0/1 masks (elementwise,
    # exact — no MXU rounding, unlike the one-hot matmul whose bf16
    # multiply perturbs values by ~1e-3 and breaks copy consistency).
    # build the index table by applying the SAME op sequence as the
    # device transform (transpose, then flips) to an index grid
    dihedral = []
    grid = np.arange(nn).reshape(n, n)
    for t in range(8):
        out_t = grid.T if t >= 4 else grid
        if t % 4 in (1, 3):
            out_t = out_t[::-1, :]
        if t % 4 in (2, 3):
            out_t = out_t[:, ::-1]
        dihedral.append(out_t.reshape(-1))
    dihedral = np.stack(dihedral)          # (8, nn): new[i] = old[d[i]]

    cls_ef = np.full((E, 6), -1, dtype=np.int8)
    for e in range(E):
        for f in range(6):
            if not matched[e, f]:
                continue
            perm = perm_idx[e, f]
            for t in range(8):
                if np.array_equal(perm, dihedral[t]):
                    cls_ef[e, f] = t
                    break
    n_unmatched_dihedral = int(((cls_ef < 0) & matched).sum())
    print(f"faces whose perm is NOT dihedral: {n_unmatched_dihedral}",
          file=sys.stderr)

    def dihedral_apply(pv, t):
        # pv: (E, n, n) partner face; returns transform t, exactly
        out = pv
        if t >= 4:
            out = jnp.swapaxes(out, 1, 2)
        if t % 4 in (1, 3):
            out = jnp.flip(out, axis=1)
        if t % 4 in (2, 3):
            out = jnp.flip(out, axis=2)
        return out

    # table <-> device-transform consistency
    probe = np.arange(nn, dtype=np.float32).reshape(1, n, n)
    for t in range(8):
        via_table = probe.reshape(-1)[dihedral[t]]
        via_apply = np.asarray(dihedral_apply(jnp.asarray(probe),
                                              t)).reshape(-1)
        assert np.array_equal(via_table, via_apply), f"transform {t}"

    cls_masks = jnp.asarray(
        np.stack([(cls_ef == t).astype(np.float32) for t in range(8)]))
    rowmask2 = rowmask_d  # (E, 6, nn) deg-2 row gate

    def dssum_dihedral(x, partner2, rmask):
        x4 = x.reshape(E, n, n, n)
        faces = jnp.stack(
            [extract_face(x4, a, s).reshape(E, nn) for a, s in fidx],
            axis=1)
        faces_flat = jnp.concatenate(
            [faces.reshape(E * 6, nn), jnp.zeros((1, nn), x.dtype)])
        out = x4
        for f, (a, s) in enumerate(fidx):
            pv = faces_flat[partner2[f::6]].reshape(E, n, n)
            acc = jnp.zeros((E, nn), x.dtype)
            for t in range(8):
                m = cls_masks[t, :, f][:, None]
                acc = acc + m * dihedral_apply(pv, t).reshape(E, nn)
            add3 = (acc * rmask[:, f]).reshape(E, n, n)
            if a == 0:
                out = out.at[:, 0 if s == 0 else n - 1].add(add3)
            else:
                out = out + inject_face(add3, a, s)
        y = out.reshape(-1)
        w = jnp.zeros((NR + 1,), x.dtype).at[rids_d].add(
            y[rest_d], mode="drop")
        y = y.at[rest_d].set(w[rids_d], mode="drop")
        return y

    got = np.asarray(dssum_dihedral(u, partner_d2, rowmask_d))
    err3 = np.abs(ref - got).max()
    print(f"(j) dihedral faceblock max|diff| = {err3:.3e}",
          file=sys.stderr)

    def make_dihedral(nit):
        def f(u, partner2, rmask):
            def body(i, x):
                return dssum_dihedral(x, partner2,
                                      rmask) * (1.0 / maxdeg)
            return jax.lax.fori_loop(0, nit, body, u)[0]
        return f

    dt_j = timed(make_dihedral, u, partner_d2, rowmask_d)
    print(f"(j) dihedral faceblock (exact): {dt_j*1e3:.2f} ms/dssum",
          file=sys.stderr)

    print({"scatter_ms": dt_a * 1e3, "gather_ms": dt_b * 1e3,
           "split_ms": dt_c * 1e3, "faceblock_matmul_ms": dt_d * 1e3,
           "faceblock_take_ms": dt_e * 1e3,
           "selector_f32_ms": dt_f * 1e3, "selector_bf16_ms": dt_g * 1e3,
           "rest_ms": dt_h * 1e3, "dihedral_ms": dt_j * 1e3,
           "onehot_err": float(max(err, err2)),
           "dihedral_err": float(err3)})
    return 0


if __name__ == "__main__":
    sys.exit(main())
