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
    print({"scatter_ms": dt_a * 1e3, "gather_ms": dt_b * 1e3,
           "split_ms": dt_c * 1e3})
    return 0


if __name__ == "__main__":
    sys.exit(main())
