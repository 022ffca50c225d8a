"""Decompose face_assemble cost: faces / edges / rest / extraction.

Plan-surgery A/B at production size (scrambled Kershaw 16^3 N=7, 2.1M
points): time the full kernel, then with the rest scatter emptied, then
with the edge pass also disabled, then with no matched faces either
(extraction + blend skeleton only). Differences isolate each part.

Usage: python artifacts/bench_face_parts.py  (real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops import face_dssum as fd

    N = 7
    mesh = mg.scramble_mesh(mg.kershaw_mesh((16, 16, 16), N, epsilon=0.3),
                            seed=7)
    glo = mesh.glo_num
    n = N + 1
    deg = np.bincount(glo.reshape(-1), minlength=mesh.num_nodes)[glo]
    plan, meta = fd.build_face_plan(glo, n, deg)
    NR, NG = meta["num_rest_nodes"], meta["num_edge_groups"]
    E6 = plan["partner"].shape[0]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(glo.shape).astype(np.float32))

    def timed(plan_np, ng, label):
        dplan = {k: jnp.asarray(v) for k, v in plan_np.items()}

        def chain(nit):
            @jax.jit
            def f(u):
                def body(i, v):
                    return fd.face_assemble(v, dplan, n, NR,
                                            num_edge_groups=ng) * 0.125
                return jax.lax.fori_loop(0, nit, body, u).sum()
            return f

        f1, f2 = chain(40), chain(80)
        float(f1(x)); float(f2(x))
        t0 = time.perf_counter(); float(f1(x)); t1 = time.perf_counter()
        float(f2(x)); t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / 40 * 1e3
        print(f"{label}: {dt:.3f} ms", file=sys.stderr)
        return dt

    full = timed(plan, NG, "full")

    p2 = dict(plan)
    p2["rest"] = np.full_like(plan["rest"], 2 ** 31 - 1)   # all dropped
    no_rest = timed(p2, NG, "rest emptied")

    no_edges = timed(p2, 0, "rest emptied + edges off")

    p4 = dict(p2)
    for t in range(8):                                     # no matches
        p4["cls_src%d" % t] = np.zeros((0,), np.int32)
        p4["cls_dst%d" % t] = np.zeros((0,), np.int32)
    p4["rowmask"] = np.zeros_like(plan["rowmask"])
    skeleton = timed(p4, 0, "skeleton (extraction only)")

    print({"full_ms": round(full, 3),
           "rest_ms": round(full - no_rest, 3),
           "edge_ms": round(no_rest - no_edges, 3),
           "face_ms": round(no_edges - skeleton, 3),
           "skeleton_ms": round(skeleton, 3)})


if __name__ == "__main__":
    sys.exit(main())
