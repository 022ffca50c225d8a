"""A/B: production face-block dssum with vs without the edge-group pass.

Times ops/face_dssum.face_assemble at production size (scrambled
Kershaw 16^3 N=7, 2.1M points) with the edge-group exchange on and off
(use_edges build switch). Chained-jit difference timing (BASELINE.md
methodology); correctness re-checked against numpy bincount sums.

Usage: python artifacts/bench_face_dssum_edges.py  (real TPU)
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
    deg_n = np.bincount(glo.reshape(-1), minlength=mesh.num_nodes)
    deg = deg_n[glo]
    rng = np.random.default_rng(0)
    x = rng.random(glo.shape).astype(np.float32)
    expect = (np.bincount(glo.reshape(-1), weights=x.reshape(-1),
                          minlength=mesh.num_nodes)[glo.reshape(-1)]
              .reshape(glo.shape))

    out = {}
    for tag, use_edges in (("edges_on", True), ("edges_off", False)):
        plan, meta = fd.build_face_plan(glo, n, deg, use_edges=use_edges)
        NR, NG = meta["num_rest_nodes"], meta["num_edge_groups"]
        print(f"{tag}: rest={plan['rest'].shape[0]} groups={NG}",
              file=sys.stderr)
        dplan = {k: jnp.asarray(v) for k, v in plan.items()}

        y = jax.jit(lambda u: fd.face_assemble(
            u, dplan, n, NR, num_edge_groups=NG))(jnp.asarray(x))
        err = float(np.abs(np.asarray(y, np.float64) - expect).max()
                    / np.abs(expect).max())
        print(f"{tag}: rel err {err:.2e}", file=sys.stderr)
        assert err < 1e-6, err

        def chain(nit):
            @jax.jit
            def f(u):
                def body(i, v):
                    w = fd.face_assemble(v, dplan, n, NR,
                                         num_edge_groups=NG)
                    return w * (1.0 / 8.0)   # keep magnitudes bounded
                return jax.lax.fori_loop(0, nit, body, u).sum()
            return f

        f1, f2 = chain(40), chain(80)
        xs = jnp.asarray(x)
        float(f1(xs)); float(f2(xs))         # compile + warm
        t0 = time.perf_counter(); float(f1(xs)); t1 = time.perf_counter()
        float(f2(xs)); t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / 40
        out[tag] = dt * 1e3
        print(f"{tag}: {dt*1e3:.2f} ms/assemble", file=sys.stderr)

    print({"edges_on_ms": round(out["edges_on"], 3),
           "edges_off_ms": round(out["edges_off"], 3),
           "speedup": round(out["edges_off"] / out["edges_on"], 2)})


if __name__ == "__main__":
    sys.exit(main())
