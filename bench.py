#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line with the headline metric.

Scenario: the reference's production benchmark family (BASELINE.md):
Kershaw eps=0.3, 16^3 elements, N=7, poly reduction 6 — outer FGMRES with
the full-domain-decomposition + polynomial-reduction composite
preconditioner (inner FGMRES(4) + matrix-free hybrid V-cycle), float32,
run on the real TPU chip.

Headline metric: wall-clock seconds for the full production solve
(2.1M points to the f32 tolerance 1e-4 relative). ``vs_baseline`` is
target_seconds / measured with target = 1.0 s — the reference-class
budget for this problem size on one accelerator (the reference publishes
no numbers, BASELINE.md). > 1.0 beats the target; higher is better.

Secondary metrics (stderr): iteration count, per-iteration time, SEM
operator effective HBM bandwidth (roofline check for the hot kernel,
domain.okl:5-98 equivalent).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the production program is large; repeated
    # bench runs must not pay recompilation
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from functools import partial
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import subdomain as sub

    N = 7
    shape = (16, 16, 16)  # 4096 elements, 2.1M points at N=7
    t0 = time.time()
    mesh = mg.kershaw_mesh(shape, N, epsilon=0.3)
    sd = partition_mesh(mesh, 1)
    dom = Domain(sd, dtype=jnp.float32)
    print(f"setup: {time.time()-t0:.1f}s  elements={mesh.num_elements} "
          f"points={mesh.num_points}", file=sys.stderr)

    rng = np.random.default_rng(0)
    u = dom.to_device_field(rng.random(dom.points_shape()).astype(np.float32))

    # --- SEM operator microbench (hot-kernel roofline) ---
    dev = jax.devices()[0]
    sol_gbs = 819.0 if dev.platform in ("tpu", "axon") else 100.0
    au = dom.apply_operator(u)
    au.block_until_ready()
    iters = 50
    t0 = time.time()
    for _ in range(iters):
        au = dom.apply_operator(au)
    au.block_until_ready()
    dt = (time.time() - t0) / iters
    npts = mesh.num_points
    bytes_moved = npts * 4 * (1 + 6 + 1)  # u + 6 geom + Au, f32
    n = N + 1
    flops = mesh.num_elements * (n ** 3) * (4 * 3 * n + 2 * 9)
    print(f"operator: {dt*1e6:.0f}us/apply  {bytes_moved/dt/1e9:.0f} GB/s "
          f"(SoL {sol_gbs:.0f})  {flops/dt/1e12:.2f} TFLOP/s",
          file=sys.stderr)

    # --- production preconditioned solve (headline) ---
    t0 = time.time()
    # PTYPE bfloat16: the preconditioner runs on the MXU's native dtype
    # (the reference's double-outer/float-inner split, config.hpp:19-20,
    # taken one step further); outer residuals and the convergence
    # criterion stay float32. Measured: 27% faster end-to-end at +1
    # outer iteration vs a float32 preconditioner.
    pre = sub.composite_dd(dom, partial(mg.kershaw_mesh, shape, epsilon=0.3),
                           poly_reduction=6, inner="amg",
                           ptype=jnp.bfloat16, fine_mesh=mesh)
    print(f"preconditioner setup: {time.time()-t0:.1f}s", file=sys.stderr)
    u_star = dom.initial_function(4, seed=0)
    f = dom.manufacture_rhs(u_star)
    solve = dom.solver(method="fgmres", max_iterations=200, precond=pre)

    t0 = time.time()
    res = solve(f)
    float(res.u.sum())  # force execution + fetch
    print(f"first solve (incl compile): {time.time()-t0:.1f}s",
          file=sys.stderr)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        res = solve(f)
        float(res.u.sum())
        best = min(best, time.time() - t0)
    its = int(res.iterations)
    conv = bool(res.converged)
    hist = np.asarray(res.residual_history)
    print(f"production solve: {best:.3f}s  iterations={its}  "
          f"converged={conv}  {best/max(its,1)*1e3:.1f} ms/iter",
          file=sys.stderr)
    print("history:", hist[np.isfinite(hist)][:8], file=sys.stderr)

    target_seconds = 1.0
    print(json.dumps({
        "metric": "production_solve_seconds",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(target_seconds / best, 3),
    }))
    return 0 if conv else 1


if __name__ == "__main__":
    sys.exit(main())
