#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line with the headline metric.

Scenario: the reference's benchmark family — Kershaw mesh, high-order SEM
Poisson (BASELINE.md: N=7, Kershaw eps=0.3) — run on the real TPU chip.

Headline metric: effective HBM bandwidth of the hot kernel (the matrix-free
SEM stiffness apply, the reference's domain.okl:5-98 which dominates every
outer iteration). ``vs_baseline`` is the achieved fraction of the repo
target = 80% of speed-of-light HBM bandwidth (BASELINE.md); > 1.0 beats the
target. Detailed numbers go to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    platform = dev.platform
    # v5e: ~819 GB/s HBM per chip; CPU fallback uses a nominal 100 GB/s
    sol_gbs = 819.0 if "tpu" in str(dev).lower() or platform == "axon" else 100.0

    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain

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

    # --- operator microbench ---
    au = dom.apply_operator(u)
    au.block_until_ready()
    iters = 50
    t0 = time.time()
    for _ in range(iters):
        au = dom.apply_operator(au)
    au.block_until_ready()
    dt = (time.time() - t0) / iters
    npts = mesh.num_points
    # HBM traffic per apply: read u + 6 geom, write Au (f32); XLA fuses the
    # derivative intermediates into VMEM for these small-n contractions.
    bytes_moved = npts * 4 * (1 + 6 + 1)
    gbs = bytes_moved / dt / 1e9
    n = N + 1
    flops = mesh.num_elements * (n ** 3) * (4 * 3 * n + 2 * 9)
    print(f"operator: {dt*1e6:.0f}us/apply  {gbs:.0f} GB/s  "
          f"{flops/dt/1e12:.2f} TFLOP/s", file=sys.stderr)

    # --- CG solve (convergence + time) ---
    u_star = dom.initial_function(4, seed=1)
    f = dom.manufacture_rhs(u_star)
    solve = dom.solver(method="fcg", max_iterations=200, tolerance=1e-4)
    res = solve(f)
    res.u.block_until_ready()
    t0 = time.time()
    res = solve(f)
    res.u.block_until_ready()
    solve_t = time.time() - t0
    its = int(res.iterations)
    print(f"cg: {its} iterations in {solve_t:.3f}s "
          f"({solve_t/max(its,1)*1e3:.2f} ms/iter), "
          f"converged={bool(res.converged)}", file=sys.stderr)

    target = 0.8 * sol_gbs
    print(json.dumps({
        "metric": "sem_operator_hbm_bandwidth",
        "value": round(gbs, 1),
        "unit": "GB/s",
        "vs_baseline": round(gbs / target, 3),
    }))


if __name__ == "__main__":
    main()
