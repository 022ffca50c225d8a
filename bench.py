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
    # f64 for the iterative-refinement accuracy metric (XLA emulates f64
    # on TPU); the headline path stays explicit float32/bfloat16
    jax.config.update("jax_enable_x64", True)

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

    # Microbenchmark methodology: per-call dispatch + scalar fetch through
    # the device tunnel cost tens of milliseconds and block_until_ready
    # can return before execution finishes. So every microbench (a) chains
    # its iterations inside ONE jit (lax.fori_loop, loop-carried
    # dependency, ends in a scalar so execution is forced by the fetch)
    # and (b) is DIFFERENCE-timed: t(2N-chain) - t(N-chain) cancels every
    # fixed cost (dispatch, fetch, launch).
    def timed_jit_chain(make_fn, *args, iters):
        """make_fn(n) -> fn(*args) returning a scalar after n iterations."""
        f1 = jax.jit(make_fn(iters))
        f2 = jax.jit(make_fn(2 * iters))
        float(f1(*args))
        float(f2(*args))
        b1 = b2 = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(f1(*args))
            b1 = min(b1, time.time() - t0)
            t0 = time.time()
            float(f2(*args))
            b2 = min(b2, time.time() - t0)
        return (b2 - b1) / iters

    # --- measured HBM roofline (replaces any assumed speed-of-light
    # constant: the chip behind the tunnel varies) ---
    CHAIN = 50
    nelems = 256 * 1024 * 1024 // 4
    xr = jnp.arange(nelems, dtype=jnp.float32)

    def make_roof(nit):
        return lambda a: jax.lax.fori_loop(
            0, nit, lambda i, v: v + 1.0, a)[0]

    dt = timed_jit_chain(make_roof, xr, iters=CHAIN)
    sol_gbs = 2.0 * nelems * 4 / dt / 1e9    # read + write per iteration
    del xr
    print(f"measured HBM roofline (f32 axpy chain, read+write): "
          f"{sol_gbs:.0f} GB/s", file=sys.stderr)

    # --- SEM operator microbench (hot-kernel roofline) ---
    def make_op(nit):
        def op_chain(arrays, v):
            operator = dom._ops(arrays)[0]
            out = jax.lax.fori_loop(0, nit, lambda i, w: operator(w), v)
            return out.ravel()[0]
        return op_chain

    # longer chain than the roofline's: one apply is ~76 us, and the
    # tunnel's ~ms dispatch jitter must stay small against the timed
    # difference (a 50-apply chain once measured 41 us/apply = 247% of
    # the roofline — an artifact, not a kernel speed)
    dt = timed_jit_chain(make_op, dom.arrays, u, iters=4 * CHAIN)
    npts = mesh.num_points
    bytes_moved = npts * 4 * (1 + 6 + 1)  # u + 6 geom + Au, f32
    n = N + 1
    flops = mesh.num_elements * (n ** 3) * (4 * 3 * n + 2 * 9)
    op_gbs = bytes_moved / dt / 1e9
    print(f"operator: {dt*1e6:.0f}us/apply  {op_gbs:.0f} GB/s "
          f"({100 * op_gbs / sol_gbs:.0f}% of measured SoL)  "
          f"{flops/dt/1e12:.2f} TFLOP/s", file=sys.stderr)

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
        total = time.time() - t0
        # subtract the dispatch+fetch overhead (res.u is already
        # materialized, so this times only the sum-kernel + tunnel RTT)
        t0 = time.time()
        float(res.u.sum())
        overhead = time.time() - t0
        best = min(best, total - overhead)
    its = int(res.iterations)
    conv = bool(res.converged)
    hist = np.asarray(res.residual_history)
    print(f"production solve: {best:.3f}s  iterations={its}  "
          f"converged={conv}  {best/max(its,1)*1e3:.1f} ms/iter",
          file=sys.stderr)
    print("history:", hist[np.isfinite(hist)][:8], file=sys.stderr)

    # --- double-precision production accuracy (domain.hpp:118 criterion:
    # relative residual < 1e-7 in double): f32 solver wrapped in f64
    # iterative refinement (solvers/refine.py) ---
    refined = {}
    try:
        from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain as _D
        from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.refine import refine_solve
        dom64 = _D(sd, dtype=jnp.float64)
        u_star64 = dom64.to_device_field(dom.from_device_field(u_star))
        f64 = dom64.manufacture_rhs(u_star64)
        # 1e-10 target: the reference criterion is rel residual < 1e-7;
        # the tighter target also pushes max|u-u*| below 1e-6 on this
        # kappa~5e3 problem (error <= ||A^-1|| * residual)
        t0 = time.time()
        rr = refine_solve(dom64, solve, f64, tolerance=1e-10)
        t_ref = time.time() - t0
        err64 = float(np.abs(dom64.from_device_field(rr.u)
                             - dom64.from_device_field(u_star64)).max())
        refined = {
            "refined_rel_residual": float(rr.rel_residual),
            "refined_max_error": err64,
            "refined_cycles": rr.cycles,
            "refined_seconds": round(t_ref, 3),
        }
        print(f"f64 refinement: rel_res={rr.rel_residual:.2e}  "
              f"max|u-u*|={err64:.2e}  cycles={rr.cycles}  "
              f"inner_iters={rr.inner_iterations}  {t_ref:.2f}s "
              f"(incl compile)", file=sys.stderr)
    except Exception as e:  # pragma: no cover - f64 support varies
        print(f"f64 refinement unavailable: {e!r}", file=sys.stderr)

    target_seconds = 1.0
    print(json.dumps({
        "metric": "production_solve_seconds",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(target_seconds / best, 3),
        "iterations": its,
        "measured_hbm_gbs": round(sol_gbs, 1),
        **refined,
    }))
    return 0 if conv else 1


if __name__ == "__main__":
    sys.exit(main())
