"""One-chip Kershaw 64^3 N=7 run — the reference's headline mesh size
(run.py:26: Kershaw 64^3 at 32-1024 ranks on Summit) on a single TPU.

134M element points / 91M nodes in 16 GB HBM. Memory discipline:
- FCG outer (GMRES(20)'s 40-vector basis would not fit; FCG is the
  reference's solver_id=0 path, domain.tpp:613-725);
- bf16 composite preconditioner with inner GMRES(3);
- u* fetched to host and freed from device before the solve (only f and
  the Krylov state stay resident);
- factor-major lattice geometry (no XLA layout copies — the first
  attempt OOM'd on 4.5 GB of geometry transposes).

Usage:  python artifacts/run_64cubed.py [m] [inner_iters] [method] [nv]
            [epsilon] [cheby_order] [num_vcycles]
        method: fcg (default) | fgmres | fgmres-z16 (bf16 Z basis,
        solver z_dtype — halves the Z term of the Krylov memory)
        nv: GMRES restart length (default 8 — sized so V+Z fit at 64^3)
        cheby_order / num_vcycles: inner smoother strength (default 2/1)
Writes artifacts/scaleup_{m}cubed.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    inner_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    method = sys.argv[3] if len(sys.argv) > 3 else "fcg"
    nv = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    eps = float(sys.argv[5]) if len(sys.argv) > 5 else 0.3
    cheby = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    nvc = int(sys.argv[7]) if len(sys.argv) > 7 else 1
    inner_solver = sys.argv[8] if len(sys.argv) > 8 else "fgmres"
    ptype_s = sys.argv[9] if len(sys.argv) > 9 else "bf16"
    refine = not (len(sys.argv) > 10 and sys.argv[10] == "norefine")
    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import _enable_compile_cache
    _enable_compile_cache()
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import subdomain as sub
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.checkpoint import cached_mesh_builder

    ckpt = "/root/repo/.ckpt_cache"
    shape = (m, m, m)
    builder = cached_mesh_builder(
        partial(mg.kershaw_mesh, shape, epsilon=eps), ckpt,
        f"kershaw_{m}x{m}x{m}_e{eps}_sNone")
    t0 = time.time()
    mesh = builder(7)
    sd = partition_mesh(mesh, 1)
    dom = Domain(sd, dtype=jnp.float32)
    t_mesh = time.time() - t0
    print(f"mesh setup {t_mesh:.1f}s  points={mesh.num_points}",
          file=sys.stderr)

    t0 = time.time()
    ptype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[ptype_s]
    pre = sub.composite_dd(
        dom, builder, poly_reduction=6, inner="amg", ptype=ptype,
        num_iterations=inner_iters, fine_mesh=mesh,
        inner_solver=inner_solver,
        cheby_order=cheby, num_vcycles=nvc,
        chain_cache=os.path.join(
            ckpt, f"chain_kershaw_{m}cubed.npz" if eps == 0.3
            else f"chain_kershaw_{m}cubed_e{eps}.npz"))
    t_pre = time.time() - t0
    print(f"preconditioner setup {t_pre:.1f}s", file=sys.stderr)

    u_star_dev = dom.initial_function(4, seed=0)
    f = dom.manufacture_rhs(u_star_dev)
    u_star = dom.from_device_field(u_star_dev)
    u_star_dev.delete()
    del u_star_dev

    if method == "fcg":
        solve = dom.solver(method="fcg", precond=pre, max_iterations=100)
    else:
        zdt = jnp.bfloat16 if method.endswith("z16") else None
        solve = dom.solver(method="fgmres", precond=pre, max_iterations=100,
                           num_vectors=nv, z_dtype=zdt)
    t0 = time.time()
    res = solve(f)
    its = int(res.iterations)        # forces execution
    t_first = time.time() - t0
    hist = np.asarray(res.residual_history)
    hist = hist[np.isfinite(hist)]
    conv = bool(res.converged)
    print(f"first solve (incl compile): {t_first:.1f}s  iterations={its} "
          f"converged={conv}", file=sys.stderr)

    err = float(np.abs(dom.from_device_field(res.u) - u_star).max())
    res.u.delete()

    # timed re-run (dispatch+fetch overhead subtracted via double fetch)
    t0 = time.time()
    res = solve(f)
    int(res.iterations)
    total = time.time() - t0
    t0 = time.time()
    int(res.iterations)
    overhead = time.time() - t0
    t_solve = max(total - overhead, 0.0)
    print(f"solve: {t_solve:.3f}s  ({t_solve/max(its,1)*1e3:.1f} ms/iter)",
          file=sys.stderr)

    # the reference's double-precision criterion (domain.hpp:118:
    # relative residual < 1e-7 in double): f64 side on the HOST
    # (solvers/host_oracle.py) — f64 geometry is 6.4 GB at 64^3 and
    # does not fit next to the resident f32 solver
    refined = {}
    if refine:
        from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.host_oracle import (
            HostOperator, host_refine_solve)
        t0 = time.time()
        host = HostOperator(mesh)
        u_star64 = np.asarray(u_star, dtype=np.float64).reshape(-1)
        f64h = host.apply(u_star64)
        rr = host_refine_solve(
            host, dom, solve, f64h, tolerance=1e-7,
            verbose=lambda c, rel: print(
                f"refinement cycle {c}: rel_res={rel:.3e}",
                file=sys.stderr))
        t_refine = time.time() - t0
        err64 = float(np.abs(rr.u - u_star64).max())
        print(f"f64 refinement: rel_res={rr.rel_residual:.3e} cycles="
              f"{rr.cycles} max|u-u*|={err64:.3e} converged={rr.converged} "
              f"({t_refine:.1f}s)", file=sys.stderr)
        refined = {
            "refined_rel_residual": rr.rel_residual,
            "refined_cycles": rr.cycles,
            "refined_inner_iterations": rr.inner_iterations,
            "refined_max_error": err64,
            "refined_converged": rr.converged,
            "refine_seconds": round(t_refine, 1),
        }

    rec = {
        "mesh": f"kershaw eps={eps} {m}^3 N=7 r=6",
        "points": mesh.num_points,
        "solver": (f"{method}" + (f"({nv})" if method != "fcg" else "")
                   + f" + composite({ptype_s}, inner "
                   f"{'FCG' if inner_solver == 'fcg' else 'GMRES'}"
                   f"({inner_iters}), cheby {cheby}, {nvc} vcycle)"),
        "iterations": its,
        "converged": conv,
        "residual_history": hist.tolist(),
        "max_error": err,
        "solve_seconds": round(t_solve, 4),
        "first_solve_seconds": round(t_first, 2),
        "setup_mesh_seconds": round(t_mesh, 1),
        "setup_preconditioner_seconds": round(t_pre, 1),
        **refined,
    }
    tag = "" if method == "fcg" else f"_{method}{nv}i{inner_iters}"
    if inner_solver != "fgmres":
        tag += f"_is{inner_solver}"
    if ptype_s != "bf16":
        tag += f"_pt{ptype_s}"
    if eps != 0.3:
        tag += f"_e{eps}"
    if (cheby, nvc) != (2, 1):
        tag += f"_c{cheby}v{nvc}"
    with open(f"artifacts/scaleup_{m}cubed{tag}.json", "w") as fh:
        json.dump(rec, fh, indent=1)
    print("DONE", m, its, conv, t_solve)
    return 0 if conv else 1


if __name__ == "__main__":
    sys.exit(main())
