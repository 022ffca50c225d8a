"""Phase-timing report: the reference's timed-region taxonomy.

The reference wraps every solver phase in synchronized timers
(/root/reference/poisson.cpp:259-401: domain.{operator_application,
inner_products, ...}, subdomain.{tree_*, preconditioner.*}). Here the
whole solve is ONE fused XLA program — by design (SURVEY.md 5.1) — so
phases cannot be bracketed with host timers without destroying the very
fusion being measured. Instead the report is *differential*: the same
problem is solved with components successively enabled at a fixed
iteration count, and per-phase costs are the marginals. This yields
honest device numbers (bracketed closure timing inflates 10-30x through
jit-constant capture) in the reference's report schema.
"""

from __future__ import annotations

import sys
import time

import numpy as np

__all__ = ["phase_report"]


def _timed_solve(dom, f, repeats=3, **solver_kw):
    import jax
    solve = dom.solver(**solver_kw)
    res = solve(f)
    jax.block_until_ready(res.u)
    best = float("inf")
    for _ in range(repeats):
        t = time.time()
        res = solve(f)
        jax.block_until_ready(res.u)
        best = min(best, time.time() - t)
    return best, int(res.iterations)


def phase_report(dom, mesh_builder, cfg=None, iterations: int = 10,
                 out=sys.stdout) -> dict:
    """Print and return the per-iteration phase table (reference schema,
    poisson.cpp:259-401) for the composite-preconditioned solve."""
    from ..solvers import subdomain as sub
    from .config import Config

    cfg = cfg or Config()
    u_star = dom.initial_function(4, seed=0)
    f = dom.manufacture_rhs(u_star)
    kw = dict(max_iterations=iterations, tolerance=1e-30)

    def pre(inner):
        return sub.composite_dd(
            dom, mesh_builder, poly_reduction=cfg.poly_reduction,
            subdomain_overlap=cfg.subdomain_overlap,
            superdomain_overlap=cfg.superdomain_overlap,
            num_iterations=cfg.inner_iterations, inner=inner,
            num_vcycles=cfg.num_vcycles, cheby_order=cfg.cheby_order,
            ptype=cfg.ptype_dtype(), max_coarse=cfg.max_coarse,
            far_coarsen=cfg.far_coarsen)

    t_fcg, _ = _timed_solve(dom, f, method="fcg", **kw)
    t_skel, _ = _timed_solve(dom, f, method=cfg.solver, **kw)
    t_qqt, _ = _timed_solve(dom, f, method=cfg.solver, precond=pre("none"),
                            **kw)
    t_jac, _ = _timed_solve(dom, f, method=cfg.solver,
                            precond=pre("jacobi"), **kw)
    t_full, _ = _timed_solve(dom, f, method=cfg.solver, precond=pre("amg"),
                             **kw)

    it = iterations
    report = {
        # reference names (poisson.cpp:259-293), per outer iteration
        "domain.operator+vector_operations (FCG floor)": t_fcg / it,
        "domain.krylov_basis (GMRES - FCG)": (t_skel - t_fcg) / it,
        "subdomain.tree+inner_solver (QQt inner)": (t_qqt - t_skel) / it,
        "subdomain.inner_preconditioner.jacobi": (t_jac - t_qqt) / it,
        "subdomain.preconditioner.vcycle (amg - jacobi)":
            (t_full - t_jac) / it,
        "total per iteration": t_full / it,
    }
    print("phase report (differential, per outer iteration):", file=out)
    for k, v in report.items():
        print(f"  {k}: {v * 1e3:.2f} ms", file=out)
    return report
