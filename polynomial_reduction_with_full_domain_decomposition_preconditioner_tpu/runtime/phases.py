"""Phase-timing report: the reference's timed-region taxonomy.

The reference wraps every solver phase in synchronized timers
(/root/reference/poisson.cpp:259-401: domain.{operator_application,
inner_products, ...}, subdomain.{tree_*, preconditioner.*}). Here the
whole solve is ONE fused XLA program — by design (SURVEY.md 5.1) — so
phases cannot be bracketed with host timers without destroying the very
fusion being measured. Two honest measurements replace the brackets:

1. **Differential solve marginals**: the same problem solved with
   components successively enabled at a fixed iteration count; per-phase
   costs are the marginals (coarse but exactly reflects the fused
   program).
2. **Device-measured region chains** (``Domain.phase_chain``): each
   region closure (outer operator/dssum, composite tree cascade /
   exchange, composite operator, composite QQt assembly, inner V-cycle)
   is applied in a jitted ``fori_loop`` chain with a loop-carried
   dependency and difference-timed — t(2N) − t(N) cancels all fixed
   costs. A normalize-only chain is the measurement baseline and is
   subtracted, so each row is the marginal cost of that region per
   application. This reproduces the reference's ~20-region report at
   device-kernel fidelity (poisson.cpp:259-358 schema).
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


def _chain_time(dom, pre, kind, f, iters=12, repeats=3):
    """Per-application seconds of one region, difference-timed."""
    f1 = dom.phase_chain(pre, kind, iters)
    f2 = dom.phase_chain(pre, kind, 2 * iters)
    float(f1(f))
    float(f2(f))
    b1 = b2 = float("inf")
    for _ in range(repeats):
        t = time.time()
        float(f1(f))
        b1 = min(b1, time.time() - t)
        t = time.time()
        float(f2(f))
        b2 = min(b2, time.time() - t)
    return max(b2 - b1, 0.0) / iters


def phase_report(dom, mesh_builder, cfg=None, iterations: int = 10,
                 out=sys.stdout, chain_iters: int = 12) -> dict:
    """Print and return the per-phase tables (reference schema,
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
    pre_full = pre("amg")
    t_full, _ = _timed_solve(dom, f, method=cfg.solver, precond=pre_full,
                             **kw)

    it = iterations
    marginals = {
        # reference names (poisson.cpp:259-293), per outer iteration
        "domain.operator+vector_operations (FCG floor)": t_fcg / it,
        "domain.krylov_basis (GMRES - FCG)": (t_skel - t_fcg) / it,
        "subdomain.tree+inner_solver (QQt inner)": (t_qqt - t_skel) / it,
        "subdomain.inner_preconditioner.jacobi": (t_jac - t_qqt) / it,
        "subdomain.preconditioner.vcycle (amg - jacobi)":
            (t_full - t_jac) / it,
        "total per iteration": t_full / it,
    }

    # device-measured region chains (per application of each region);
    # optional kinds (assemble half, tree sub-legs) depend on which
    # composite path is active — probe the preconditioner's parts
    kinds = ["nrm", "op", "dssum", "cnrm", "comp_op", "comp_dssum",
             "inner_precond", "tree_cascade", "tree_rhs",
             "inner_smooth", "inner_transfer", "inner_coarse",
             # structured exposes tree_rings/tree_coarse; unstructured
             # exposes tree_levels; comp_assemble needs the face-block
             # (or structured) dssum path
             "comp_assemble", "tree_rings", "tree_coarse", "tree_levels"]
    ct = {}
    for k in kinds:
        try:
            ct[k] = _chain_time(dom, pre_full, k, f, iters=chain_iters)
        except (ValueError, KeyError):
            ct[k] = None                 # kind not exposed by this path
    ki = cfg.inner_iterations
    regions = {
        # outer solve (domain.*, poisson.cpp:259-276). The 'op' chain is
        # nrm(dssum(operator(x))), so the dssum baseline — reported as
        # its own stitching row — must be subtracted here too
        "domain.operator_application": ct["op"] - ct["dssum"],
        "domain.inner_products+vector_operations (1 dot + 1 scale)":
            ct["nrm"],
        "subdomain.stitching (outer dssum)": ct["dssum"] - ct["nrm"],
        # preconditioner tree (subdomain.tree_*, poisson.cpp:322-358)
        "subdomain.tree_construction (restriction cascade)":
            ct["tree_cascade"],
        "subdomain.tree_exchange (rings+coarse gather+far)":
            ct["tree_rhs"] - ct["tree_cascade"],
        # composite inner solve, per inner application (x{ki}/outer)
        f"subdomain.operator_application (x{ki})":
            ct["comp_op"] - ct["cnrm"],
        f"subdomain.preconditioner.assemble+unassemble (x{ki})":
            ct["comp_dssum"] - ct["cnrm"],
        f"subdomain.preconditioner.vcycle legs+coarse (x{ki})":
            ct["inner_precond"] - ct["cnrm"],
        # V-cycle leg split (the reference's down_leg/coarse_grid_solver/
        # up_leg regions, poisson.cpp:277-293)
        f"subdomain.preconditioner.smooth_leg (x{ki}, 1 Chebyshev)":
            ct["inner_smooth"] - ct["cnrm"],
        f"subdomain.preconditioner.transfer_legs (x{ki}, R+P)":
            ct["inner_transfer"] - ct["cnrm"],
        f"subdomain.preconditioner.coarse_grid_solver (x{ki})":
            ct["inner_coarse"] - ct["inner_transfer"],
        "subdomain.inner_products+vector_operations (1 dot + 1 scale)":
            ct["cnrm"],
    }
    # ---- round-5 sub-kind splits (one row per reference region,
    # poisson.cpp:259-358 one-for-one) ----
    if ct["tree_rings"] is not None:      # structured composite
        rings = ct["tree_rings"] - ct["tree_cascade"]
        coarse = ct["tree_coarse"] - ct["tree_cascade"]
        regions["subdomain.tree_exchange.rings (ppermute legs)"] = rings
        regions["subdomain.tree_exchange.coarse (all_gather)"] = coarse
        regions["subdomain.tree_exchange.superdomain (far restrict)"] = (
            ct["tree_rhs"] - ct["tree_cascade"] - rings - coarse)
    if ct["tree_levels"] is not None:     # unstructured composite
        lev = ct["tree_levels"] - ct["tree_cascade"]
        regions["subdomain.tree_exchange.levels (all_gather+takes)"] = lev
        regions["subdomain.tree_exchange.superdomain (project P^T)"] = (
            ct["tree_rhs"] - ct["tree_cascade"] - lev)
    if ct["comp_assemble"] is not None:
        asm = ct["comp_assemble"] - ct["cnrm"]
        regions[f"subdomain.preconditioner.assemble (x{ki}, gather)"] = asm
        regions[f"subdomain.preconditioner.unassemble (x{ki}, "
                "scatter+stitch)"] = ct["comp_dssum"] - ct["cnrm"] - asm
    # a subtracted marginal below the timing noise floor reads negative;
    # report it as 0 (the region costs less than the measurement noise)
    regions = {k: max(v, 0.0) for k, v in regions.items()}

    print("phase report — differential solve marginals "
          "(per outer iteration):", file=out)
    for k, v in marginals.items():
        print(f"  {k}: {v * 1e3:.2f} ms", file=out)
    print("phase report — device-measured regions "
          "(chained, per application):", file=out)
    for k, v in regions.items():
        print(f"  {k}: {v * 1e3:.3f} ms", file=out)
    return {**marginals, **{f"region.{k}": v for k, v in regions.items()}}
