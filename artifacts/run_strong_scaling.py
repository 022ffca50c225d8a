"""Strong-scaling convergence sweep: the reference's Kershaw rank sweep
(run.py:26: 64^3 at 32..1024 ranks) scaled to the validation mesh — a
FIXED Kershaw problem partitioned over P = 1, 2, 3, 4, 6, 8 shards
(including non-dividing counts, domain.tpp:45 semantics) on the virtual
CPU device mesh. The method's design point: outer iteration counts stay
near-constant as the domain is cut finer, because every shard's
composite problem covers the whole domain.

Writes artifacts/strong_scaling.json with per-P iteration counts.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_enable_x64", True)

    import numpy as np
    import jax.numpy as jnp
    from functools import partial
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import subdomain as sub

    # 16 slab layers so every P in the sweep keeps >= ring-depth layers
    # per shard (the composite needs rings from nearest neighbors only)
    shape, N, red = (4, 4, 16), 3, 2
    mk = partial(mg.kershaw_mesh, shape, epsilon=0.3)
    mesh = mk(N)
    out = {"mesh": f"kershaw eps=0.3 {shape} N={N} r={red}",
           "points": mesh.num_points, "per_P": {}}
    for Pn in (1, 2, 3, 4, 6, 8):
        dm = jax.make_mesh((Pn,), ("shard",)) if Pn > 1 else None
        dom = Domain(partition_mesh(mesh, Pn), dtype=jnp.float64,
                     device_mesh=dm)
        u_star = dom.initial_function(4, seed=0)
        f = dom.manufacture_rhs(u_star)
        pre = sub.composite_dd(dom, mk, poly_reduction=red, inner="amg",
                               fine_mesh=mesh)
        res = dom.solver(method="fgmres", max_iterations=100,
                         tolerance=1e-8, precond=pre)(f)
        hist = np.asarray(res.residual_history)
        k = int(np.isfinite(hist).sum())
        err = float(np.abs(dom.from_device_field(res.u)
                           - dom.from_device_field(u_star)).max())
        out["per_P"][Pn] = {"iterations": k,
                            "converged": bool(res.converged),
                            "max_error": err}
        print(f"P={Pn}: {k} iterations, converged={bool(res.converged)}",
              file=sys.stderr)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "strong_scaling.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    its = [v["iterations"] for v in out["per_P"].values()]
    print(json.dumps({"iterations_by_P": its}))
    assert all(v["converged"] for v in out["per_P"].values())
    # P=1 is an outlier by construction (its composite IS the full-order
    # domain — no polynomial reduction anywhere). For P >= 2 the counts
    # drift slowly as the own-slab share of this SMALL fixed mesh
    # shrinks (measured 21..28 over P=2..8 at 1e-8); production meshes
    # keep the own fraction high.
    multi = its[1:]
    assert max(multi) <= min(multi) + 8, its
    return 0


if __name__ == "__main__":
    sys.exit(main())
