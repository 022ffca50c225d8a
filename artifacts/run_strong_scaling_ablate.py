"""Strong-scaling iteration-growth ablation (round 5).

The round-4 sweep measured 13 -> 21..28 outer iterations at P = 1 -> 8
on a FIXED Kershaw mesh (artifacts/strong_scaling.json) against the
method's near-P-independence design point (the composite covers the
whole global domain on every shard, subdomain.tpp S5/S10). This script
isolates WHICH composite ingredient loses quality as slabs shrink, by
re-running the P sweep with each knob strengthened in isolation:

  base   v=1 w=1 i=4 far=auto        (production defaults)
  v2     subdomain_overlap=2         (deeper reduced-order rings)
  w2     superdomain_overlap=2       (wider fine fringe vs compression)
  i8     num_iterations=8            (stronger rank-local inner solve)
  nofar  far_coarsen=1               (NO far-field z-compression: the
                                      whole far region stays order-1
                                      fine — superdomain fidelity test)
  vx2    vertex_iters=2              (vertex-correction quality)

Writes artifacts/strong_scaling_ablate.json with per-config per-P
iteration counts. Reference design point: subdomain.tpp:487-510 region
growth, :1632-2579 superdomain compression.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "base":  {},
    "v2":    {"subdomain_overlap": 2},
    "w2":    {"superdomain_overlap": 2},
    "i8":    {"num_iterations": 8},
    "nofar": {"far_coarsen": 1},
    "vx2":   {"vertex_iters": 2},
}


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

    shape, N, red = (4, 4, 16), 3, 2
    mk = partial(mg.kershaw_mesh, shape, epsilon=0.3)
    mesh = mk(N)
    out = {"mesh": f"kershaw eps=0.3 {shape} N={N} r={red}",
           "points": mesh.num_points, "configs": {}}
    for tag, kw in CONFIGS.items():
        per_P = {}
        for Pn in (1, 2, 4, 8):
            dm = jax.make_mesh((Pn,), ("shard",)) if Pn > 1 else None
            dom = Domain(partition_mesh(mesh, Pn), dtype=jnp.float64,
                         device_mesh=dm)
            u_star = dom.initial_function(4, seed=0)
            f = dom.manufacture_rhs(u_star)
            try:
                pre = sub.composite_dd(dom, mk, poly_reduction=red,
                                       inner="amg", fine_mesh=mesh, **kw)
            except Exception as e:  # a knob unsupported at this P
                per_P[Pn] = {"error": str(e)}
                print(f"{tag} P={Pn}: ERROR {e}", file=sys.stderr)
                continue
            res = dom.solver(method="fgmres", max_iterations=100,
                             tolerance=1e-8, precond=pre)(f)
            hist = np.asarray(res.residual_history)
            k = int(np.isfinite(hist).sum())
            per_P[Pn] = {"iterations": k, "converged": bool(res.converged)}
            print(f"{tag} P={Pn}: {k} iterations", file=sys.stderr)
        out["configs"][tag] = {"knobs": kw, "per_P": per_P}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "strong_scaling_ablate.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({t: [v.get("iterations") for v in c["per_P"].values()]
                      for t, c in out["configs"].items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
