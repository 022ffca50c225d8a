"""Strong-scaling convergence table on the virtual CPU mesh, including
non-dividing (ragged) shard counts — the reference's scaling axis
(run.py:26) in convergence form (time axis needs multi-chip hardware)."""
import json
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from functools import partial
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import subdomain as sub

shape, N, r = (8, 8, 16), 4, 3
mk = partial(mg.kershaw_mesh, shape, epsilon=0.3)
mesh = mk(N)
out = {"config": {"shape": shape, "N": N, "reduction": r, "epsilon": 0.3,
                  "solver": "fgmres", "inner": "amg", "tolerance": 1e-8},
       "points": mesh.num_points, "iterations": {}}
for P in [1, 2, 3, 4, 5, 6, 8]:
    sd = partition_mesh(mesh, P)
    dm = jax.make_mesh((P,), ("shard",)) if P > 1 else None
    dom = Domain(sd, dtype=jnp.float64, device_mesh=dm)
    u_star = dom.initial_function(4, seed=0)
    f = dom.manufacture_rhs(u_star)
    pre = sub.composite_dd(dom, mk, poly_reduction=r, fine_mesh=mesh)
    res = dom.solver(method="fgmres", max_iterations=200, tolerance=1e-8,
                     precond=pre)(f)
    ragged = sd.structured.ragged
    out["iterations"][str(P)] = {
        "iterations": int(res.iterations),
        "converged": bool(res.converged),
        "ragged_partition": bool(ragged),
        "slab_layers": list(sd.structured.layer_counts)}
    print(P, out["iterations"][str(P)], flush=True)
json.dump(out, open("artifacts/strong_scaling_convergence.json", "w"),
          indent=1)
print("written")
