"""Mixed-precision iterative refinement: the reference's double-precision
production criterion (relative residual < 1e-7 in f64, domain.hpp:118)
reached with the f32 production solver as the correction engine.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import subdomain as sub
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.refine import refine_solve


def test_refinement_reaches_double_accuracy():
    shape, N, r = (4, 4, 8), 3, 2
    mk = partial(mg.kershaw_mesh, shape, epsilon=0.3)
    mesh = mk(N)
    for Pn in (1, 4):
        sd = partition_mesh(mesh, Pn)
        dm = jax.make_mesh((Pn,), ("shard",)) if Pn > 1 else None
        dom32 = Domain(sd, dtype=jnp.float32, device_mesh=dm)
        dom64 = Domain(sd, dtype=jnp.float64, device_mesh=dm)
        u_star = dom64.initial_function(4, seed=0)
        f64 = dom64.manufacture_rhs(u_star)
        pre = sub.composite_dd(dom32, mk, poly_reduction=r, inner="amg",
                               fine_mesh=mesh)
        solve32 = dom32.solver(method="fgmres", max_iterations=100,
                               precond=pre)
        res = refine_solve(dom64, solve32, f64, tolerance=1e-7)
        assert res.converged, res.history
        assert res.rel_residual < 1e-7
        # each f32 cycle gains ~4 digits: 1e-7 needs 2-3 cycles
        assert res.cycles <= 3, res.history
        err = np.abs(dom64.from_device_field(res.u)
                     - dom64.from_device_field(u_star)).max()
        scale = np.abs(dom64.from_device_field(u_star)).max()
        assert err <= 1e-6 * scale, (err, scale)


def test_refinement_driver_record():
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation
    import io
    cfg = Config(mesh="kershaw", shape=(4, 4, 4), poly_degree=3,
                 poly_reduction=2, max_iterations=60,
                 refine_tolerance=1e-7)
    rec = run_simulation(cfg, out=io.StringIO())
    assert rec["converged"]
    assert rec["refined_converged"]
    assert rec["refined_rel_residual"] < 1e-7
    assert rec["refined_max_error"] < 1e-6
