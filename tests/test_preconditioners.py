"""Jacobi-preconditioned CG (BASELINE.json configs[1])."""

import numpy as np
import jax
import jax.numpy as jnp

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import preconditioners


def test_jacobi_converges_and_helps():
    # anisotropic-ish Kershaw mesh where diagonal scaling matters
    mesh = mg.kershaw_mesh((6, 6), 5, epsilon=0.3)
    dom = Domain(partition_mesh(mesh, 1), dtype=jnp.float64)
    u_star = dom.initial_function(4, seed=3)
    f = dom.manufacture_rhs(u_star)

    base = dom.solver(method="fcg", max_iterations=2000, tolerance=1e-9)(f)
    jac = dom.solver(method="fcg", max_iterations=2000, tolerance=1e-9,
                     precond=preconditioners.jacobi(dom))(f)
    assert bool(base.converged) and bool(jac.converged)
    assert int(jac.iterations) < int(base.iterations)
    err = np.abs(np.asarray(jac.u) - np.asarray(u_star)).max()
    assert err < 1e-6


def test_jacobi_spmd_matches_single():
    mesh = mg.kershaw_mesh((4, 4), 4, epsilon=0.3)
    dom1 = Domain(partition_mesh(mesh, 1), dtype=jnp.float64)
    dm = jax.make_mesh((8,), ("shard",))
    dom8 = Domain(partition_mesh(mesh, 8), dtype=jnp.float64, device_mesh=dm)

    its = []
    for dom in (dom1, dom8):
        u_star = dom.initial_function(0)
        f = dom.manufacture_rhs(u_star)
        res = dom.solver(method="fcg", max_iterations=1000, tolerance=1e-9,
                         precond=preconditioners.jacobi(dom))(f)
        assert bool(res.converged)
        its.append(int(res.iterations))
    assert abs(its[0] - its[1]) <= 1
