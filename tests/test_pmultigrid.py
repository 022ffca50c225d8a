"""Polynomial-reduction multilevel preconditioner (BASELINE configs[2]).

Checks the p-MG V-cycle: interpolation exactness, iteration reduction vs
Jacobi, order-independence trend, SPMD parity.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import preconditioners
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops import interp
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.utils.gll import interp_matrix, gll_points_weights


def test_prolongation_exact_on_polynomials():
    # interpolating a degree-<=Nc polynomial field up is exact
    nc, nf, dim = 4, 8, 2
    rc, _ = gll_points_weights(nc + 1)
    rf, _ = gll_points_weights(nf + 1)
    J = jnp.asarray(interp_matrix(nc + 1, nf + 1))
    xc, yc = np.meshgrid(rc, rc, indexing="ij")   # (j, i) storage
    poly = lambda x, y: 1 + 2 * x - y + 3 * x * y + x ** 3 * y ** 2
    u_c = poly(yc, xc).reshape(1, -1)             # x fastest
    u_f = np.asarray(interp.prolongate(jnp.asarray(u_c), J, dim))
    xf, yf = np.meshgrid(rf, rf, indexing="ij")
    np.testing.assert_allclose(u_f.reshape((nf + 1,) * 2),
                               poly(yf, xf), atol=1e-12)


def test_restrict_is_adjoint_of_prolongate():
    nc, nf, dim = 3, 7, 3
    J = jnp.asarray(interp_matrix(nc + 1, nf + 1))
    rng = np.random.default_rng(0)
    uc = jnp.asarray(rng.standard_normal((4, (nc + 1) ** 3)))
    vf = jnp.asarray(rng.standard_normal((4, (nf + 1) ** 3)))
    lhs = float(jnp.vdot(interp.prolongate(uc, J, dim), vf))
    rhs = float(jnp.vdot(uc, interp.restrict(vf, J, dim)))
    assert abs(lhs - rhs) < 1e-10 * max(1, abs(lhs))


@pytest.mark.parametrize("P", [1, 8])
def test_pmg_beats_jacobi(P):
    shape, N, eps = (6, 6), 7, 0.3
    mesh = mg.kershaw_mesh(shape, N, eps)
    if P == 1:
        dom = Domain(partition_mesh(mesh, 1), dtype=jnp.float64)
    else:
        dm = jax.make_mesh((P,), ("shard",))
        dom = Domain(partition_mesh(mesh, P), dtype=jnp.float64,
                     device_mesh=dm)
    u_star = dom.initial_function(4, seed=1)
    f = dom.manufacture_rhs(u_star)

    mesh_builder = partial(mg.kershaw_mesh, shape, epsilon=eps)
    pmg = preconditioners.pmultigrid(dom, mesh_builder, poly_reduction=3)
    res_pmg = dom.solver(method="fcg", max_iterations=400, tolerance=1e-9,
                         precond=pmg)(f)
    res_jac = dom.solver(method="fcg", max_iterations=400, tolerance=1e-9,
                         precond=preconditioners.jacobi(dom))(f)
    assert bool(res_pmg.converged)
    assert int(res_pmg.iterations) < int(res_jac.iterations) // 2, (
        int(res_pmg.iterations), int(res_jac.iterations))
    err = np.abs(np.asarray(res_pmg.u) - np.asarray(u_star)).max()
    assert err < 1e-6


def test_pmg_3d_converges():
    shape, N, eps = (3, 3, 3), 5, 0.3
    mesh = mg.kershaw_mesh(shape, N, eps)
    dom = Domain(partition_mesh(mesh, 1), dtype=jnp.float64)
    u_star = dom.initial_function(0)
    f = dom.manufacture_rhs(u_star)
    pmg = preconditioners.pmultigrid(
        dom, partial(mg.kershaw_mesh, shape, epsilon=eps), poly_reduction=4)
    res = dom.solver(method="fcg", max_iterations=200, tolerance=1e-9,
                     precond=pmg)(f)
    assert bool(res.converged)
    assert int(res.iterations) < 90
