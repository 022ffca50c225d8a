"""SEM stiffness operator: algebraic invariants + true-Poisson validation."""

import numpy as np
import jax.numpy as jnp
import pytest

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops import sem
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.utils.gll import diff_matrix


def make_domain(shape, N, dtype=jnp.float64, kershaw=None):
    mesh = (mg.kershaw_mesh(shape, N, kershaw) if kershaw
            else mg.box_mesh(shape, N))
    sd = partition_mesh(mesh, 1)
    return mesh, Domain(sd, dtype=dtype)


def dense_assembled(mesh, dom):
    """Assemble Qt A_loc Q by applying the operator to all unit vectors."""
    import jax
    gids = mesh.glo_num.ravel()
    uniq, inv = np.unique(gids, return_inverse=True)
    nn = uniq.size
    npts = gids.size
    basis = np.zeros((nn, npts))
    basis[inv, np.arange(npts)] = 1.0  # rows = Q e_j
    dev_basis = jnp.stack([dom.to_device_field(b) for b in basis])
    au_dev = jax.vmap(dom.apply_operator)(dev_basis)
    A = np.zeros((nn, nn))
    for j in range(nn):
        au = dom.from_device_field(au_dev[j])
        A[:, j] = np.bincount(inv, weights=au.ravel(), minlength=nn)
    return A, uniq, inv


@pytest.mark.parametrize("shape,N,kershaw", [((2, 2), 3, None), ((2, 2), 2, 0.3),
                                             ((2, 2, 2), 2, 0.3)])
def test_assembled_operator_symmetric_and_psd(shape, N, kershaw):
    mesh, dom = make_domain(shape, N, kershaw=kershaw)
    A, uniq, inv = dense_assembled(mesh, dom)
    assert np.max(np.abs(A - A.T)) < 1e-11
    # null space = constants only
    w = np.linalg.eigvalsh(A)
    assert w[0] > -1e-10
    assert abs(w[0]) < 1e-9        # constant mode
    assert w[1] > 1e-8             # everything else positive


@pytest.mark.parametrize("shape,N,kershaw", [((3, 2), 4, None), ((2, 2, 2), 3, 0.3)])
def test_operator_annihilates_constants(shape, N, kershaw):
    _, dom = make_domain(shape, N, kershaw=kershaw)
    ones = dom.to_device_field(np.ones(dom.points_shape()))
    au = dom.from_device_field(dom.apply_operator(ones))
    assert np.max(np.abs(au)) < 1e-10


def test_diagonal_matches_dense():
    mesh, dom = make_domain((2, 2), 3, kershaw=0.3)
    A, uniq, inv = dense_assembled(mesh, dom)
    diag_pts = np.asarray(sem.stiffness_diagonal(
        jnp.asarray(mesh.geom), jnp.asarray(diff_matrix(4)), mesh.dim))
    diag_nodes = np.bincount(inv, weights=diag_pts.ravel())
    np.testing.assert_allclose(diag_nodes, np.diagonal(A), rtol=1e-10)


def test_diagonal_matches_dense_3d():
    mesh, dom = make_domain((2, 1, 1), 2, kershaw=0.5)
    A, uniq, inv = dense_assembled(mesh, dom)
    diag_pts = np.asarray(sem.stiffness_diagonal(
        jnp.asarray(mesh.geom), jnp.asarray(diff_matrix(3)), mesh.dim))
    diag_nodes = np.bincount(inv, weights=diag_pts.ravel())
    np.testing.assert_allclose(diag_nodes, np.diagonal(A), rtol=1e-10)


@pytest.mark.parametrize("dim", [2, 3])
def test_true_poisson_spectral_accuracy(dim):
    """Solve -lap(u) = f with u* = prod sin(pi x_d): checks the operator is
    the actual Poisson stiffness (not just *a* SPD matrix)."""
    shape, N = ((4, 4), 8) if dim == 2 else ((3, 3, 3), 6)
    mesh, dom = make_domain(shape, N)
    c = mesh.coords
    u_star = np.prod(np.sin(np.pi * c), axis=-1)
    f_cont = dim * np.pi ** 2 * u_star  # -lap u*
    # weak-form rhs: B f (diagonal GLL mass)
    f = dom.to_device_field((mesh.mass * f_cont).reshape(dom.points_shape()))
    solve = dom.solver(method="fcg", max_iterations=600, tolerance=1e-12)
    res = solve(f)
    err = dom.from_device_field(res.u).ravel() - u_star.ravel()
    mask = mesh.dirichlet_mask.ravel()
    assert np.max(np.abs(err * mask)) < 1e-7
