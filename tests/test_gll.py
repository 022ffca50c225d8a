"""GLL primitives vs closed forms (replaces trusting special_functions.f)."""

import numpy as np
import pytest

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.utils import gll


def test_gll_points_weights_n3():
    r, w = gll.gll_points_weights(3)
    np.testing.assert_allclose(r, [-1.0, 0.0, 1.0], atol=1e-14)
    np.testing.assert_allclose(w, [1 / 3, 4 / 3, 1 / 3], atol=1e-14)


def test_gll_points_weights_n4():
    r, w = gll.gll_points_weights(4)
    s5 = 1.0 / np.sqrt(5.0)
    np.testing.assert_allclose(r, [-1.0, -s5, s5, 1.0], atol=1e-14)
    np.testing.assert_allclose(w, [1 / 6, 5 / 6, 5 / 6, 1 / 6], atol=1e-14)


@pytest.mark.parametrize("n", [2, 3, 5, 8, 12, 16])
def test_weights_sum_to_two(n):
    _, w = gll.gll_points_weights(n)
    assert abs(w.sum() - 2.0) < 1e-13


@pytest.mark.parametrize("n", [2, 4, 8, 12])
def test_quadrature_exactness(n):
    # GLL with n points integrates polynomials up to degree 2n-3 exactly
    r, w = gll.gll_points_weights(n)
    for deg in range(0, 2 * n - 2):
        exact = 0.0 if deg % 2 else 2.0 / (deg + 1)
        assert abs(np.dot(w, r ** deg) - exact) < 1e-12, deg


@pytest.mark.parametrize("n", [2, 3, 5, 8, 13])
def test_diff_matrix_exact_on_polynomials(n):
    r, _ = gll.gll_points_weights(n)
    D = gll.diff_matrix(n)
    assert np.max(np.abs(D.sum(axis=1))) < 1e-12  # derivative of constants
    for deg in range(1, n):
        np.testing.assert_allclose(D @ (r ** deg), deg * r ** (deg - 1),
                                   atol=1e-10)


@pytest.mark.parametrize("nc,nf", [(2, 5), (3, 8), (5, 9), (8, 8)])
def test_interp_matrix_exact_on_polynomials(nc, nf):
    rc, _ = gll.gll_points_weights(nc)
    rf, _ = gll.gll_points_weights(nf)
    J = gll.interp_matrix(nc, nf)
    assert J.shape == (nf, nc)
    for deg in range(nc):
        np.testing.assert_allclose(J @ (rc ** deg), rf ** deg, atol=1e-12)


def test_interp_identity():
    J = gll.interp_matrix(6, 6)
    np.testing.assert_allclose(J, np.eye(6), atol=1e-12)


def test_lagrange_eval_cardinal():
    r, _ = gll.gll_points_weights(5)
    L = gll.lagrange_eval(r, r)
    np.testing.assert_allclose(L, np.eye(5), atol=1e-13)
