"""CSR assembly + ELL SpMV vs scipy (the reference's csr_matrix layer)."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp
import pytest

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops import csr


def random_csr(m, n, density, seed):
    rng = np.random.default_rng(seed)
    nnz = int(m * n * density)
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    return csr.assemble_csr(rows, cols, vals, (m, n))


def test_assemble_sums_duplicates():
    m = csr.assemble_csr([0, 0, 1], [1, 1, 0], [2.0, 3.0, 4.0], (2, 2))
    assert m[0, 1] == 5.0 and m[1, 0] == 4.0 and m.nnz == 2


def test_assemble_drop_tol():
    m = csr.assemble_csr([0, 1], [0, 1], [1e-15, 1.0], (2, 2), drop_tol=1e-12)
    assert m.nnz == 1


@pytest.mark.parametrize("shape,density", [((50, 70), 0.05), ((200, 200), 0.02),
                                           ((33, 17), 0.3), ((5, 5), 1.0)])
@pytest.mark.parametrize("sort_rows", [True, False])
def test_ell_spmv_matches_scipy(shape, density, sort_rows):
    m = random_csr(*shape, density, seed=1)
    ell = csr.ell_from_csr(m, sort_rows=sort_rows, dtype=np.float64)
    x = np.random.default_rng(2).standard_normal(shape[1])
    y = np.asarray(csr.ell_spmv(ell, jnp.asarray(x)))
    np.testing.assert_allclose(y, m @ x, atol=1e-12)


def test_ell_empty_rows():
    m = sp.csr_matrix((np.array([1.0]), (np.array([3]), np.array([2]))),
                      shape=(5, 4))
    ell = csr.ell_from_csr(m, dtype=np.float64)
    x = np.arange(4.0)
    y = np.asarray(csr.ell_spmv(ell, jnp.asarray(x)))
    np.testing.assert_allclose(y, m @ x, atol=1e-14)


def test_ell_spmv_range_and_weight():
    import scipy.sparse as sp
    import jax.numpy as jnp
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops.csr import (
        ell_from_csr, ell_spmv_range, ell_spmv_weight)

    rng = np.random.default_rng(5)
    A = sp.random(40, 30, density=0.2, random_state=7, format="csr")
    x = rng.standard_normal(30)
    m = ell_from_csr(A, dtype=np.float64)
    xj = jnp.asarray(x)

    # multiply_range (csr_matrix.okl:20-33)
    y = np.asarray(ell_spmv_range(m, xj, 10, 25))
    want = A @ x
    assert np.allclose(y[10:25], want[10:25], atol=1e-12)
    assert np.abs(y[:10]).max() == 0.0 and np.abs(y[25:]).max() == 0.0

    # multiply_weight (csr_matrix.okl:35-48)
    w = rng.standard_normal(40)
    yw = np.asarray(ell_spmv_weight(m, xj, jnp.asarray(w)))
    assert np.allclose(yw, w * want, atol=1e-12)


def test_bsr_transposed_layout_matches_row_layout():
    # round 5: the (B, B, nb) storage for multi-million-block fem trees
    # (TPU tiling pads the row layout's minor B to 128 — 16x at B=8;
    # PB_146's 2.46 GB of block-8 values would occupy 39 GB) must give
    # the identical SpMV result through the chunked path
    rng = np.random.default_rng(7)
    n = 611
    A = sp.random(n, n, density=0.02, random_state=3, format="csr")
    A = A + sp.eye(n)
    x = rng.standard_normal(n)
    for block in (8, 16):
        row = csr.bsr_from_csr(A.tocsr(), block=block, dtype=np.float64,
                               layout="row")
        tr = csr.bsr_from_csr(A.tocsr(), block=block, dtype=np.float64,
                              layout="tr")
        assert tr.layout == "tr" and tr.block == block
        y_row = np.asarray(csr.bsr_spmv(row, jnp.asarray(x)))
        y_tr = np.asarray(csr.bsr_spmv(tr, jnp.asarray(x)))
        y_ref = A @ x
        np.testing.assert_allclose(y_row, y_ref, rtol=1e-12)
        np.testing.assert_allclose(y_tr, y_ref, rtol=1e-12)


def test_bsr_auto_layout_threshold():
    A = sp.eye(64, format="csr")
    m = csr.bsr_from_csr(A, block=8, dtype=np.float32)
    assert m.layout == "row"          # tiny: stays in the natural form
    # bsr_stack honors an explicit layout and keeps it in the pytree
    st = csr.bsr_stack([A, A], block=8, dtype=np.float32, layout="tr")
    assert st.layout == "tr"
    assert st.vals.shape == (2, 8, 8, st.bcols.shape[1])


def test_coo_spmv_matches_dense():
    rng = np.random.default_rng(11)
    A = sp.random(523, 377, density=0.015, random_state=5, format="csr")
    x = rng.standard_normal(377)
    m = csr.coo_from_csr(A, dtype=np.float64)
    y = np.asarray(csr.coo_spmv(m, jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=1e-12)
    # stacked with nnz padding: pad entries land on the dump row
    B = sp.random(523, 377, density=0.03, random_state=6, format="csr")
    st = csr.coo_stack([A, B], dtype=np.float64, select=[0, 1])
    assert st.vals.shape[0] == 2 and st.vals.shape[1] == B.nnz
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops.csr import CooMatrix
    for k, M in enumerate((A, B)):
        mk = CooMatrix(vals=st.vals[k], cols=st.cols[k], rows=st.rows[k],
                       n_rows=st.n_rows, n_cols=st.n_cols)
        np.testing.assert_allclose(
            np.asarray(csr.coo_spmv(mk, jnp.asarray(x))), M @ x,
            rtol=1e-12)
    # dispatcher
    np.testing.assert_allclose(
        np.asarray(csr.sparse_spmv(m, jnp.asarray(x))), A @ x, rtol=1e-12)
