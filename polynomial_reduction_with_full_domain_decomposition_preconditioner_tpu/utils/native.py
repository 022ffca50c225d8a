"""ctypes bindings for the native C++ setup library (native/).

The reference's setup pipeline is native C++ (subdomain.tpp, csr_matrix.
tpp); this module exposes the rebuilt native kernels with transparent
pure-Python fallbacks, so the framework works unbuilt and speeds up when
``make -C native`` has been run (the build is attempted once, quietly, on
first use).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "p1_fem_coo", "coo_to_csr"]

_LIB = None
_TRIED = False


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_repo_root(), "native", "libprfdd_setup.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.dirname(so)],
                           capture_output=True, timeout=120, check=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i64 = ctypes.c_int64
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.p1_fem_coo_3d.restype = i64
    lib.p1_fem_coo_3d.argtypes = [p_f64, i64, i64, i64, p_i64, p_i64, p_f64]
    lib.p1_fem_coo_2d.restype = i64
    lib.p1_fem_coo_2d.argtypes = [p_f64, i64, i64, p_i64, p_i64, p_f64]
    lib.coo_to_csr.restype = i64
    lib.coo_to_csr.argtypes = [p_i64, p_i64, p_f64, i64, i64, i64,
                               p_i64, p_i64, p_f64]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def p1_fem_coo(X: np.ndarray):
    """COO entries of the P1 stiffness matrix on a structured node grid
    (native path of amg/fem.p1_stiffness_grid). Returns (rows, cols, vals)
    or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    X = np.ascontiguousarray(X, dtype=np.float64)
    dim = X.shape[-1]
    if dim == 3:
        nz, ny, nx = X.shape[:3]
        n_ent = (nz - 1) * (ny - 1) * (nx - 1) * 96
        rows = np.empty(n_ent, dtype=np.int64)
        cols = np.empty(n_ent, dtype=np.int64)
        vals = np.empty(n_ent, dtype=np.float64)
        lib.p1_fem_coo_3d(X, nz, ny, nx, rows, cols, vals)
        return rows, cols, vals
    ny, nx = X.shape[:2]
    n_ent = (ny - 1) * (nx - 1) * 18
    rows = np.empty(n_ent, dtype=np.int64)
    cols = np.empty(n_ent, dtype=np.int64)
    vals = np.empty(n_ent, dtype=np.float64)
    lib.p1_fem_coo_2d(X, ny, nx, rows, cols, vals)
    return rows, cols, vals


def coo_to_csr(rows, cols, vals, shape):
    """Native COO -> CSR with duplicate summation (csr_matrix.tpp:94-180);
    returns a scipy CSR, or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    import scipy.sparse as sp

    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    nr, nc = shape
    indptr = np.empty(nr + 1, dtype=np.int64)
    out_cols = np.empty(rows.size, dtype=np.int64)
    out_vals = np.empty(rows.size, dtype=np.float64)
    nnz = lib.coo_to_csr(rows, cols, vals, rows.size, nr, nc,
                         indptr, out_cols, out_vals)
    return sp.csr_matrix((out_vals[:nnz], out_cols[:nnz], indptr),
                         shape=shape)
