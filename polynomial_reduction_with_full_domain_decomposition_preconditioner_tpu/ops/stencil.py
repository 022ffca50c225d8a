"""Stencil-form sparse operators on tensor node grids.

The TPU-native answer to "CSR SpMV at speed of light" (SURVEY.md 7.3(4))
for *structured* matrices: a matrix whose pattern is contained in the
27-point (3-D) / 9-point (2-D) box stencil of a tensor grid is stored as
per-offset coefficient arrays and applied as K dense roll-multiply-adds —
pure VPU traffic, no gathers (measured: XLA TPU gathers run ~0.1 Gnnz/s;
this form is bandwidth-bound). Used for the vertex-grid Galerkin levels of
the multilevel preconditioner (amg/), whose RAP matrices are exactly
27-point stencils; irregular matrices keep the ELL path (ops/csr.py).

Boundary handling: rolls wrap around, but a wrapped neighbor has no CSR
entry, so its coefficient slot is zero — wraparound contributions vanish
identically.
"""

from __future__ import annotations

from itertools import product

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

__all__ = ["stencil_offsets", "stencil_from_csr", "stencil_apply"]


def stencil_offsets(dim: int):
    return list(product((-1, 0, 1), repeat=dim))


def stencil_from_csr(A: sp.csr_matrix, grid_shape, dtype=np.float32):
    """Convert a CSR matrix over a C-order raveled tensor grid into
    per-offset coefficient arrays (K, *grid_shape). Raises if any entry
    falls outside the distance-1 box stencil."""
    grid_shape = tuple(grid_shape)
    dim = len(grid_shape)
    coo = A.tocoo()
    rc = np.stack(np.unravel_index(coo.row, grid_shape), axis=0)
    cc = np.stack(np.unravel_index(coo.col, grid_shape), axis=0)
    d = cc - rc
    if np.abs(d).max(initial=0) > 1:
        raise ValueError("matrix entries outside the box stencil")
    key = np.zeros(coo.nnz, dtype=np.int64)
    for a in range(dim):
        key = key * 3 + (d[a] + 1)
    K = 3 ** dim
    coefs = np.zeros((K,) + grid_shape, dtype=dtype)
    flat = coefs.reshape(K, -1)
    np.add.at(flat, (key, coo.row), coo.data)
    return jnp.asarray(coefs)


def stencil_apply(coefs, x, dim: int):
    """y = A x with A in stencil form; x is flat over the grid."""
    grid_shape = coefs.shape[1:]
    X = x.reshape(grid_shape)
    out = None
    axes = tuple(range(dim))
    for k, off in enumerate(stencil_offsets(dim)):
        term = coefs[k] * (X if all(o == 0 for o in off) else
                           jnp.roll(X, tuple(-o for o in off), axis=axes))
        out = term if out is None else out + term
    return out.reshape(x.shape)
