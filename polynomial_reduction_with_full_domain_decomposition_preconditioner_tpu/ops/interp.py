"""Tensor-product order transfer (restriction / prolongation).

Rebuild of the reference's polynomial-reduction transfer kernels:
``restriction_1/2/3`` (/root/reference/subdomain.okl:284-366) apply the 1-D
GLL interpolation matrix J_cf (subdomain.tpp:129-164, built from hgll_)
dimension by dimension. On TPU each dimension pass is one element-batched
MXU contraction.

Conventions (matching the reference's tree_operator, subdomain.tpp:4576):
  prolongation  u_f = (J ox J ox J) u_c        with J = interp(n_c -> n_f)
  restriction   r_c = (J^T ox J^T ox J^T) r_f  (adjoint — correct for
                non-assembled residuals/right-hand sides)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tensor_apply", "prolongate", "restrict", "lattice_tensor_apply",
           "axis_contract"]

_HI = jax.lax.Precision.HIGHEST


def tensor_apply(u, M, dim: int):
    """Apply the 1-D operator M (n_out, n_in) along every node axis.

    u: (E, n_in^dim) in local ordering (x fastest). Returns (E, n_out^dim).
    """
    n_out, n_in = M.shape
    E = u.shape[0]
    U = u.reshape((E,) + (n_in,) * dim)
    for _ in range(dim):
        # contract the last node axis; the output axis lands first, so dim
        # passes restore the original axis order with all axes transformed
        U = jnp.einsum("oi,e...i->eo...", M, U, precision=_HI)
    return U.reshape(E, n_out ** dim)


def lattice_tensor_apply(U, M, dim: int):
    """Apply the 1-D operator M (n_out, n_in) per element along every axis
    of a point-lattice array (mesh/layout.elements_to_lattice layout).

    U: lattice shape (m_d * n_in, ...); returns (m_d * n_out, ...). Used
    for order transfer between lattices of different polynomial order on
    the same element grid — dense contractions, lane-aligned 128-chunk
    MXU form on TPU (ops/sem.dmul)."""
    from .sem import dmul
    n_out, n_in = M.shape
    for axis in range(dim):
        U = dmul(M, U, axis, n_in)
    return U


def axis_contract(M, U, axis: int):
    """Contract one full lattice axis with a dense operator M (n_out,
    n_in), U.shape[axis] == n_in. One dense MXU contraction — the gather-
    free form of grid transfer (vertex-grid prolongation/restriction)."""
    V = jnp.moveaxis(U, axis, -1)
    V = jnp.einsum("oi,...i->...o", M, V, precision=_HI)
    return jnp.moveaxis(V, -1, axis)


def prolongate(u_c, J, dim: int):
    """Coarse -> fine: J is interp_matrix(n_c, n_f), shape (n_f, n_c)."""
    return tensor_apply(u_c, J, dim)


def restrict(r_f, J, dim: int):
    """Fine -> coarse adjoint transfer: uses J^T."""
    return tensor_apply(r_f, J.T, dim)
