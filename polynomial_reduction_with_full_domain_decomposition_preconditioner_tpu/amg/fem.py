"""Low-order P1 finite-element matrices on structured node grids.

TPU-native rebuild of the reference's FEM-SEM spectral-equivalence
preconditioner assembly (/root/reference/subdomain.tpp:2749-3472): the SEM
operator is re-assembled as a simplicial linear-FEM matrix on the GLL
nodes — each quad cell between adjacent GLL nodes becomes 2 triangles,
each hex cell 6 tetrahedra (subdomain.tpp:2845-2900), with per-simplex P1
stiffness from affine-map inverse Jacobians (subdomain.tpp:2962-3038).

Everything here is host-side float64 numpy/scipy *setup* code; the device
solve path consumes the assembled CSR through amg/vcycle.py. Deviations
from the reference (documented capability-equivalent choices):

- The reference uses the exact SEM Q1 element matrix for order-1 elements
  (subdomain.tpp:3040-3125). Round 4 matched that: order-1 blocks use the
  exact SEM-Q1 assembly (amg/composite._q1_layer_grid_matrix,
  amg/aggregation.q1_vertex_matrix); orders >= 2 use the simplicial P1
  assembly below. Swapping exact Q1 in left iteration counts identical
  (BASELINE.md) — both are spectrally equivalent low-order operators.
- Simplex subdivision is the Kuhn/Freudenthal triangulation (all tets share
  the cell main diagonal), which is face-consistent across neighboring
  cells of a structured grid.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..utils.gll import gll_points_weights, lagrange_eval

__all__ = ["p1_stiffness_grid", "grid_interp_1d",
           "sem_element_matrices"]

# Kuhn triangulation of the unit cube: for each permutation pi of the axes,
# the tet 0 -> e_{pi0} -> e_{pi0}+e_{pi1} -> (1,1,1). Corners as (cz, cy, cx).
_KUHN_PERMS = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]


def _kuhn_tets():
    tets = []
    for perm in _KUHN_PERMS:
        corners = [(0, 0, 0)]
        acc = [0, 0, 0]
        for ax in perm:
            acc[ax] = 1
            corners.append(tuple(acc))
        tets.append(corners)
    return tets


def _simplex_stiffness(verts):
    """P1 stiffness matrices for a batch of simplices.

    verts: (B, d+1, d) vertex coordinates. Returns (B, d+1, d+1) local
    matrices K[a,b] = |T| grad(lambda_a) . grad(lambda_b), with |T| the
    unsigned simplex measure (subdomain.tpp:2962-3038 computes the same
    from affine-map inverse Jacobians).
    """
    d = verts.shape[-1]
    # edge matrix M[a, :] = x_{a+1} - x_0  (rows are edges)
    M = verts[:, 1:, :] - verts[:, :1, :]
    det = np.linalg.det(M)
    vol = np.abs(det) / (2.0 if d == 2 else 6.0)
    Minv = np.linalg.inv(M)                 # (B, d, d)
    # gradients: lambda_{a+1}(x) = [M^{-T} (x - x0)]_a -> grad = Minv[:, :, a]
    grads = np.empty((verts.shape[0], d + 1, d))
    grads[:, 1:, :] = np.swapaxes(Minv, 1, 2)
    grads[:, 0, :] = -grads[:, 1:, :].sum(axis=1)
    K = np.einsum("bad,bcd->bac", grads, grads) * vol[:, None, None]
    return K


def p1_stiffness_grid(X: np.ndarray, use_native: bool = True) -> sp.csr_matrix:
    """Assemble the P1 stiffness matrix on a structured node grid.

    X: (nz, ny, nx, 3) or (ny, nx, 2) node coordinates (any warped grid —
    the GLL nodes of a spectral element layer, subdomain.tpp:2845-2900).
    Returns CSR over C-order raveled node indices. No boundary conditions
    are applied here (the caller folds constraints and masks Dirichlet
    rows, as the reference does via J_e, subdomain.tpp:3130-3361).
    """
    X = np.asarray(X, dtype=np.float64)
    dim = X.shape[-1]
    grid = X.shape[:-1]
    n = int(np.prod(grid))

    # native C++ fast path (utils/native.py; the reference's setup is
    # native C++ throughout — subdomain.tpp:2845-3038)
    from ..utils import native
    ent = native.p1_fem_coo(X) if use_native else None
    if ent is not None:
        rows_n, cols_n, vals_n = ent
        A = native.coo_to_csr(rows_n, cols_n, vals_n, (n, n))
        if A is None:
            A = sp.coo_matrix((vals_n, (rows_n, cols_n)),
                              shape=(n, n)).tocsr()
            A.sum_duplicates()
        return A

    nid = np.arange(n, dtype=np.int64).reshape(grid)

    if dim == 2:
        ny, nx = grid
        # cell corners (cy, cx) in {0,1}^2; 2 triangles per quad cell
        tris = [[(0, 0), (0, 1), (1, 1)], [(0, 0), (1, 1), (1, 0)]]
        cells_y, cells_x = ny - 1, nx - 1
        rows, cols, vals = [], [], []
        for corners in tris:
            verts = np.stack([
                X[cy:cy + cells_y, cx:cx + cells_x].reshape(-1, 2)
                for cy, cx in corners], axis=1)      # (B, 3, 2)
            ids = np.stack([
                nid[cy:cy + cells_y, cx:cx + cells_x].reshape(-1)
                for cy, cx in corners], axis=1)      # (B, 3)
            K = _simplex_stiffness(verts)
            B, m = ids.shape
            rows.append(np.repeat(ids, m, axis=1).ravel())
            cols.append(np.tile(ids, (1, m)).ravel())
            vals.append(np.swapaxes(K, 1, 2).ravel())
    elif dim == 3:
        nz, ny, nx = grid
        cz, cy, cx = nz - 1, ny - 1, nx - 1
        rows, cols, vals = [], [], []
        for corners in _kuhn_tets():
            verts = np.stack([
                X[z:z + cz, y:y + cy, x:x + cx].reshape(-1, 3)
                for z, y, x in corners], axis=1)     # (B, 4, 3)
            ids = np.stack([
                nid[z:z + cz, y:y + cy, x:x + cx].reshape(-1)
                for z, y, x in corners], axis=1)     # (B, 4)
            K = _simplex_stiffness(verts)
            B, m = ids.shape
            rows.append(np.repeat(ids, m, axis=1).ravel())
            cols.append(np.tile(ids, (1, m)).ravel())
            vals.append(np.swapaxes(K, 1, 2).ravel())
    else:
        raise ValueError(f"dim must be 2 or 3, got {dim}")

    A = sp.coo_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n)).tocsr()
    A.sum_duplicates()
    return A


def grid_interp_1d(m: int, o_from: int, o_to: int) -> sp.csr_matrix:
    """1-D interpolation between multi-element GLL grids on [0, 1].

    Maps nodal values on the grid with m elements of order ``o_from``
    (m*o_from + 1 shared nodes) to the grid with the same m elements at
    order ``o_to``, elementwise GLL Lagrange interpolation (the
    reference's J_cf in assembled-grid form, subdomain.tpp:129-164; with
    o_from=1 this is the P1 interpolation J_cf_fem, subdomain.tpp:
    2754-2783). Shared element-boundary rows are written once (the
    per-element interpolants agree there exactly).
    """
    n_from, n_to = m * o_from + 1, m * o_to + 1
    rf, _ = gll_points_weights(o_from + 1)
    rt, _ = gll_points_weights(o_to + 1)
    L = lagrange_eval(rf, rt)               # (o_to+1, o_from+1)
    rows, cols, vals = [], [], []
    for e in range(m):
        r0, c0 = e * o_to, e * o_from
        rr, cc = np.nonzero(np.abs(L) > 1e-15)
        keep = (rr > 0) | (e == 0)          # write shared row once
        rows.append(r0 + rr[keep])
        cols.append(c0 + cc[keep])
        vals.append(L[rr[keep], cc[keep]])
    J = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n_to, n_from)).tocsr()
    return J


def sem_element_matrices(geom: np.ndarray, dim: int, n: int) -> np.ndarray:
    """Exact SEM element stiffness matrices (E, npe, npe) from geometric
    factors: K_e = sum_ab D_a^T diag(G_ab) D_b. With n=2 this is the
    reference's SEM Q1 element matrix for order-1 elements
    (subdomain.tpp:3040-3125)."""
    from ..utils.gll import diff_matrix
    D1 = np.asarray(diff_matrix(n))
    eye = np.eye(n)
    Ds = []
    for a in range(dim):                   # a = 0 -> r (x, fastest axis)
        mats = [eye] * dim
        mats[dim - 1 - a] = D1
        M = mats[0]
        for k in range(1, dim):
            M = np.kron(M, mats[k])
        Ds.append(M)
    Ds = np.stack(Ds)                      # (dim, npe, npe)
    if dim == 2:
        comp = [(0, 0, 0), (1, 1, 1), (2, 0, 1)]
    else:
        comp = [(0, 0, 0), (1, 1, 1), (2, 2, 2),
                (3, 0, 1), (4, 0, 2), (5, 1, 2)]
    npe = n ** dim
    E = geom.shape[0]
    Gf = np.zeros((E, npe, dim, dim))
    g = geom.reshape(E, npe, -1)
    for k, a, b in comp:
        Gf[..., a, b] = g[..., k]
        Gf[..., b, a] = g[..., k]
    return np.einsum("amp,emab,bmq->epq", Ds, Gf, Ds)
