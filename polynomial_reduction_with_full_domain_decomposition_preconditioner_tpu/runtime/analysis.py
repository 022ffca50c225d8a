"""Cross-validation and convergence-history analysis.

Rebuild of the reference's analysis.py (/root/reference/analysis.py):
where the reference compares its assembled matrices/solutions against
Nek5000 dumps through a permutation matrix (analysis.py:16-41), this
framework validates against in-repo oracles:

- ``assembled_operator_dense``: materialize the assembled SEM operator
  Q^T A_local Q as a dense matrix (the analysis.py matrix-diff role) for
  small problems; tests compare the matrix-free device apply against it.
- ``compare_histories``: residual-history diff between two runs (the
  reference's single-vs-double comparison, analysis.py:69-71).
"""

from __future__ import annotations

import numpy as np

__all__ = ["assembled_operator_dense", "compare_histories"]


def assembled_operator_dense(mesh) -> np.ndarray:
    """Dense assembled stiffness matrix on global nodes from the host mesh
    (scipy path; the Nek5000-cross-check role of analysis.py:32-41)."""
    import scipy.sparse as sp
    from ..amg.fem import p1_stiffness_grid  # noqa: F401  (API surface)
    from ..utils.gll import diff_matrix
    from ..ops import sem
    import jax.numpy as jnp

    E, npe = mesh.glo_num.shape
    N = mesh.num_nodes
    D = diff_matrix(mesh.poly_degree + 1)
    # columns of the local operator, element-batched
    A = np.zeros((N, N))
    geom = jnp.asarray(mesh.geom, dtype=jnp.float64)
    Dj = jnp.asarray(D)
    for v in range(npe):
        u = np.zeros((E, npe))
        u[:, v] = 1.0
        au = np.asarray(sem.stiffness_apply(jnp.asarray(u), geom, Dj,
                                            mesh.dim))
        for e in range(E):
            A[mesh.glo_num[e], mesh.glo_num[e, v]] += au[e]
    mask = np.ones(N)
    mrows = mesh.dirichlet_mask.reshape(E, npe)
    for e in range(E):
        mask[mesh.glo_num[e]] = np.minimum(mask[mesh.glo_num[e]], mrows[e])
    A = A * mask[:, None] * mask[None, :] + np.diag(1.0 - mask)
    return A


def compare_histories(hist_a, hist_b, rtol: float = 0.2) -> dict:
    """Compare two residual histories (analysis.py:69-71 role): returns
    iteration counts and the max relative deviation over the common
    prefix; 'match' if counts differ by <= 2 and rates stay within rtol."""
    a = np.asarray([h for h in np.asarray(hist_a) if np.isfinite(h)])
    b = np.asarray([h for h in np.asarray(hist_b) if np.isfinite(h)])
    n = min(a.size, b.size)
    rel = (np.abs(np.log(np.maximum(a[:n], 1e-300))
                  - np.log(np.maximum(b[:n], 1e-300)))
           / np.maximum(np.abs(np.log(np.maximum(a[:n], 1e-300))), 1.0))
    return {
        "iters_a": int(a.size - 1),
        "iters_b": int(b.size - 1),
        "max_log_rel_dev": float(rel.max()) if n else 0.0,
        "match": abs(a.size - b.size) <= 2 and (rel.max() < rtol if n else True),
    }
