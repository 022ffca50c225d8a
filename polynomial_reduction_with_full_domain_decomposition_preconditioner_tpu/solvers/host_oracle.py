"""Host-side float64 SEM operator oracle + iterative refinement.

The reference's production criterion is relative residual < 1e-7 in
DOUBLE precision (/root/reference/domain.hpp:118). ``solvers/refine.py``
meets it with an f64 Domain on the device — but at the headline sizes
(Kershaw 64^3 N=7 = 134M points) duplicating the geometric factors in
f64 on the chip costs 6.4 GB of HBM next to the resident f32 solver and
preconditioner, which does not fit. This module keeps the f64 side on
the HOST: a chunked numpy f64 stiffness apply (the exact arithmetic of
ops/sem.stiffness_apply, which itself mirrors domain.okl:5-98) and a
bincount-based direct stiffness summation over global node ids (the
gslib role, domain.tpp:583-600). Only the f32 correction solves touch
the device, exactly the STYPE/PTYPE boundary of the reference
(config.hpp:19-20) moved up one level.

Used by the headline artifacts (artifacts/run_64cubed.py,
artifacts/run_pebble_production.py) to certify the 1e-7 double
criterion at sizes where the device-resident f64 path cannot run.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..utils.gll import diff_matrix

__all__ = ["HostOperator", "host_refine_solve", "HostRefinedResult",
           "owned_to_global", "global_to_owned"]


def owned_to_global(dom, vals: np.ndarray) -> np.ndarray:
    """Owned-shard padded host layout (num_owned, elems_per_shard*npe) ->
    GLOBAL element-ordered flat field (num_total_elements*npe,).

    Pad-element slots are dropped via the partition's per-shard element
    offsets. In multi-process runs ownership is disjoint, so a sum over
    the process-allgathered local scatters reconstructs the full field on
    every process (the reference's refinement criterion is evaluated on
    the global field, domain.tpp:683-692)."""
    st = dom.sharded
    npe = st.num_points_per_elem
    vals = np.asarray(vals, dtype=np.float64).reshape(dom.num_owned, -1)
    g = np.zeros(st.num_total_elements * npe)
    for k, p in enumerate(st.owned or range(st.num_shards)):
        lo, hi = st.elem_offsets[p], st.elem_offsets[p + 1]
        g[lo * npe:hi * npe] = vals[k, :(hi - lo) * npe]
    if dom.multiprocess:
        from jax.experimental import multihost_utils
        g = np.asarray(multihost_utils.process_allgather(g)).sum(axis=0)
    return g


def global_to_owned(dom, vals: np.ndarray) -> np.ndarray:
    """GLOBAL element-ordered flat field -> owned-shard padded host
    layout consumable by Domain.to_device_field (pad slots zero)."""
    st = dom.sharded
    npe = st.num_points_per_elem
    vals = np.asarray(vals).reshape(-1)
    out = np.zeros((dom.num_owned, st.elems_per_shard * npe),
                   dtype=vals.dtype)
    for k, p in enumerate(st.owned or range(st.num_shards)):
        lo, hi = st.elem_offsets[p], st.elem_offsets[p + 1]
        out[k, :(hi - lo) * npe] = vals[lo * npe:hi * npe]
    return out


class HostOperator:
    """f64 numpy replica of the fine SEM operator on a GlobalMesh.

    Operates on GLOBAL element-ordered flat fields (num_elements * npe,).
    ``apply`` is the non-assembled local stiffness image (the reference's
    2-argument stiffness_matrix, domain.tpp:602-609); ``dssum`` the masked
    Q Q^T sum; ``residual_norm`` the solvers' sqrt(<r, Q Q^T masked r>)
    convergence metric (domain.tpp:916-931).
    """

    def __init__(self, mesh, chunk: int = 16384):
        self.dim = mesh.dim
        self.n = mesh.poly_degree + 1
        self.npe = mesh.num_points_per_elem
        self.E = mesh.num_elements
        self.chunk = chunk
        self.geom = np.asarray(mesh.geom, dtype=np.float64)
        self.glo = np.asarray(mesh.glo_num, dtype=np.int64).reshape(-1)
        self.mask = np.asarray(mesh.dirichlet_mask,
                               dtype=np.float64).reshape(-1)
        self.num_nodes = int(self.glo.max()) + 1
        self.D = np.asarray(diff_matrix(self.n), dtype=np.float64)

    def apply(self, u: np.ndarray) -> np.ndarray:
        """A_local u, chunked over elements (f64, host)."""
        n, dim, E, npe = self.n, self.dim, self.E, self.npe
        D, Dt = self.D, self.D.T
        u = np.asarray(u, dtype=np.float64).reshape(E, npe)
        out = np.empty_like(u)

        def contract_last(M, U):
            # out[..., i] = sum_k M[i, k] U[..., k]
            return np.einsum("ik,...k->...i", M, U, optimize=True)

        for s in range(0, E, self.chunk):
            e = min(s + self.chunk, E)
            C = e - s
            if dim == 2:
                U = u[s:e].reshape(C, n, n)
                G = self.geom[s:e].reshape(C, n, n, 3)
                Dr = contract_last(D, U)
                Ds = np.swapaxes(contract_last(D, np.swapaxes(U, 1, 2)), 1, 2)
                Wr = G[..., 0] * Dr + G[..., 2] * Ds
                Ws = G[..., 2] * Dr + G[..., 1] * Ds
                Au = contract_last(Dt, Wr)
                Au += np.swapaxes(
                    contract_last(Dt, np.swapaxes(Ws, 1, 2)), 1, 2)
            else:
                U = u[s:e].reshape(C, n, n, n)
                G = self.geom[s:e].reshape(C, n, n, n, 6)
                Dr = contract_last(D, U)
                Ds = np.swapaxes(contract_last(D, np.swapaxes(U, 2, 3)), 2, 3)
                Dt_ = np.swapaxes(contract_last(D, np.swapaxes(U, 1, 3)), 1, 3)
                Wr = G[..., 0] * Dr + G[..., 3] * Ds + G[..., 4] * Dt_
                Ws = G[..., 3] * Dr + G[..., 1] * Ds + G[..., 5] * Dt_
                Wt = G[..., 4] * Dr + G[..., 5] * Ds + G[..., 2] * Dt_
                Au = contract_last(Dt, Wr)
                Au += np.swapaxes(
                    contract_last(Dt, np.swapaxes(Ws, 2, 3)), 2, 3)
                Au += np.swapaxes(
                    contract_last(Dt, np.swapaxes(Wt, 1, 3)), 1, 3)
            out[s:e] = Au.reshape(C, npe)
        return out.reshape(-1)

    def dssum(self, r: np.ndarray, apply_mask: bool = True) -> np.ndarray:
        """Masked Q Q^T r over shared global node ids (gslib gs_add role,
        domain.tpp:583-600)."""
        s = np.bincount(self.glo, weights=r.reshape(-1),
                        minlength=self.num_nodes)
        out = s[self.glo]
        if apply_mask:
            out *= self.mask
        return out

    def residual_norm(self, r: np.ndarray) -> float:
        return float(np.sqrt(max(np.dot(r.reshape(-1), self.dssum(r)), 0.0)))

    def residual(self, u, f):
        r = np.asarray(f, dtype=np.float64) - self.apply(u)
        return r, self.residual_norm(r)


@dataclass
class HostRefinedResult:
    u: np.ndarray                 # f64 host solution (E*npe,)
    rel_residual: float
    cycles: int
    inner_iterations: int
    history: list
    converged: bool


def host_refine_solve(host_op: HostOperator, dom32, solve32, f64,
                      *, tolerance: float = 1.0e-7, max_cycles: int = 10,
                      verbose=None) -> HostRefinedResult:
    """Solve A u = f to ``tolerance`` relative f64 residual, with all f64
    arithmetic on the host and the f32 production solver as the
    correction engine (classical iterative refinement; the reference's
    double build evaluates the identical criterion, domain.hpp:118).

    dom32: the f32 Domain whose solver produced ``solve32`` (used only
      for host<->device field conversion).
    f64: f64 host RHS in GLOBAL element order, e.g. host_op.apply(u*).
    """
    f64 = np.asarray(f64, dtype=np.float64).reshape(-1)
    f_norm = host_op.residual_norm(f64)
    u = np.zeros_like(f64)
    if f_norm == 0.0:
        return HostRefinedResult(u=u, rel_residual=0.0, cycles=0,
                                 inner_iterations=0, history=[0.0],
                                 converged=True)
    history = []
    inner_total = 0
    for cycle in range(max_cycles):
        r, rn = host_op.residual(u, f64)
        rel = rn / f_norm
        history.append(rel)
        if verbose:
            verbose(cycle, rel)
        if rel < tolerance:
            return HostRefinedResult(u=u, rel_residual=rel, cycles=cycle,
                                     inner_iterations=inner_total,
                                     history=history, converged=True)
        rd = dom32.to_device_field(global_to_owned(
            dom32, r.astype(np.float32)))
        res = solve32(rd)
        inner_total += int(res.iterations)
        corr = owned_to_global(dom32, dom32.from_device_field(res.u))
        try:
            res.u.delete()
        except Exception:
            pass
        u = u + corr
    r, rn = host_op.residual(u, f64)
    rel = rn / f_norm
    history.append(rel)
    if verbose:
        verbose(max_cycles, rel)
    return HostRefinedResult(u=u, rel_residual=rel, cycles=max_cycles,
                             inner_iterations=inner_total, history=history,
                             converged=rel < tolerance)
