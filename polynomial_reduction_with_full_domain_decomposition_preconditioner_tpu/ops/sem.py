"""Matrix-free SEM stiffness operator as batched MXU tensor contractions.

TPU-native rebuild of the reference's hot kernels ``stiffness_matrix_1/2``
(/root/reference/domain.okl:5-98). The reference assigns one GPU thread per
nodal point with an inner serial loop; on TPU the same computation is the
element-batched contraction

    Au = sum_a D_a^T ( G_ab (D_b u) )

which XLA maps onto the MXU as ``(E * n^(d-1), n) x (n, n)`` batched
matmuls. Geometric factors carry GLL weights and |J| (see
mesh/generator.geometric_factors), so no extra mass scaling appears here.

No communication: the result is the *non-assembled* (local) operator
image, exactly like the reference's 2-argument ``stiffness_matrix`` call
(domain.tpp:602-609 with apply_dssum=false); direct stiffness summation is
a separate op (ops/gather_scatter.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["stiffness_apply", "stiffness_diagonal",
           "stiffness_apply_lattice", "stiffness_diagonal_lattice",
           "dense_derivative_ops", "stiffness_apply_dense"]

# f32 inputs stay f32 on the MXU (3-pass); bf16 fast path is a config knob
# handled by callers via dtype of the operands.
_PREC = jax.lax.Precision.HIGHEST


def _contract_last(D, U):
    """out[..., i] = sum_k D[i, k] U[..., k] along the trailing axis."""
    return jnp.einsum("ik,...k->...i", D, U, precision=_PREC)


def stiffness_apply(u, geom, D, dim: int):
    """Apply the local SEM stiffness operator element-by-element.

    Args:
      u: (E, npe) nodal values, local ordering v = i + j*n (+ k*n^2).
      geom: (E, npe, nG) geometric factors g_1..g_nG
            (2D: [G_rr, G_ss, G_rs]; 3D: [G_rr,G_ss,G_tt,G_rs,G_rt,G_st]).
      D: (n, n) GLL differentiation matrix, (D @ f)[i] = f'(r_i).
      dim: 2 or 3.

    Returns:
      (E, npe) the non-assembled operator image A_local u.
    """
    n = D.shape[0]
    E = u.shape[0]
    Dt = D.T

    if dim == 2:
        U = u.reshape(E, n, n)              # (e, j, i): x fastest
        G = geom.reshape(E, n, n, 3)
        # derivatives in reference coordinates (domain.okl:23-27)
        Dr = _contract_last(D, U)                          # d/dr along i
        Ds = jnp.swapaxes(_contract_last(D, jnp.swapaxes(U, 1, 2)), 1, 2)
        # geometric contraction (domain.okl:29-30)
        Wr = G[..., 0] * Dr + G[..., 2] * Ds
        Ws = G[..., 2] * Dr + G[..., 1] * Ds
        # transposed derivatives (domain.okl:72-78)
        Au = _contract_last(Dt, Wr)
        Au += jnp.swapaxes(_contract_last(Dt, jnp.swapaxes(Ws, 1, 2)), 1, 2)
        return Au.reshape(E, n * n)

    if dim == 3:
        U = u.reshape(E, n, n, n)           # (e, k, j, i): x fastest
        G = geom.reshape(E, n, n, n, 6)
        Dr = _contract_last(D, U)                              # along i
        Ds = jnp.swapaxes(_contract_last(D, jnp.swapaxes(U, 2, 3)), 2, 3)
        Dt_ = jnp.swapaxes(_contract_last(D, jnp.swapaxes(U, 1, 3)), 1, 3)
        # (domain.okl:47-49)
        Wr = G[..., 0] * Dr + G[..., 3] * Ds + G[..., 4] * Dt_
        Ws = G[..., 3] * Dr + G[..., 1] * Ds + G[..., 5] * Dt_
        Wt = G[..., 4] * Dr + G[..., 5] * Ds + G[..., 2] * Dt_
        # (domain.okl:91-95)
        Au = _contract_last(Dt, Wr)
        Au += jnp.swapaxes(_contract_last(Dt, jnp.swapaxes(Ws, 2, 3)), 2, 3)
        Au += jnp.swapaxes(_contract_last(Dt, jnp.swapaxes(Wt, 1, 3)), 1, 3)
        return Au.reshape(E, n ** 3)

    raise ValueError(f"dim must be 2 or 3, got {dim}")


def dense_derivative_ops(n: int, dim: int):
    """Dense per-element derivative operators for the MXU-saturating
    stiffness form: (DT_all, D_all) with
      DT_all (npe, dim*npe): u_e @ DT_all = [D_r u | D_s u | D_t u]
      D_all (dim*npe, npe):  [V_r | V_s | V_t] @ D_all = sum_a D_a^T V_a

    Rationale: the tensor-product (sum-factorized) apply is flop-minimal
    but its contractions are K=N=n matmuls — the MXU pads both to 128, a
    ~256x utilization loss that makes the apply compute-bound at ~8% of
    HBM speed of light (measured: 1156 us for 2.1M points). The dense
    form spends (9/2)n^2/(3n+4.5) ~ 27x more flops at FULL utilization:
    two (E, npe) x (npe, dim*npe) matmuls, npe = 512 at N=7. Host numpy;
    call once at setup.
    """
    import numpy as np
    from ..utils.gll import diff_matrix
    D = np.asarray(diff_matrix(n))
    I = np.eye(n)
    mats = []
    for a in range(dim):            # a = 0 is r (x, fastest storage axis)
        factors = [I] * dim
        factors[dim - 1 - a] = D
        M = factors[0]
        for f in factors[1:]:
            M = np.kron(M, f)
        mats.append(M)
    DT_all = np.concatenate([M.T for M in mats], axis=1)
    D_all = np.concatenate(mats, axis=0)
    return DT_all, D_all


def stiffness_apply_dense(u, geom, DT_all, D_all, dim: int):
    """MXU-dense SEM stiffness apply (same math as stiffness_apply).

    u: (E, npe); geom: (E, npe, nG); DT_all/D_all from
    dense_derivative_ops. Returns (E, npe).
    """
    E, npe = u.shape
    W = jnp.einsum("eq,qm->em", u, DT_all, precision=_PREC)
    W = W.reshape(E, dim, npe)          # W[:, a] = D_a u
    G = geom
    if dim == 2:
        Vr = G[..., 0] * W[:, 0] + G[..., 2] * W[:, 1]
        Vs = G[..., 2] * W[:, 0] + G[..., 1] * W[:, 1]
        V = jnp.stack([Vr, Vs], axis=1)
    else:
        Vr = (G[..., 0] * W[:, 0] + G[..., 3] * W[:, 1]
              + G[..., 4] * W[:, 2])
        Vs = (G[..., 3] * W[:, 0] + G[..., 1] * W[:, 1]
              + G[..., 5] * W[:, 2])
        Vt = (G[..., 4] * W[:, 0] + G[..., 5] * W[:, 1]
              + G[..., 2] * W[:, 2])
        V = jnp.stack([Vr, Vs, Vt], axis=1)
    return jnp.einsum("em,mq->eq", V.reshape(E, dim * npe), D_all,
                      precision=_PREC)


def _mxu_chunks(M: int, n: int, dtype) -> bool:
    """Use the 128-chunk block-diagonal contraction: a (batch, n) x (n, n)
    matmul with n = 8 pads K and N to the MXU's 128x128 tile (~256x
    utilization waste — measured 175 us per contraction at 2.1M points);
    grouping 128/n elements into one lane-aligned chunk and contracting
    with kron(I, D) executes 16x fewer padded flops at FULL utilization.
    Bitwise-identical (the zero blocks contribute exact zeros). TPU only:
    the extra structural flops are a loss on CPU."""
    if M % 128 != 0 or 128 % n != 0:
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def dmul(D, U, axis: int, n: int):
    """Per-element contraction of one lattice axis with a 1-D operator
    D (n_out, n): split (m*n) -> (m, n), contract in place, merge back.
    Handles n_out != n (order transfer). On TPU with 128-aligned axes the
    contraction runs in lane-aligned 128-chunks on the MXU (see
    _mxu_chunks); the generic path names the contraction axis directly in
    the einsum."""
    shape = U.shape
    n_out = D.shape[0]
    if _mxu_chunks(shape[axis], n, U.dtype):
        reps = 128 // n
        Dbig = jnp.kron(jnp.eye(reps, dtype=D.dtype), D)  # (reps*n_out, 128)
        m = shape[axis] // 128
        split = shape[:axis] + (m, 128) + shape[axis + 1:]
        V = U.reshape(split)
        letters = "zyxwvuts"[:V.ndim]
        k = letters[axis + 1]
        out = letters.replace(k, "a")
        V = jnp.einsum(f"a{k},{letters}->{out}", Dbig, V, precision=_PREC)
        return V.reshape(shape[:axis] + (m * reps * n_out,)
                         + shape[axis + 1:])
    m = shape[axis] // n
    split = shape[:axis] + (m, n) + shape[axis + 1:]
    V = U.reshape(split)
    letters = "zyxwvuts"[:V.ndim]
    k = letters[axis + 1]
    out = letters.replace(k, "a")
    V = jnp.einsum(f"a{k},{letters}->{out}", D, V, precision=_PREC)
    return V.reshape(shape[:axis] + (m * n_out,) + shape[axis + 1:])


_dmul = dmul   # internal alias (square-D callers)


import os as _os

_PALLAS_STIFFNESS = _os.environ.get("PRFDDP_PALLAS_STIFFNESS", "1") != "0"


def _pallas_lattice_consts(n: int, f32):
    """(Db, Dbt, D_np) for the fused Pallas apply: kron(I_{128/n}, D) as
    f32 jnp constants + the host f64 differentiation matrix (cached)."""
    import numpy as np
    from ..utils.gll import diff_matrix
    key = (n,)
    cache = _pallas_lattice_consts.__dict__.setdefault("cache", {})
    if key not in cache:
        D64 = np.asarray(diff_matrix(n))
        Db_np = np.kron(np.eye(128 // n), D64).astype(np.float32)
        cache[key] = (Db_np, Db_np.T.copy(), D64)
    Db_np, Dbt_np, D64 = cache[key]
    return jnp.asarray(Db_np, f32), jnp.asarray(Dbt_np, f32), D64


def stiffness_apply_lattice(U, G, D, dim: int):
    """SEM stiffness apply on point-lattice fields.

    U: (Mz, My, Mx) (or (My, Mx) in 2D); G: a TUPLE of nG per-factor
    lattices, each U.shape (measured fastest on TPU: a trailing factor
    axis makes XLA materialize a 3 GB transposed geometry copy at 64^3
    N=7, and a stacked (nG,)+lattice array runs ~20% slower than
    separate buffers — artifacts A/B 141/148/174 us); D: (n, n). Same
    math as stiffness_apply (domain.okl:5-98) in the lattice layout —
    avoids the element<->lattice transposes in the hot path.

    On TPU with 128-aligned lattices the whole apply runs as ONE fused
    Pallas kernel (ops/pallas_kernels.stiffness_lattice_3d): a single
    HBM pass over the 8 operand fields instead of XLA's materialized
    Dr/Ds/Dt/W intermediates (disable with PRFDDP_PALLAS_STIFFNESS=0).
    """
    n = D.shape[0]
    if (_PALLAS_STIFFNESS and dim == 3 and isinstance(G, (tuple, list))
            and len(G) == 6 and D.shape[0] == D.shape[1]):
        from .pallas_kernels import (stiffness_lattice_3d,
                                     stiffness_lattice_3d_supported)
        if stiffness_lattice_3d_supported(U.shape, n, U.dtype):
            Db, Dbt, D_np = _pallas_lattice_consts(n, jnp.float32)
            return stiffness_lattice_3d(U, tuple(G), Db, Dbt, n, D_np)
    Dt = D.T
    if dim == 2:
        Dr = _dmul(D, U, 1, n)
        Ds = _dmul(D, U, 0, n)
        Wr = G[0] * Dr + G[2] * Ds
        Ws = G[2] * Dr + G[1] * Ds
        return _dmul(Dt, Wr, 1, n) + _dmul(Dt, Ws, 0, n)
    if dim == 3:
        Dr = _dmul(D, U, 2, n)
        Ds = _dmul(D, U, 1, n)
        Dt_ = _dmul(D, U, 0, n)
        Wr = G[0] * Dr + G[3] * Ds + G[4] * Dt_
        Ws = G[3] * Dr + G[1] * Ds + G[5] * Dt_
        Wt = G[4] * Dr + G[5] * Ds + G[2] * Dt_
        return (_dmul(Dt, Wr, 2, n) + _dmul(Dt, Ws, 1, n)
                + _dmul(Dt, Wt, 0, n))
    raise ValueError(f"dim must be 2 or 3, got {dim}")


def stiffness_diagonal_lattice(G, D, dim: int):
    """Exact matrix-free operator diagonal in the point-lattice layout.

    G is a tuple of per-factor lattices (see stiffness_apply_lattice).
    Same closed form as stiffness_diagonal, expressed as block-diagonal
    contractions with D*D plus tiled-diagonal cross terms.
    """
    n = D.shape[0]
    D2t = (D * D).T
    d = jnp.diagonal(D)

    def tiled_diag(axis, shape):
        M = shape[axis]
        v = jnp.tile(d, M // n)
        s = [1] * len(shape)
        s[axis] = M
        return v.reshape(s)

    if dim == 2:
        shape = G[0].shape
        t_r = _dmul(D2t, G[0], 1, n)
        t_s = _dmul(D2t, G[1], 0, n)
        t_rs = 2.0 * tiled_diag(1, shape) * tiled_diag(0, shape) * G[2]
        return t_r + t_s + t_rs
    if dim == 3:
        shape = G[0].shape
        t_r = _dmul(D2t, G[0], 2, n)
        t_s = _dmul(D2t, G[1], 1, n)
        t_t = _dmul(D2t, G[2], 0, n)
        di = tiled_diag(2, shape)
        dj = tiled_diag(1, shape)
        dk = tiled_diag(0, shape)
        t_cross = 2.0 * (di * dj * G[3] + di * dk * G[4]
                         + dj * dk * G[5])
        return t_r + t_s + t_t + t_cross
    raise ValueError(f"dim must be 2 or 3, got {dim}")


def stiffness_diagonal(geom, D, dim: int):
    """Diagonal of the local SEM stiffness operator, closed form.

    Needed by the Jacobi preconditioner (reference capability: the CSR
    layer exposes ``diagonal`` extraction, csr_matrix.tpp:261-299; here the
    matrix-free diagonal is exact without assembling anything):

      diag[(i,j)] = sum_k D[k,i]^2 G_rr[(k,j)] + sum_k D[k,j]^2 G_ss[(i,k)]
                    + 2 D[i,i] D[j,j] G_rs[(i,j)]      (2D; 3D analogous)

    Returns (E, npe).
    """
    n = D.shape[0]
    E = geom.shape[0]
    D2 = D * D
    d = jnp.diagonal(D)

    if dim == 2:
        G = geom.reshape(E, n, n, 3)
        # term_r[(i,j)] = sum_k D2[k,i] G_rr[e,j,k] (storage (e, j, i))
        t_r = jnp.einsum("ki,ejk->eji", D2, G[..., 0])
        t_s = jnp.einsum("kj,eki->eji", D2, G[..., 1])
        t_rs = 2.0 * d[None, None, :] * d[None, :, None] * G[..., 2]
        return (t_r + t_s + t_rs).reshape(E, n * n)

    if dim == 3:
        G = geom.reshape(E, n, n, n, 6)
        t_r = jnp.einsum("pi,ekjp->ekji", D2, G[..., 0])
        t_s = jnp.einsum("pj,ekpi->ekji", D2, G[..., 1])
        t_t = jnp.einsum("pk,epji->ekji", D2, G[..., 2])
        di = d[None, None, None, :]
        dj = d[None, None, :, None]
        dk = d[None, :, None, None]
        t_cross = 2.0 * (di * dj * G[..., 3] + di * dk * G[..., 4]
                         + dj * dk * G[..., 5])
        return (t_r + t_s + t_t + t_cross).reshape(E, n ** 3)

    raise ValueError(f"dim must be 2 or 3, got {dim}")
