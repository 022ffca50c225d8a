"""Krylov solvers: flexible CG and restarted flexible GMRES.

TPU-native rebuild of the reference's outer solvers
(/root/reference/domain.tpp:613-725 flexible_conjugate_gradient,
domain.tpp:727-914 generalized_minimum_residual). Differences by design:

- The whole iteration runs inside ``jax.lax.while_loop`` under one jit, so
  XLA executes the solve as a single device program (the reference gets a
  weaker form of this only for V-cycle legs via CUDA graphs,
  subdomain.tpp:3644-3704).
- Fields are PYTREES of arrays in their natural device shapes (a 3-D
  lattice for structured domains, a list of per-group lattices for the
  composite problem). Nothing is ever flattened or concatenated: on TPU a
  reshape between a 1-D vector and a tiled 3-D lattice materializes a
  layout copy at far below HBM bandwidth (measured 800 us per apply at
  2.1M points — it dominated the round-1 solve).
- Gram-Schmidt projections use stacked-basis contractions on the MXU plus
  a single fused psum instead of j+1 separate kernel+Allreduce round
  trips (domain.tpp:810-822).
- The reference's assembled inner product dssum's the *basis* vector per
  projection (domain.tpp:938); we dssum the new vector once and use
  mask-commutes-with-QQt symmetry (M Q = Q M_n => <q, M QQt v> ==
  <M QQt q, v>), cutting exchanges per Arnoldi step from j+1 to 1.

The solvers are generic over closures:
  operator(u)       -> local (non-assembled) A u       [no comm]
  precond(r)        -> z, continuous (already stitched) [may comm]
  dssum_plain(r)    -> QQt r with Dirichlet mask        [comm]
  dot(u, v)         -> global plain point-space dot     [psum]
  dot2(a,b,c,d)     -> (dot(a,b), dot(c,d)) fused       [one psum]
where u/v/r are field pytrees. ``dot`` must also accept a STACKED first
argument (every leaf carrying one extra leading axis) and then return a
vector over that axis — Domain._ops and the composite ops provide this.

Residual norm = sqrt(<r, QQt r>_masked), the reference's convergence
metric (domain.tpp:916-931).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["KrylovResult", "fcg", "fgmres", "tree_dot"]

_HI = jax.lax.Precision.HIGHEST
_tmap = jax.tree.map


def tree_dot(a, b, axis_name=None):
    """Global inner product over field pytrees. The first argument may be
    stacked (extra leading axes per leaf); returns the stacked shape.
    One fused psum over all leaves."""
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    acc = None
    for xa, xb in zip(la, lb):
        k = xb.ndim
        axes = (tuple(range(xa.ndim - k, xa.ndim)), tuple(range(k)))
        d = jnp.tensordot(xa, xb, axes=axes, precision=_HI)
        acc = d if acc is None else acc + d
    if axis_name is not None:
        acc = jax.lax.psum(acc, axis_name)
    return acc


def _axpy(a, x, y):
    """a*x + y over pytrees (a scalar)."""
    return _tmap(lambda xl, yl: a * xl + yl, x, y)


def _scale(a, x):
    return _tmap(lambda xl: a * xl, x)


def _add(x, y):
    return _tmap(jnp.add, x, y)


def _sub(x, y):
    return _tmap(jnp.subtract, x, y)


def _zeros_like_tree(x):
    # elementwise, keeps shard-varying vma types under shard_map
    # (zeros_like may not)
    return _tmap(lambda xl: xl * 0.0, x)


def _stack_rows(zero, m):
    """Stacked basis with FLAT rows: (m, size) per leaf. Element-layout
    composite fields have tiny minor dims ((E, n, n, n), n=8) that TPU
    tiling pads to 128 — a 16x physical blowup on every stacked-basis
    temp XLA materializes around the prefix-switch branches (observed:
    an 819 MB temp for a 51 MB field at PB_146). 1-D rows tile clean;
    rows reshape back to the field shape only at the precond/output
    boundary (_reshape_like)."""
    return _tmap(lambda zl: jnp.repeat(zl.reshape(-1)[None], m, axis=0),
                 zero)


def _row(V, j):
    return _tmap(lambda Vl: Vl[j], V)


def _set_row(V, j, x):
    return _tmap(lambda Vl, xl: Vl.at[j].set(xl.reshape(-1)), V, x)


def _flat(x):
    return _tmap(lambda xl: xl.reshape(-1), x)


def _reshape_like(x, like):
    return _tmap(lambda xl, ll: xl.reshape(ll.shape), x, like)


def _contract_rows(h, V):
    """sum_i h[i] * V[i] over a stacked pytree."""
    return _tmap(lambda Vl: jnp.tensordot(h, Vl, axes=(0, 0),
                                          precision=_HI), V)


_CHUNK = 4   # basis-prefix granularity for the masked-growth contractions


def _prefix_dot(dot, V, qq, j, L):
    """<qq, V[i]> for the first j+1 rows of an L-row stacked basis,
    reading only ceil((j+1)/4)*4 rows (lax.switch picks ONE static
    prefix branch — early Arnoldi steps stop paying for the full
    (m+1, N) contraction). Returns (L,) with rows > j zeroed."""
    nb = -(-L // _CHUNK)

    def mk(k):
        rows = min((k + 1) * _CHUNK, L)

        def f(_):
            h = dot(_tmap(lambda Vl: Vl[:rows], V), qq)
            return jnp.concatenate(
                [h, jnp.zeros((L - rows,), h.dtype)])
        return f

    k = jnp.clip(j // _CHUNK, 0, nb - 1)
    return jax.lax.switch(k, [mk(i) for i in range(nb)], None)


def _prefix_contract(h, V, j, L):
    """sum_{i<=j} h[i] * V[i], reading only the needed basis prefix
    (h must be zero beyond row j)."""
    nb = -(-L // _CHUNK)

    def mk(k):
        rows = min((k + 1) * _CHUNK, L)

        def f(_):
            return _contract_rows(h[:rows],
                                  _tmap(lambda Vl: Vl[:rows], V))
        return f

    k = jnp.clip(j // _CHUNK, 0, nb - 1)
    return jax.lax.switch(k, [mk(i) for i in range(nb)], None)


@jax.tree_util.register_dataclass
@dataclass
class KrylovResult:
    u: jax.Array                 # field pytree
    iterations: jax.Array        # int32, number of operator applications
    residual_history: jax.Array  # (max_iterations + 1,), padded with NaN
    r0_norm: jax.Array
    converged: jax.Array


def _res_norm(r, dssum_plain, dot):
    # clamp: <r, QQt r> >= 0 exactly, but roundoff can drive a tiny result
    # negative once the residual reaches machine precision (breakdown guard)
    return jnp.sqrt(jnp.maximum(dot(r, dssum_plain(r)), 0.0))


def fcg(operator, precond, dssum_plain, dot, dot2, f, *,
        max_iterations: int, tolerance: float, use_relative: bool = True,
        op_dssum=None):
    """Flexible (Notay) preconditioned CG, mirroring domain.tpp:613-725.

    op_dssum: optional fused p -> (A p, QQt A p) closure (the boundary-
    first overlapped operator, Domain._ops). With it, the residual norm
    uses the linear identity QQt r_{k+1} = QQt r_k - alpha QQt q — the
    assembled residual is CARRIED and updated from the fused exchange
    instead of re-assembled, removing one full dssum pass per iteration
    AND overlapping the remaining exchange with the operator interior.
    The recurrence drifts from the re-assembled norm only by roundoff
    (same class as CG's standard residual recurrence); tests pin the
    histories to tight tolerance.
    """
    dtype = jax.tree.leaves(f)[0].dtype
    u0 = _zeros_like_tree(f)
    r0 = f
    ra0 = dssum_plain(r0)
    r0_norm = jnp.sqrt(jnp.maximum(dot(r0, ra0), 0.0))
    z0 = precond(r0)
    p0 = z0

    # vma seed: when dot is rank-local (the composite inner solve under
    # shard_map) every scalar in the iteration is shard-varying; the
    # while_loop carry types must match from iteration 0 (see fgmres)
    seed = r0_norm * 0.0
    hist0 = jnp.full((max_iterations + 1,), jnp.nan, dtype=dtype) + seed
    hist0 = hist0.at[0].set(r0_norm)

    tol = jnp.asarray(tolerance, dtype=dtype)
    target = tol * r0_norm if use_relative else tol

    def cond(state):
        _, _, _, _, _, _, it, done, _ = state
        return jnp.logical_and(it < max_iterations, jnp.logical_not(done))

    def body(state):
        u, r, ra, z, p, gamma_prev, it, done, hist = state
        if op_dssum is None:
            q = operator(p)
        else:
            q, qq = op_dssum(p)
        gamma, theta = dot2(z, r, p, q)
        # breakdown guards: an exactly-solved system (common for the
        # fixed-iteration coarse solves) gives gamma = theta = 0; alpha
        # and beta must come out 0, not NaN
        alpha = gamma / jnp.where(theta != 0.0, theta, 1.0)
        u = _axpy(alpha, p, u)
        r_new = _axpy(-alpha, q, r)
        if op_dssum is None:
            ra_new = dssum_plain(r_new)
        else:
            ra_new = _axpy(-alpha, qq, ra)
        rn = jnp.sqrt(jnp.maximum(dot(r_new, ra_new), 0.0))
        hist = hist.at[it + 1].set(rn)
        now_done = jnp.logical_or(rn < target, jnp.isnan(rn))
        # flexible update (domain.tpp:697-721): z = M r_new,
        # beta = <r_new - r, z> / gamma (Notay)
        z_new = precond(r_new)
        theta2 = dot(_sub(r_new, r), z_new)
        beta = theta2 / jnp.where(gamma != 0.0, gamma, 1.0)
        p_new = _axpy(beta, p, z_new)
        # freeze state if converged this step (values unused afterwards)
        return (u, r_new, ra_new, z_new, p_new, gamma, it + 1, now_done,
                hist)

    state = (u0, r0, ra0, z0, p0, jnp.asarray(1.0, dtype) + seed,
             jnp.asarray(0, jnp.int32), r0_norm < target, hist0)
    u, r, _, _, _, _, it, done, hist = jax.lax.while_loop(cond, body, state)
    last = hist[it]
    converged = jnp.logical_and(last < target,
                                jnp.logical_not(jnp.isnan(last)))
    return KrylovResult(u=u, iterations=it, residual_history=hist,
                        r0_norm=r0_norm, converged=converged)


def fgmres(operator, precond, dssum_plain, dot, f, *,
           max_iterations: int, num_vectors: int = 20,
           tolerance: float, use_relative: bool = True, op_dssum=None,
           z_dtype=None):
    """Restarted flexible GMRES(m), mirroring domain.tpp:727-914.

    Basis vectors are stored stacked per pytree leaf (m+1, ...) so
    projections and updates are single MXU contractions. Givens rotations
    / the triangular solve run as masked fixed-length loops on scalars.

    op_dssum: optional fused z -> (A z, QQt A z) closure that overlaps the
    boundary exchange with the interior operator compute (Domain._ops);
    must be numerically identical to operator + dssum_plain.

    z_dtype: storage dtype for the flexible Z basis (default: the field
    dtype). With bf16 the preconditioner output is QUANTIZED to z_dtype
    BEFORE the operator sees it, so the Arnoldi relation stays exactly
    consistent with the stored basis — this is a slightly-rounded
    preconditioner (which flexible GMRES tolerates by construction), not
    a rounded solution update. Halves the dominant memory term of large
    single-chip runs: at Kershaw 64^3 N=7 (134M points) the Z basis is
    what forces the outer solver down to FCG without it.
    """
    m = num_vectors
    dtype = jax.tree.leaves(f)[0].dtype

    u0 = _zeros_like_tree(f)
    r0_norm = _res_norm(f, dssum_plain, dot)
    tol = jnp.asarray(tolerance, dtype=dtype)
    target = tol * r0_norm if use_relative else tol

    # vma seed: 0 with the same shard-varying type as the dot products.
    # When dot psums (outer solve) scalars stay replicated; when dot is
    # rank-local (the composite inner solve under shard_map) every scalar
    # in the iteration becomes shard-varying, as it must.
    seed = r0_norm * 0.0
    seed_i = seed.astype(jnp.int32)

    hist0 = jnp.full((max_iterations + 1,), jnp.nan, dtype=dtype) + seed
    hist0 = hist0.at[0].set(r0_norm)

    # masked-growth contractions: with a longer restart length most
    # Arnoldi steps use a short basis prefix — reading all m+1 rows
    # every step is O(m N) wasted HBM traffic. Chunked lax.switch
    # prefixes fix that; at tiny m the switch overhead isn't worth it.
    grow = m >= 8

    def proj_dots(V, qq, j):
        """H[i] = <q, QQt V[i]>_masked for i <= j, one stacked contraction
        + one psum (over the smallest 4-row-aligned basis prefix).

        qq is the dssum'ed new vector; by mask/QQt symmetry this equals the
        reference's assembled_inner_product(q, V[i]) (domain.tpp:934-947).
        """
        qf = _flat(qq)     # flat rows: match the stacked-basis layout
        h = (_prefix_dot(dot, V, qf, j, m + 1) if grow
             else dot(V, qf))  # stacked first arg: (m+1,)
        iota = jnp.arange(m + 1)
        return jnp.where(iota <= j, h, 0.0).astype(dtype)

    def restart_cycle(carry):
        u, it, done, hist, last_rnorm = carry

        # residual at restart (domain.tpp:758-779)
        def fresh():
            r = _sub(f, operator(u))
            return r, _res_norm(r, dssum_plain, dot)

        def first():
            return f, r0_norm

        r, g0 = jax.lax.cond(it > 0, fresh, first)

        # build bases from r (not fresh zeros) so they inherit r's
        # shard-varying type under shard_map (vma tracking)
        zero_row = _zeros_like_tree(r)
        g0_safe = jnp.where(g0 > 0.0, g0, 1.0)  # exact-convergence breakdown
        V = _set_row(_stack_rows(zero_row, m + 1), 0, _scale(1.0 / g0_safe, r))
        zero_row_z = (zero_row if z_dtype is None else
                      _tmap(lambda zl: zl.astype(z_dtype), zero_row))
        Z = _stack_rows(zero_row_z, m)
        H = jnp.zeros((m + 1, m), dtype=dtype) + seed
        gam = (jnp.zeros((m + 1,), dtype=dtype) + seed).at[0].set(g0)
        c = jnp.zeros((m,), dtype=dtype) + seed
        s = jnp.zeros((m,), dtype=dtype) + seed

        def arnoldi(j, inner):
            V, Z, H, gam, c, s, jdone, jcount, it, hist, last_rnorm = inner

            def step(args):
                V, Z, H, gam, c, s, it, hist = args
                z = precond(_reshape_like(_row(V, j), f))
                if z_dtype is not None:
                    # quantize BEFORE the operator: the stored basis and
                    # the Arnoldi relation stay exactly consistent
                    zq = _tmap(lambda zl: zl.astype(z_dtype), z)
                    z = _tmap(lambda zl: zl.astype(dtype), zq)
                if op_dssum is None:
                    q = operator(z)
                    qq = dssum_plain(q)
                else:
                    q, qq = op_dssum(z)
                Z_new = _set_row(Z, j, z if z_dtype is None else zq)
                h = proj_dots(V, qq, j)
                q = _sub(q, _reshape_like(
                    _prefix_contract(h, V, j, m + 1) if grow
                    else _contract_rows(h, V), q))
                # recompute the projected norm on the orthogonalized q
                # (clamped: roundoff-negative once q hits machine zero).
                # NOTE: the Gram-Schmidt identity |q'|^2 = |q|^2 - |h|^2
                # would save this dssum but measurably degrades long
                # unpreconditioned recurrences (history parity vs scipy
                # fails); the recompute matches the reference's 2-pass
                # Gram-Schmidt robustness (domain.tpp:810-822)
                alpha = jnp.sqrt(jnp.maximum(dot(q, dssum_plain(q)), 0.0))

                # apply accumulated Givens rotations to the new column
                def rot(i, hcol):
                    hi, hi1 = hcol[i], hcol[i + 1]
                    active = i < j
                    new_i = jnp.where(active, c[i] * hi + s[i] * hi1, hi)
                    new_i1 = jnp.where(active, -s[i] * hi + c[i] * hi1, hi1)
                    return hcol.at[i].set(new_i).at[i + 1].set(new_i1)

                hcol = jax.lax.fori_loop(0, m, rot, h)

                beta = jnp.sqrt(hcol[j] ** 2 + alpha ** 2)
                beta_safe = jnp.where(beta > 0.0, beta, 1.0)  # breakdown
                cj = hcol[j] / beta_safe
                sj = alpha / beta_safe
                hcol = hcol.at[j].set(beta)
                gam_new = gam.at[j + 1].set(-sj * gam[j]).at[j].set(cj * gam[j])
                rnorm = jnp.abs(gam_new[j + 1])

                H_new = H.at[:, j].set(hcol)
                alpha_safe = jnp.where(alpha > 0.0, alpha, 1.0)
                V_new = _set_row(V, j + 1, _scale(1.0 / alpha_safe, q))
                hist = hist.at[it + 1].set(rnorm)
                stop = jnp.logical_or(rnorm < target, jnp.isnan(rnorm))
                stop = jnp.logical_or(stop, alpha == 0.0)
                return (V_new, Z_new, H_new, gam_new, c.at[j].set(cj),
                        s.at[j].set(sj), stop, it + 1, hist, rnorm)

            def skip(args):
                V, Z, H, gam, c, s, it, hist = args
                return (V, Z, H, gam, c, s, jnp.logical_or(jdone, True),
                        it, hist, last_rnorm)

            active = jnp.logical_and(jnp.logical_not(jdone),
                                     it < max_iterations)
            (V, Z, H, gam, c, s, stop, it, hist, rnorm) = jax.lax.cond(
                active, step, skip, (V, Z, H, gam, c, s, it, hist))
            jcount = jnp.where(active, j, jcount)
            jdone = jnp.logical_or(jdone, stop)
            return (V, Z, H, gam, c, s, jdone, jcount, it, hist, rnorm)

        inner0 = (V, Z, H, gam, c, s, done, seed_i,
                  it, hist, last_rnorm)
        (V, Z, H, gam, c, s, jdone, jlast, it, hist, last_rnorm) = (
            jax.lax.fori_loop(0, m, arnoldi, inner0))

        # masked back-substitution over columns 0..jlast (domain.tpp:891-899)
        def back(kk, y):
            k = jlast - kk
            def active_fn(y):
                contrib = jnp.where(
                    (jnp.arange(m) > k) & (jnp.arange(m) <= jlast),
                    H[k, :] * y, 0.0).sum()
                hkk = jnp.where(H[k, k] != 0.0, H[k, k], 1.0)  # breakdown
                return y.at[k].set((gam[k] - contrib) / hkk)
            return jax.lax.cond(kk <= jlast, active_fn, lambda y: y, y)

        y = jax.lax.fori_loop(0, m, back, jnp.zeros((m,), dtype=dtype) + seed)
        u = _add(u, _reshape_like(
            _prefix_contract(y, Z, jlast, m) if grow
            else _contract_rows(y, Z), u))

        # 'jdone' covers tolerance/NaN/basis-full; only tolerance/NaN end
        # the outer loop (basis-full just restarts)
        hit_tol = jnp.logical_or(last_rnorm < target, jnp.isnan(last_rnorm))
        return (u, it, jnp.logical_or(hit_tol, it >= max_iterations), hist,
                last_rnorm)

    def cond(carry):
        _, it, done, _, _ = carry
        return jnp.logical_not(done)

    carry0 = (u0, seed_i, r0_norm < target, hist0, r0_norm)
    u, it, done, hist, last = jax.lax.while_loop(cond, restart_cycle, carry0)
    return KrylovResult(u=u, iterations=it, residual_history=hist,
                        r0_norm=r0_norm,
                        converged=jnp.logical_and(last < target,
                                                  jnp.logical_not(jnp.isnan(last))))
