"""MXU-precision experiment for the fused stiffness kernel at the 64^3
headline lattice (512^3 points).

The kernel's dot_generals run on f32 operands with precision=HIGHEST,
which Mosaic lowers to 6 MXU passes — at 512^3 the apply is MXU-bound
(f32 550 GB/s, bf16 384 GB/s vs the 650 GB/s axpy roofline). Mosaic
rejects precision=HIGH, so emulate fewer passes manually with bf16
splitting (x = hi + lo, both bf16):

- f32 I/O ("split3"): U@D = U_hi@D_hi + U_hi@D_lo + U_lo@D_hi
  (classic bf16x3, ~f32-accurate, 3 passes) for all four contractions
  -> 12 passes/apply instead of 24.
- bf16 I/O ("split2"): U is exactly bf16, so U@D = U@D_hi + U@D_lo is
  EXACT to f32 accumulation (2 passes); the f32 W intermediates use
  split3 -> 10 passes/apply instead of 24, with no extra intermediate
  rounding (the bf16 preconditioner's quality hinges on that —
  BASELINE.md round-3 note).

Usage: python artifacts/bench_stiffness_precision.py [m]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops import pallas_kernels as pk
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.utils.gll import diff_matrix

import jax.experimental.pallas as pl
import jax.experimental.pallas.tpu as pltpu

f32 = jnp.float32
bf16 = jnp.bfloat16


def _split(x):
    hi = x.astype(bf16)
    lo = (x.astype(f32) - hi.astype(f32)).astype(bf16)
    return hi, lo


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)


def _mm_right_split(a, b_hi, b_lo, a_exact):
    """a @ b with b pre-split; a split too unless exactly bf16."""
    if a_exact:
        return _mm(a, b_hi) + _mm(a, b_lo)
    a_hi, a_lo = _split(a)
    return _mm(a_hi, b_hi) + _mm(a_hi, b_lo) + _mm(a_lo, b_hi)


def _mm_left_split(b_hi, b_lo, a, a_exact):
    """b @ a (contract b's cols with a's rows)."""
    if a_exact:
        return _mm(b_hi, a) + _mm(b_lo, a)
    a_hi, a_lo = _split(a)
    return _mm(b_hi, a_hi) + _mm(b_hi, a_lo) + _mm(b_lo, a_hi)


def _kernel_split(u_ref, g0, g1, g2, g3, g4, g5, db_ref, dbt_ref, out_ref,
                  *, n, D_np, exact_u):
    Db_hi, Db_lo = _split(db_ref[...])
    Dbt_hi, Dbt_lo = _split(dbt_ref[...])
    U = u_ref[...]
    Uz = [U[z] if exact_u else U[z].astype(f32) for z in range(n)]
    Uf = [U[z].astype(f32) for z in range(n)]

    Dr = [_mm_right_split(Uz[z], Dbt_hi, Dbt_lo, exact_u) for z in range(n)]
    Ds = [_mm_left_split(Db_hi, Db_lo, Uz[z], exact_u) for z in range(n)]
    Dt = [sum(float(D_np[z, k]) * Uf[k] for k in range(n)) for z in range(n)]

    Gs = [g[...].astype(f32) for g in (g0, g1, g2, g3, g4, g5)]
    G0, G1, G2, G3, G4, G5 = Gs
    Au, Wt = [], []
    for z in range(n):
        wr = G0[z] * Dr[z] + G3[z] * Ds[z] + G4[z] * Dt[z]
        ws = G3[z] * Dr[z] + G1[z] * Ds[z] + G5[z] * Dt[z]
        Wt.append(G4[z] * Dr[z] + G5[z] * Ds[z] + G2[z] * Dt[z])
        Au.append(_mm_right_split(wr, Db_hi, Db_lo, False)
                  + _mm_left_split(Dbt_hi, Dbt_lo, ws, False))
    for z in range(n):
        Au[z] = Au[z] + sum(float(D_np[k, z]) * Wt[k] for k in range(n))
    out_ref[...] = jnp.stack(Au, axis=0).astype(out_ref.dtype)


def apply_split(U, G, Db, Dbt, n, D_np):
    mz, my, mx = U.shape
    grid = (mz // n, my // 128, mx // 128)
    z0 = np.int32(0)
    fidx = lambda c, j, i: (c.astype(np.int32), j.astype(np.int32),
                            i.astype(np.int32))
    didx = lambda c, j, i: (z0, z0)
    blk = pl.BlockSpec((n, 128, 128), fidx, memory_space=pltpu.VMEM)
    dblk = pl.BlockSpec((128, 128), didx, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel_split, n=n, D_np=np.asarray(D_np),
                exact_u=(U.dtype == bf16)),
        out_shape=jax.ShapeDtypeStruct(U.shape, U.dtype),
        grid=grid,
        in_specs=[blk] * 7 + [dblk, dblk],
        out_specs=blk,
    )(U, *G, Db, Dbt)


def timed_chain(fn, U, G, iters=8):
    def make(nit):
        def f(u, *g):
            out = jax.lax.fori_loop(0, nit, lambda i, w: fn(w, g), u)
            return out.ravel()[0].astype(jnp.float32)
        return f
    f1, f2 = jax.jit(make(iters)), jax.jit(make(2 * iters))
    float(f1(U, *G)); float(f2(U, *G))
    b1 = b2 = float("inf")
    for _ in range(3):
        t0 = time.time(); float(f1(U, *G)); b1 = min(b1, time.time() - t0)
        t0 = time.time(); float(f2(U, *G)); b2 = min(b2, time.time() - t0)
    return (b2 - b1) / iters


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = 8
    shape = (m, m, m)
    D64 = np.asarray(diff_matrix(n))
    Db_np = np.kron(np.eye(128 // n), D64).astype(np.float32)
    key = jax.random.PRNGKey(0)

    for dt in (jnp.bfloat16, jnp.float32):
        U = jax.random.normal(key, shape, jnp.float32).astype(dt)
        G = tuple(jax.random.normal(jax.random.fold_in(key, i), shape,
                                    jnp.float32).astype(dt)
                  for i in range(6))
        Db = jnp.asarray(Db_np)
        Dbt = jnp.asarray(Db_np.T.copy())
        npts = U.size
        bs = jnp.dtype(dt).itemsize

        base = lambda u, g: pk.stiffness_lattice_3d(u, g, Db, Dbt, n, D64)
        spl = lambda u, g: apply_split(u, g, Db, Dbt, n, D64)
        label = "split2(2p+3p)" if dt == bf16 else "split3(3p)"
        ref = None
        for name, fn in [("HIGHEST(6p)", base), (label, spl)]:
            out = fn(U, G)
            if ref is None:
                ref = out.astype(jnp.float32)
                rel = 0.0
            else:
                d = out.astype(jnp.float32) - ref
                rel = float(jnp.max(jnp.abs(d)) / jnp.max(jnp.abs(ref)))
            dt_s = timed_chain(fn, U, G)
            gbs = npts * bs * 8 / dt_s / 1e9
            print(f"{np.dtype(dt).name} {shape} {name}: "
                  f"{dt_s*1e3:.2f} ms  {gbs:.0f} GB/s  rel_err={rel:.2e}",
                  flush=True)
        del U, G


if __name__ == "__main__":
    main()
