"""Pallas TPU kernels for the bandwidth-critical hot ops.

The profiled hot kernel of the preconditioned solve is the lattice face
summation (ops/gather_scatter.lattice_face_sum): the XLA form needs two
materialized rolls + two masked adds per dimension (~9 full passes over
the field), and it runs ~30 times per outer iteration inside the composite
preconditioner. This kernel fuses all three dimensions into ONE pass over
HBM: z-chunked grid, per-chunk VMEM compute with in-register lane rolls,
single-plane halo blocks for the z neighbors.

Equivalent of the reference's gather-scatter assembly step
(/root/reference/domain.tpp:583-600), specialized to the structured
lattice layout the TPU framework uses natively.

Boundary-mask logic matches gather_scatter._roll_masks exactly:
  hi[X] = 1 iff X % n == n-1 and X != M-1   (receives from X+1)
  lo[X] = 1 iff X % n == 0   and X != 0     (receives from X-1)
computed in-kernel from iota — no mask operands.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lattice_face_sum_3d", "stiffness_lattice_3d",
           "stiffness_lattice_3d_supported"]


def _masks_1d(M: int, n: int, gstart, length, axis_dim, shape, dtype):
    """hi/lo masks along one axis as broadcastable arrays, built from a
    global iota (gstart + local index). Constants are explicit int32:
    weak-typed Python ints recurse in the Pallas tracer under x64."""
    i32 = jnp.int32
    idx = jax.lax.broadcasted_iota(i32, shape, axis_dim) \
        + jnp.asarray(gstart, i32)
    hi = ((idx % i32(n) == i32(n - 1)) & (idx != i32(M - 1))).astype(dtype)
    lo = ((idx % i32(n) == i32(0)) & (idx != i32(0))).astype(dtype)
    return hi, lo


def _face_sum_kernel(u_ref, prev_ref, next_ref, *rest, n, mz, cz,
                     has_mask=False, has_weight=False):
    # rest = [weight_ref][mask_ref] out_ref — optional fused pointwise
    # multiplies after the summation (the dssum mask/inv-degree factors:
    # a separate XLA multiply costs another full read+write pass over
    # the field, ~40% of the dssum time at 512^2 planes)
    rest = list(rest)
    out_ref = rest.pop()
    mask_ref = rest.pop() if has_mask else None
    weight_ref = rest.pop() if has_weight else None
    c = pl.program_id(0)
    # compute in f32: Mosaic's vector rotate is 32-bit only, and the
    # accumulation is more accurate; HBM traffic stays in the I/O dtype
    dtype = jnp.float32
    U = u_ref[...].astype(dtype)     # (CZ, My, Mx)
    Pv = prev_ref[...].astype(dtype)  # plane c*CZ - 1 (clamped)
    Nx = next_ref[...].astype(dtype)  # plane (c+1)*CZ (clamped)
    _, my, mx = U.shape

    def xy_sum(V):
        # pltpu.roll requires non-negative shifts: roll(-1) == roll(M-1);
        # shifts must be explicit int32 (tpu.dynamic_rotate rejects the
        # i64 literals x64 mode would produce)
        i32 = jnp.int32
        hix, lox = _masks_1d(mx, n, 0, mx, 2, V.shape, dtype)
        V = (V + hix * pltpu.roll(V, i32(mx - 1), 2)
             + lox * pltpu.roll(V, i32(1), 2))
        hiy, loy = _masks_1d(my, n, 0, my, 1, V.shape, dtype)
        V = (V + hiy * pltpu.roll(V, i32(my - 1), 1)
             + loy * pltpu.roll(V, i32(1), 1))
        return V

    W = xy_sum(U)
    Wp = xy_sum(Pv)
    Wn = xy_sum(Nx)

    # z face sum using chunk-internal shifts + the halo planes
    # (single-plane chunks have no internal shift — Mosaic rejects the
    # empty-vector concatenate a W[1:] slice would produce)
    if cz > 1:
        W_up = jnp.concatenate([W[1:], Wn], axis=0)   # value at z+1
        W_dn = jnp.concatenate([Wp, W[:-1]], axis=0)  # value at z-1
    else:
        W_up, W_dn = Wn, Wp
    gz = c * cz
    hiz, loz = _masks_1d(mz, n, gz, cz, 0, W.shape, dtype)
    R = W + hiz * W_up + loz * W_dn
    if has_weight:
        R = R * weight_ref[...].astype(dtype)
    if has_mask:
        R = R * mask_ref[...].astype(dtype)
    out_ref[...] = R.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("n",))
def lattice_face_sum_3d(U, n: int, mask=None, weight=None):
    """One-pass fused face summation on a 3-D lattice (Mz, My, Mx).

    mask / weight: optional same-shape factors multiplied into the
    result IN the kernel (dssum's Dirichlet mask and inverse-degree
    weight) — each saves a full separate read+write pass over the field
    (~40% of the assembled-dssum time at 512^2 planes). Multiplication
    happens in f32 before the output cast, which is exact for the 0/1
    mask and matches the XLA path's f32 arithmetic for f32 fields."""
    mz, my, mx = U.shape
    # z chunk: largest divisor of mz not exceeding the VMEM budget.
    # Scoped VMEM is 16 MB and the kernel holds ~10 chunk-sized f32
    # buffers (in/out double-buffered + W/W_up/W_dn intermediates), so
    # the chunk must stay under ~1.6 MB: at 512^2 xy-planes (the 64^3
    # N=7 lattice) that means single-plane chunks.
    budget = max(1, (1600 * 1024) // max(my * mx * 4, 1))
    cz = 1
    for d in range(1, mz + 1):
        if mz % d == 0 and d <= budget:
            cz = d
    grid = (mz // cz,)

    # index maps must return int32 everywhere, including the constant
    # components (x64 mode weak-promotes Python ints and arithmetic to
    # i64, which Mosaic rejects at func.return)
    z0 = np.int32(0)   # numpy scalar: index maps may not capture tracers

    def main_idx(c):
        return (c.astype(np.int32), z0, z0)

    def prev_idx(c):
        return (jnp.maximum(c * cz - 1, 0).astype(np.int32), z0, z0)

    def next_idx(c):
        return (jnp.minimum((c + 1) * cz, mz - 1).astype(np.int32), z0, z0)

    main_blk = pl.BlockSpec((cz, my, mx), main_idx,
                            memory_space=pltpu.VMEM)
    in_specs = [
        main_blk,
        pl.BlockSpec((1, my, mx), prev_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, my, mx), next_idx, memory_space=pltpu.VMEM),
    ]
    operands = [U, U, U]
    if weight is not None:
        in_specs.append(main_blk)
        operands.append(weight)
    if mask is not None:
        in_specs.append(main_blk)
        operands.append(mask)
    return pl.pallas_call(
        partial(_face_sum_kernel, n=n, mz=mz, cz=cz,
                has_mask=mask is not None, has_weight=weight is not None),
        out_shape=jax.ShapeDtypeStruct(U.shape, U.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=main_blk,
    )(*operands)


# ---------------------------------------------------------------------------
# Fused SEM stiffness apply (the hot kernel, domain.okl:5-98 equivalent)
# ---------------------------------------------------------------------------
#
# The XLA lattice apply (ops/sem.stiffness_apply_lattice) is 6 separate
# MXU contractions with elementwise combines between them; XLA fuses the
# elementwise work into the matmuls but still materializes the Dr/Ds/Dt
# and Wr/Ws/Wt intermediates in HBM — measured 70-73% of the memory
# roofline at 2.1M points. This kernel performs the WHOLE apply per
# (n, 128, 128) block inside VMEM: the only HBM traffic is the 8 operand
# fields in and Au out (u + 6 geometric factors + result = the
# information-theoretic minimum of 32 B/point in f32).
#
# Blocks are element-aligned (n | 128 and the z-block equals one element
# layer), so every derivative contraction is block-local: the r/s
# contractions multiply by kron(I_{128/n}, D) exactly like ops/sem.dmul
# (bitwise-equal zero structure), and the t contraction unrolls over the
# n in-block z-planes with scalar D weights baked in at trace time.


def _bf16_split(x):
    """x (f32) as a bf16 (hi, lo) pair with x ~= hi + lo."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _stiffness_kernel(u_ref, g0, g1, g2, g3, g4, g5, db_ref, dbt_ref,
                      out_ref, *, n, D_np):
    f32 = jnp.float32
    bf16_io = u_ref.dtype == jnp.bfloat16
    Db = db_ref[...]                          # kron(I, D)   (128, 128)
    Dbt = dbt_ref[...]                        # Db.T         (128, 128)
    hi = jax.lax.Precision.HIGHEST
    dims = (((1,), (0,)), ((), ()))

    if bf16_io:
        # MXU-bound regime (measured 5.3 -> 4.1 ms at 512^3): Mosaic
        # lowers f32xf32 HIGHEST dots to 6 bf16 MXU passes. The inputs
        # are exactly bf16 here, so U @ D = U @ D_hi + U @ D_lo is
        # EXACT to f32 accumulation in 2 passes (D split once per
        # block); the f32 W intermediates use the bf16x3 split (lo x lo
        # term ~2^-16, far below the bf16 output rounding) — NO extra
        # intermediate rounding, which the bf16 preconditioner's
        # quality depends on (BASELINE.md round-3 note).
        Db_hi, Db_lo = _bf16_split(Db)
        Dbt_hi, Dbt_lo = _bf16_split(Dbt)

        def dg(a, b):
            return jax.lax.dot_general(a, b, dims,
                                       preferred_element_type=f32)

        def mmA(w):                           # f32 w @ Db   (bf16x3)
            w_hi, w_lo = _bf16_split(w)
            return dg(w_hi, Db_hi) + dg(w_hi, Db_lo) + dg(w_lo, Db_hi)

        def mmB(w):                           # Dbt @ f32 w  (bf16x3)
            w_hi, w_lo = _bf16_split(w)
            return dg(Dbt_hi, w_hi) + dg(Dbt_lo, w_hi) + dg(Dbt_hi, w_lo)

        Ub = u_ref[...]                       # (n, 128, 128) bf16
        U = Ub.astype(f32)
        # exactly-bf16 inputs: 2-pass exact contractions
        Dr = [dg(Ub[z], Dbt_hi) + dg(Ub[z], Dbt_lo) for z in range(n)]
        Ds = [dg(Db_hi, Ub[z]) + dg(Db_lo, Ub[z]) for z in range(n)]
    else:
        U = u_ref[...].astype(f32)            # (n, 128, 128)

        def mm(a, b):
            return jax.lax.dot_general(a, b, dims, precision=hi,
                                       preferred_element_type=f32)

        def mmA(w):
            return mm(w, Db)

        def mmB(w):
            return mm(Dbt, w)

        # per-z-slice r/s derivatives (x = lane axis, y = sublane axis)
        Dr = [mm(U[z], Dbt) for z in range(n)]    # U_z @ Db.T
        Ds = [mm(Db, U[z]) for z in range(n)]     # Db @ U_z
    # t derivative: unrolled scalar-weighted sums over in-block planes
    Dt = [sum(float(D_np[z, k]) * U[k] for k in range(n)) for z in range(n)]

    G0 = g0[...].astype(f32)
    G1 = g1[...].astype(f32)
    G2 = g2[...].astype(f32)
    G3 = g3[...].astype(f32)
    G4 = g4[...].astype(f32)
    G5 = g5[...].astype(f32)

    Au = []
    Wt = []
    for z in range(n):
        wr = G0[z] * Dr[z] + G3[z] * Ds[z] + G4[z] * Dt[z]
        ws = G3[z] * Dr[z] + G1[z] * Ds[z] + G5[z] * Dt[z]
        Wt.append(G4[z] * Dr[z] + G5[z] * Ds[z] + G2[z] * Dt[z])
        # transposed r/s contractions: sum_k Db[k, i] W[..., k] etc.
        Au.append(mmA(wr) + mmB(ws))
    for z in range(n):
        Au[z] = Au[z] + sum(float(D_np[k, z]) * Wt[k] for k in range(n))

    out_ref[...] = jnp.stack(Au, axis=0).astype(out_ref.dtype)


def stiffness_lattice_3d_supported(shape, n: int, dtype) -> bool:
    """The fused kernel covers the production regime: 3-D lattices with
    128-aligned y/x extents, n | 128, f32/bf16. Everything else uses the
    XLA path (ops/sem.stiffness_apply_lattice).

    Measured (1x v5e, artifacts/bench_pallas_stiffness.py): f32 878 vs
    408 GB/s at 128^3 and 530 vs 90 at (128,512,512) — the XLA einsum
    path collapses at wide planes, which dominated the 64^3 solve; bf16
    416 vs 100 GB/s at wide planes. bf16 on 128^2 planes is the one
    shape where XLA is nominally faster (543 vs 444 GB/s), but the
    kernel's f32 accumulation (no bf16-rounded Dr/Ds/W intermediates)
    buys a sharper preconditioner — net faster END-TO-END even there
    (16^3 bench 0.0497 vs 0.0515 s), so the kernel is used whenever the
    shape supports it."""
    if len(shape) != 3 or 128 % n != 0:
        return False
    mz, my, mx = shape
    if mz % n != 0 or my % 128 != 0 or mx % 128 != 0:
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:                            # pragma: no cover
        return False


def stiffness_lattice_3d(U, G, Db, Dbt, n: int, D_np=None,
                         interpret: bool = False):
    """One-pass fused SEM stiffness apply on a (Mz, My, Mx) lattice.

    G is the tuple of 6 per-factor lattices (G_rr, G_ss, G_tt, G_rs,
    G_rt, G_st); Db = kron(I_{128//n}, D) and Dbt = Db.T as (128, 128)
    f32 arrays; D_np the raw (n, n) HOST numpy differentiation matrix —
    its values are baked into the kernel as trace-time scalar weights
    (so it must not be a tracer; callers jit around this function).
    ``interpret`` runs the kernel in Pallas interpret mode (CPU tests).
    """
    mz, my, mx = U.shape
    grid = (mz // n, my // 128, mx // 128)
    z0 = np.int32(0)

    def fidx(c, j, i):
        return (c.astype(np.int32), j.astype(np.int32), i.astype(np.int32))

    def didx(c, j, i):
        return (z0, z0)

    blk = pl.BlockSpec((n, 128, 128), fidx, memory_space=pltpu.VMEM)
    dblk = pl.BlockSpec((128, 128), didx, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_stiffness_kernel, n=n, D_np=np.asarray(D_np)),
        out_shape=jax.ShapeDtypeStruct(U.shape, U.dtype),
        grid=grid,
        in_specs=[blk] * 7 + [dblk, dblk],
        out_specs=blk,
        interpret=interpret,
    )(U, *G, Db, Dbt)
