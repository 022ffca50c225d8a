"""Direct stiffness summation (gather-scatter) — the gslib replacement.

The reference assembles shared-node contributions with a local CSR pair
Q/Qt plus a blocking host-side gslib exchange on boundary nodes
(/root/reference/domain.tpp:583-600: Qt SpMV -> D2H -> gslib_gs(add) ->
H2D -> Q SpMV). Here the whole pipeline stays in HBM:

  1. scatter-add points -> local unique nodes (Qt),
  2. one ``psum`` over the shard axis restricted to the compact global
     interface vector (replaces gslib_gs, domain.tpp:592),
  3. gather nodes -> points (Q), with optional Dirichlet mask / inverse
     multiplicity weight (csr_matrix.okl:35-48 ``multiply_weight``).

Index plans come from mesh/partition.py. All functions are shard-local
SPMD code: call them inside ``jax.shard_map`` (axis_name set) or on a
single device (axis_name=None).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["scatter_to_nodes", "gather_to_points", "exchange", "dssum",
           "structured_dssum", "psum_scalar"]


def psum_scalar(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def scatter_to_nodes(u_pts, gather_ids, num_local_nodes: int):
    """Qt apply: sum point values into local unique nodes.

    Returns an array of size num_local_nodes + 1; the final slot is the
    trash node that absorbs padding points.
    """
    out = jnp.zeros((num_local_nodes + 1,), dtype=u_pts.dtype)
    return out.at[gather_ids].add(u_pts, mode="drop")


def gather_to_points(w_nodes, gather_ids):
    """Q apply: read node values back to points."""
    return w_nodes[gather_ids]


def exchange(w_nodes, bnode_local, bnode_global, num_boundary_global: int,
             axis_name):
    """Sum boundary-node values across shards (the gslib_gs(add) step).

    Uses a compact interface vector of length num_boundary_global (+1 trash
    slot) and a single psum over the shard axis — all in HBM, unlike the
    reference's host bounce (domain.tpp:590-594).
    """
    if axis_name is None or num_boundary_global == 0:
        return w_nodes
    buf = jnp.zeros((num_boundary_global + 1,), dtype=w_nodes.dtype)
    buf = buf.at[bnode_global].add(w_nodes[bnode_local], mode="drop")
    buf = jax.lax.psum(buf, axis_name)
    return w_nodes.at[bnode_local].set(buf[bnode_global], mode="drop")


def dssum(u_pts, *, gather_ids, mask, inv_degree, bnode_local, bnode_global,
          num_local_nodes: int, num_boundary_global: int, axis_name,
          apply_mask: bool = True, apply_weight: bool = False):
    """Full direct stiffness summation QQt (domain.tpp:583-600).

    apply_weight multiplies node sums by 1/multiplicity *before* the
    exchange, like the reference's Qt.multiply_weight(assembled_weight)
    (domain.tpp:586) — the weight is shard-invariant so the result equals
    weighting after the global sum.
    """
    w = scatter_to_nodes(u_pts, gather_ids, num_local_nodes)
    if apply_weight:
        w = w * inv_degree
    w = exchange(w, bnode_local, bnode_global, num_boundary_global, axis_name)
    out = gather_to_points(w, gather_ids)
    if apply_mask:
        out = out * mask
    return out


def _roll_masks(M: int, n: int, dtype):
    """hi[X]=1 iff X is the last node of a non-final element (receives from
    X+1); lo[X]=1 iff X is the first node of a non-initial element."""
    import numpy as np
    hi = np.zeros(M); hi[n - 1::n] = 1.0; hi[M - 1] = 0.0
    lo = np.zeros(M); lo[0::n] = 1.0; lo[0] = 0.0
    return jnp.asarray(hi, dtype), jnp.asarray(lo, dtype)


def _use_pallas_face_sum(U) -> bool:
    """The fused one-pass Pallas kernel (ops/pallas_kernels.py) needs a
    TPU backend and tile-aligned minor dims (sublane tile is 8 for f32,
    16 for bf16); everything else falls back to the XLA roll form."""
    if U.ndim != 3:
        return False
    if U.dtype == jnp.float32:
        sublane = 8
    elif U.dtype == jnp.bfloat16:
        sublane = 16
    else:
        return False
    if U.shape[2] % 128 != 0 or U.shape[1] % sublane != 0:
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


def lattice_face_sum(U, n: int, axes=None):
    """Coincident-face summation on a point-lattice array, per direction:
    ``U += hi_d * roll(U,-1,d) + lo_d * roll(U,+1,d)`` — two lane
    rotations and two masked adds. No gathers, no minor-axis slicing
    (arbitrary-index gather/scatter and (..., n, n) minor-dim slicing both
    lower to catastrophically slow TPU code; measured 17ms / 2.8ms vs
    ~0.13ms for this form on 885k points). On TPU with aligned 3-D shapes
    the fused one-HBM-pass Pallas kernel is used instead (the hottest op
    of the preconditioned solve: ~30 calls per outer iteration)."""
    if axes is None and _use_pallas_face_sum(U):
        from .pallas_kernels import lattice_face_sum_3d
        return lattice_face_sum_3d(U, n)
    dtype = U.dtype
    ndim = U.ndim
    for ax in (axes if axes is not None else range(ndim - 1, -1, -1)):
        M = U.shape[ax]
        hi, lo = _roll_masks(M, n, dtype)
        shape = [1] * ndim
        shape[ax] = M
        hi = hi.reshape(shape)
        lo = lo.reshape(shape)
        U = U + hi * jnp.roll(U, -1, axis=ax) + lo * jnp.roll(U, 1, axis=ax)
    return U


def slab_exchange_add(U, axis_name, top_plane=None):
    """Add the neighboring shards' boundary planes of the slab (leading
    lattice) direction: one dense ppermute each way — the reference's
    host-side gslib exchange (domain.tpp:590-594) entirely in HBM.

    top_plane: shard-varying lattice index of the REAL top plane, for
    ragged slab partitions where trailing layers are padding (None = the
    static last plane; keeps the uniform path free of dynamic slices).
    Empty shards (top_plane < 0, possible when P > m_last) clamp to plane
    0; they only hold zero-masked padding, so the spurious add is inert.
    """
    if axis_name is None:
        return U
    nshards = jax.lax.axis_size(axis_name)
    if nshards <= 1:
        return U
    up = [(i, i + 1) for i in range(nshards - 1)]
    down = [(i + 1, i) for i in range(nshards - 1)]
    if top_plane is None:
        from_below = jax.lax.ppermute(U[-1], axis_name, up)
        from_above = jax.lax.ppermute(U[0], axis_name, down)
        U = U.at[0].add(from_below)
        U = U.at[-1].add(from_above)
        return U
    top = jax.lax.dynamic_index_in_dim(U, top_plane, 0, keepdims=False)
    from_below = jax.lax.ppermute(top, axis_name, up)
    from_above = jax.lax.ppermute(U[0], axis_name, down)
    U = U.at[0].add(from_below)
    cur = jax.lax.dynamic_index_in_dim(U, top_plane, 0, keepdims=False)
    return jax.lax.dynamic_update_index_in_dim(U, cur + from_above,
                                               top_plane, 0)


def structured_dssum(U, *, n: int, dim: int, mask,
                     inv_degree_pts, axis_name,
                     apply_mask: bool = True, apply_weight: bool = False,
                     top_plane=None):
    """Direct stiffness summation on a structured box lattice.

    Fields live natively in the SHAPED point-lattice layout
    (Mz, My, Mx) with X_d = e_d*n + i_d — never flattened: large
    contiguous minor dims tile well on TPU, face sums are lane rolls, the
    slab boundary is a contiguous plane, and a 1-D<->3-D reshape would
    materialize a layout copy far below HBM bandwidth (measured 800 us at
    2.1M points). mask / inv_degree_pts carry the same lattice shape.

    top_plane: per-shard real top-plane index for ragged slab partitions
    (see slab_exchange_add). Requires the padding invariant: every input
    field is zero at pad points (mask/weight are zero there, so outputs
    preserve it).
    """
    if axis_name is None and _use_pallas_face_sum(U):
        # single-shard: no slab exchange between the face sum and the
        # mask/weight multiplies, so they fuse into the one-pass kernel
        # (each separate multiply costs a full extra read+write pass)
        from .pallas_kernels import lattice_face_sum_3d
        return lattice_face_sum_3d(
            U, n,
            mask=mask if apply_mask else None,
            weight=inv_degree_pts if apply_weight else None)
    U = lattice_face_sum(U, n)
    U = slab_exchange_add(U, axis_name, top_plane=top_plane)
    if apply_weight:
        U = U * inv_degree_pts
    if apply_mask:
        U = U * mask
    return U
