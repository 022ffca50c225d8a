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


def _face_sum(U, elem_axis: int, node_axis: int):
    """Symmetric coincident-face summation along one lattice direction.

    For adjacent elements e, e+1 along elem_axis, the shared face (last
    node plane of e == first node plane of e+1) receives the sum of both.
    """
    n_elems = U.shape[elem_axis]
    if n_elems < 2:
        return U
    idx_lo = [slice(None)] * U.ndim
    idx_hi = [slice(None)] * U.ndim
    idx_lo[elem_axis] = slice(1, None)
    idx_lo[node_axis] = 0
    idx_hi[elem_axis] = slice(0, -1)
    idx_hi[node_axis] = U.shape[node_axis] - 1
    s = U[tuple(idx_lo)] + U[tuple(idx_hi)]
    U = U.at[tuple(idx_lo)].set(s)
    U = U.at[tuple(idx_hi)].set(s)
    return U


def structured_dssum(u_pts, *, local_grid, n: int, dim: int, mask,
                     inv_degree_pts, axis_name,
                     apply_mask: bool = True, apply_weight: bool = False):
    """Direct stiffness summation on a structured box lattice.

    The generic gather/scatter formulation is TPU-hostile (arbitrary-index
    gathers lower to near-serial code); on a conforming tensor-product
    lattice QQt factors into dimension-by-dimension coincident-face sums —
    dense static-slice adds the VPU eats whole. Inter-shard assembly (the
    lattice is slab-partitioned along its last dimension) is one dense
    face-plane ``ppermute`` each way: the reference's gslib exchange
    (domain.tpp:590-594) becomes two neighbor messages in HBM.

    local_grid: per-shard element-grid shape in storage order, e.g.
    (mz_loc, my, mx) in 3D; u is (prod(local_grid) * n^dim,).
    """
    grid = tuple(local_grid)
    U = u_pts.reshape(grid + (n,) * dim)
    g = len(grid)

    # x: fastest element axis (last of grid), node axis = last
    # y: next, node axis = second-to-last, etc. Process x..z; the sharded
    # direction (element axis 0 / node axis g) comes last so its cross-
    # shard exchange sees fully summed transverse data.
    for d in range(dim):
        elem_axis = g - 1 - d
        node_axis = g + dim - 1 - d
        U = _face_sum(U, elem_axis, node_axis)

    if axis_name is not None:
        # cross-shard faces of the slab direction (element axis 0)
        nshards = jax.lax.axis_size(axis_name)
        if nshards > 1:
            top = U[-1].take(indices=n - 1, axis=dim - 1)   # (grid[1:], n^(dim-1))
            bot = U[0].take(indices=0, axis=dim - 1)
            up = [(i, i + 1) for i in range(nshards - 1)]
            down = [(i + 1, i) for i in range(nshards - 1)]
            from_below = jax.lax.ppermute(top, axis_name, up)
            from_above = jax.lax.ppermute(bot, axis_name, down)
            idx_bot = (0,) + (slice(None),) * (g - 1) + (0,)
            idx_top = (U.shape[0] - 1,) + (slice(None),) * (g - 1) + (n - 1,)
            U = U.at[idx_bot].add(from_below)
            U = U.at[idx_top].add(from_above)

    out = U.reshape(u_pts.shape)
    if apply_weight:
        out = out * inv_degree_pts
    if apply_mask:
        out = out * mask
    return out
