"""Preconditioners for the outer Krylov solve.

The reference's production preconditioner is the DD+polynomial-reduction
Subdomain object (subdomain.tpp); this module provides the lighter
bring-up configs (BASELINE.json configs[1,2]) and the shared plumbing.

A Preconditioner carries:
  build(arrays, extra, ops) -> (r -> z)   traced inside the solve,
  extra: pytree of device arrays (sharded leaves carry leading shard axis),
  extra_specs(axis) -> matching pytree of PartitionSpecs.
The returned z must be *continuous and masked* (the contract of the
reference's preconditioner + stitching step, domain.tpp:637-651).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops import sem
from ..ops import interp
from ..ops import gather_scatter as gs
from ..utils.gll import diff_matrix, interp_matrix

__all__ = ["Preconditioner", "jacobi", "pmultigrid"]


@dataclass
class Preconditioner:
    build: Callable[[Any, Any, tuple], Callable]
    extra: Any = None
    _extra_specs: Callable[[str], Any] = field(default=lambda ax: None)
    # host-side description of the composite regions (group/class orders
    # + element provenance) for the region field dump
    # (io/fields.save_composite_fields; subdomain.tpp:4649-4791 role)
    region_info: Any = None

    def extra_specs(self, axis_name: str):
        return self._extra_specs(axis_name)


def _domain_inv_diag(domain, arrays, dssum):
    """Continuous inverse assembled diagonal as a (shaped) point field."""
    if domain.sharded.structured is not None:
        diag = sem.stiffness_diagonal_lattice(arrays.geom, arrays.D,
                                              domain.dim)
    else:
        diag = sem.stiffness_diagonal(arrays.geom, arrays.D,
                                      domain.dim).reshape(-1)
    diag_c = dssum(diag, apply_mask=False)
    return jnp.where(diag_c > 0, 1.0 / diag_c, 0.0)


def jacobi(domain) -> Preconditioner:
    """Diagonal (Jacobi) preconditioning: z = Q diag(A_assembled)^-1 Qt r.

    Uses the exact matrix-free diagonal (ops/sem.stiffness_diagonal*)
    summed to nodes; both QQt r and QQt diag are continuous point fields,
    so their ratio is continuous.
    """

    def build(arrays, extra, ops):
        operator, dssum, dot, dot2 = ops
        inv_diag = _domain_inv_diag(domain, arrays, dssum)

        def precond(r):
            return dssum(r, apply_mask=True) * inv_diag

        return precond

    return Preconditioner(build=build)


def _level_arrays(domain, orders, mesh_builder):
    """Lattice-layout device arrays for each coarse order on the same
    element grid."""
    from ..mesh.partition import partition_mesh

    sd_f = domain.sharded
    grid = sd_f.structured.local_grid()
    dim = domain.dim
    levels = []
    for N_c in orders:
        mesh_c = mesh_builder(N_c)
        sd = partition_mesh(mesh_c, sd_f.num_shards, structured=True,
                            owned=sd_f.owned)
        n_c = N_c + 1

        from ..mesh.layout import elements_to_lattice

        def to_lat(arr_p):
            return elements_to_lattice(arr_p, grid, n_c, dim)

        n_own = len(sd.owned)
        lat = [to_lat(sd.geom[p]) for p in range(n_own)]
        geom = tuple(np.stack([l[..., k] for l in lat])
                     for k in range(sd.geom.shape[-1]))
        mask = np.stack([to_lat(sd.dirichlet_mask[p])
                         for p in range(n_own)])
        invd = np.stack([to_lat(sd.inv_degree_pts[p])
                         for p in range(n_own)])
        levels.append({
            "geom": tuple(domain.shard_put(g, dtype=domain.dtype)
                          for g in geom),
            "mask": domain.shard_put(mask, dtype=domain.dtype),
            "inv_degree_pts": domain.shard_put(invd, dtype=domain.dtype),
            "D": jnp.asarray(diff_matrix(n_c), dtype=domain.dtype),
        })
    return levels


def pmultigrid(domain, mesh_builder, poly_reduction: int = None,
               orders: list[int] | None = None, n_coarse_iterations: int = 8,
               smooth_damping: float = 2.0 / 3.0) -> Preconditioner:
    """Polynomial-reduction multilevel (p-multigrid) preconditioner.

    The reference's level hierarchy N, N-r, N-2r, ..., 1 (subdomain.tpp:
    93-120) with the tensor-product transfer operators (subdomain.okl:
    284-366), arranged as a V-cycle: damped-Jacobi smoothing per level,
    adjoint restriction of the non-assembled residual, a fixed number of
    Jacobi-CG iterations at order 1 (standing in for the reference's AMG
    coarse solve until amg/ lands), and interpolation back up. All levels
    live in the point-lattice layout; order transfer is block-diagonal MXU
    contractions (ops/interp.lattice_tensor_apply).

    mesh_builder(N_c) must return the *same element grid* meshed at order
    N_c (e.g. partial(kershaw_mesh, shape, epsilon=eps)).
    """
    if domain.sharded.structured is None:
        raise NotImplementedError(
            "pmultigrid currently requires a structured partition")

    N = domain.poly_degree
    if orders is None:
        r = poly_reduction if poly_reduction else max(N - 1, 1)
        orders = []
        k = N - r
        while k > 1:
            orders.append(k)
            k -= r
        orders.append(1)
    orders = list(orders)

    level_extra = _level_arrays(domain, orders, mesh_builder)
    all_orders = [N] + orders
    # 1-D transfer matrices between consecutive levels (J: coarse -> fine)
    Js = [jnp.asarray(interp_matrix(all_orders[i + 1] + 1, all_orders[i] + 1),
                      dtype=domain.dtype)
          for i in range(len(orders))]

    extra = {"levels": level_extra, "J": Js}

    def extra_specs(ax):
        lev = [{"geom": tuple(P(ax) for _ in lvl["geom"]),
                "mask": P(ax), "inv_degree_pts": P(ax),
                "D": P()} for lvl in level_extra]
        return {"levels": lev, "J": [P() for _ in Js]}

    dim = domain.dim
    grid = domain.local_grid
    axis = lambda: domain.axis_name
    lat_shapes = [tuple(g * (o + 1) for g in grid) for o in all_orders]

    ragged = domain.sharded.structured.ragged

    def build(arrays, extra, ops):
        operator_f, dssum_f, dot, dot2 = ops
        ax = axis()

        def level_ops(lvl, n_c, lat):
            top = (arrays.layers * n_c - 1) if ragged else None

            def op(u):
                return sem.stiffness_apply_lattice(
                    u, lvl["geom"], lvl["D"], dim)

            def ds(u, apply_mask=True, apply_weight=False):
                return gs.structured_dssum(
                    u, n=n_c, dim=dim,
                    mask=lvl["mask"], inv_degree_pts=lvl["inv_degree_pts"],
                    axis_name=ax, apply_mask=apply_mask,
                    apply_weight=apply_weight, top_plane=top)

            diag = sem.stiffness_diagonal_lattice(lvl["geom"], lvl["D"],
                                                  dim)
            diag_c = ds(diag, apply_mask=False)
            inv_diag = jnp.where(diag_c > 0, 1.0 / diag_c, 0.0)
            return op, ds, inv_diag

        inv_diag_f = _domain_inv_diag(domain, arrays, dssum_f)
        lvls = [(operator_f, dssum_f, inv_diag_f)]
        for lvl, N_c, lat in zip(extra["levels"], orders, lat_shapes[1:]):
            lvls.append(level_ops(lvl, N_c + 1, lat))

        omega = smooth_damping

        def smooth(l, z, r):
            op, ds, invd = lvls[l]
            res = r - op(z)
            return z + omega * invd * ds(res, apply_mask=True)

        def coarse_solve(r):
            op, ds, invd = lvls[-1]

            def precond_c(rr):
                return ds(rr, apply_mask=True) * invd

            from . import krylov
            res = krylov.fcg(op, precond_c,
                             lambda rr: ds(rr, apply_mask=True), dot, dot2,
                             r, max_iterations=n_coarse_iterations,
                             tolerance=1e-30)
            return res.u

        n_levels = len(lvls)

        def vcycle(l, r):
            if l == n_levels - 1:
                return coarse_solve(r)
            op, ds, invd = lvls[l]
            z = omega * invd * ds(r, apply_mask=True)      # pre-smooth
            res = r - op(z)                                # non-assembled
            rc = interp.lattice_tensor_apply(res, extra["J"][l].T, dim)
            zc = vcycle(l + 1, rc)
            z = z + interp.lattice_tensor_apply(zc, extra["J"][l], dim)
            return smooth(l, z, r)                          # post-smooth

        def precond(r):
            return vcycle(0, r)

        return precond

    return Preconditioner(build=build, extra=extra,
                          _extra_specs=extra_specs)
