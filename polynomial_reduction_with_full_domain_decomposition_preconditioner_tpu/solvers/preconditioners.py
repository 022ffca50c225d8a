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

    def extra_specs(self, axis_name: str):
        return self._extra_specs(axis_name)


def jacobi(dim: int) -> Preconditioner:
    """Diagonal (Jacobi) preconditioning: z = Q diag(A_assembled)^-1 Qt r.

    Uses the exact matrix-free diagonal (ops/sem.stiffness_diagonal) summed
    to nodes; both QQt r and QQt diag are continuous point fields, so their
    ratio is continuous.
    """

    def build(arrays, extra, ops):
        operator, dssum, dot, dot2 = ops
        diag_pts = sem.stiffness_diagonal(arrays.geom, arrays.D, dim)
        diag_c = dssum(diag_pts.reshape(-1), apply_mask=False)
        inv_diag = jnp.where(diag_c > 0, 1.0 / diag_c, 0.0)

        def precond(r):
            return dssum(r, apply_mask=True) * inv_diag

        return precond

    return Preconditioner(build=build)


def _level_arrays(domain, orders, mesh_builder):
    """Device arrays for each coarse order on the same element lattice."""
    from ..mesh.partition import partition_mesh

    sd_f = domain.sharded
    levels = []
    for N_c in orders:
        mesh_c = mesh_builder(N_c)
        sd = partition_mesh(mesh_c, sd_f.num_shards, structured=True)
        sq = (lambda x: x) if domain.spmd else (lambda x: x[0])
        lvl = {
            "geom": jnp.asarray(sq(sd.geom), dtype=domain.dtype),
            "mask": jnp.asarray(sq(sd.dirichlet_mask), dtype=domain.dtype),
            "inv_degree_pts": jnp.asarray(sq(sd.inv_degree_pts),
                                          dtype=domain.dtype),
            "D": jnp.asarray(diff_matrix(N_c + 1), dtype=domain.dtype),
        }
        if domain.spmd:
            spec = {"geom": P(domain.axis_name), "mask": P(domain.axis_name),
                    "inv_degree_pts": P(domain.axis_name), "D": P()}
            lvl = jax.tree.map(
                lambda s, x: jax.device_put(
                    x, jax.sharding.NamedSharding(domain.device_mesh, s)),
                spec, lvl, is_leaf=lambda s: isinstance(s, P))
        levels.append(lvl)
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
    coarse solve until amg/ lands), and interpolation back up.

    mesh_builder(N_c) must return the *same element lattice* meshed at
    order N_c (e.g. partial(kershaw_mesh, shape, epsilon=eps)).
    """
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
        lev = [{"geom": P(ax), "mask": P(ax), "inv_degree_pts": P(ax),
                "D": P()} for _ in level_extra]
        return {"levels": lev, "J": [P() for _ in Js]}

    dim = domain.dim
    st = domain.sharded
    axis = lambda: domain.axis_name
    local_grid = (st.structured.local_grid()
                  if st.structured is not None else None)
    if local_grid is None:
        raise NotImplementedError(
            "pmultigrid currently requires a structured partition")

    def build(arrays, extra, ops):
        operator_f, dssum_f, dot, dot2 = ops
        ax = axis()

        def level_ops(lvl, n_c):
            def op(u):
                E = lvl["geom"].shape[0]
                return sem.stiffness_apply(
                    u.reshape(E, -1), lvl["geom"], lvl["D"], dim
                ).reshape(u.shape)

            def ds(u, apply_mask=True, apply_weight=False):
                return gs.structured_dssum(
                    u, local_grid=local_grid, n=n_c, dim=dim,
                    mask=lvl["mask"].reshape(-1),
                    inv_degree_pts=lvl["inv_degree_pts"].reshape(-1),
                    axis_name=ax, apply_mask=apply_mask,
                    apply_weight=apply_weight)

            diag = sem.stiffness_diagonal(lvl["geom"], lvl["D"], dim)
            diag_c = ds(diag.reshape(-1), apply_mask=False)
            inv_diag = jnp.where(diag_c > 0, 1.0 / diag_c, 0.0)
            return op, ds, inv_diag

        # fine level smoother data
        diag_f = sem.stiffness_diagonal(arrays.geom, arrays.D, dim)
        diag_fc = dssum_f(diag_f.reshape(-1), apply_mask=False)
        inv_diag_f = jnp.where(diag_fc > 0, 1.0 / diag_fc, 0.0)

        lvls = [(operator_f, dssum_f, inv_diag_f)]
        for lvl, N_c in zip(extra["levels"], orders):
            lvls.append(level_ops(lvl, N_c + 1))

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
        E = arrays.geom.shape[0]  # same element lattice at every order

        def vcycle(l, r):
            if l == n_levels - 1:
                return coarse_solve(r)
            op, ds, invd = lvls[l]
            z = omega * invd * ds(r, apply_mask=True)      # pre-smooth
            res = r - op(z)                                # non-assembled
            rc = interp.restrict(res.reshape(E, -1),
                                 extra["J"][l], dim).reshape(-1)
            zc = vcycle(l + 1, rc)
            z = z + interp.prolongate(zc.reshape(E, -1), extra["J"][l],
                                      dim).reshape(-1)
            return smooth(l, z, r)                          # post-smooth

        def precond(r):
            return vcycle(0, r)

        return precond

    return Preconditioner(build=build, extra=extra,
                          _extra_specs=extra_specs)
