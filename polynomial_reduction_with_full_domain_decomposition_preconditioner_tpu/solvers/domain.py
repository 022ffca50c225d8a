"""The fine-level SEM Poisson problem ("Domain" layer).

TPU-native rebuild of the reference's ``Domain<DType>`` class
(/root/reference/domain.{hpp,tpp}): owns the partitioned mesh data on
device, the matrix-free stiffness operator, direct stiffness summation,
manufactured solutions, and the outer Krylov solves.

Execution model: a single ``jax.jit``-compiled solve. On one device the
closures run as-is; across devices the *same* function runs under
``jax.shard_map`` over a 1-D 'shard' mesh axis — the reference's
1 rank = 1 GPU SPMD (poisson.cpp:84-89) — with psum replacing
MPI_Allreduce (domain.tpp:929) and the interface-vector exchange replacing
gslib (domain.tpp:592).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..mesh.partition import ShardedDomain
from ..ops import sem
from ..ops import gather_scatter as gs
from . import krylov

__all__ = ["Domain"]

_HI = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclass
class DomainArrays:
    """Device-resident per-shard state (pytree). Per-shard fields carry a
    leading shard axis that shard_map splits; D is replicated."""
    geom: jax.Array            # unstructured (P, E, npe, nG); structured
    #   lattice: a TUPLE of nG per-factor (P, Mz, My, Mx) arrays — see
    #   sem.stiffness_apply_lattice (fastest layout, no XLA transposes)
    mask: jax.Array            # (P, E*npe)
    gather_ids: jax.Array      # (P, E*npe) int32
    inv_degree: jax.Array      # (P, NN+1)
    inv_degree_pts: jax.Array  # (P, E*npe)
    bnode_local: jax.Array     # (P, B) int32
    bnode_global: jax.Array    # (P, B) int32
    D: jax.Array               # (n, n), replicated
    layers: jax.Array          # (P,) int32 real slab layers (ragged slabs)
    fb: dict | None = None     # face-block dssum plan (ops/face_dssum),
    #   per-shard leaves; None on structured / non-hex / multi-process


def _specs(axis: str, arrays: "DomainArrays | None" = None):
    geom_spec = P(axis)
    fb = None
    if arrays is not None:
        if isinstance(arrays.geom, tuple):
            geom_spec = tuple(P(axis) for _ in arrays.geom)
        if arrays.fb is not None:
            fb = {k: P(axis) for k in arrays.fb}
    return DomainArrays(
        geom=geom_spec, mask=P(axis), gather_ids=P(axis),
        inv_degree=P(axis), inv_degree_pts=P(axis), bnode_local=P(axis),
        bnode_global=P(axis), D=P(), layers=P(axis), fb=fb)


def _squeeze_shard(a: DomainArrays) -> DomainArrays:
    geom = (tuple(g[0] for g in a.geom) if isinstance(a.geom, tuple)
            else a.geom[0])
    return DomainArrays(
        geom=geom, mask=a.mask[0], gather_ids=a.gather_ids[0],
        inv_degree=a.inv_degree[0], inv_degree_pts=a.inv_degree_pts[0],
        bnode_local=a.bnode_local[0], bnode_global=a.bnode_global[0], D=a.D,
        layers=a.layers[0],
        fb=None if a.fb is None else {k: v[0] for k, v in a.fb.items()})


class Domain:
    """User-facing fine-level problem (reference Domain, domain.hpp:33-145).

    Args:
      sharded: host-side partitioned mesh (mesh/partition.partition_mesh).
      dtype: solver precision (the reference's STYPE, config.hpp:19).
        float32 is the TPU-native default; float64 works everywhere JAX
        enables x64 (CPU validation, emulated on TPU).
      device_mesh: a jax.sharding.Mesh with one axis matching
        sharded.num_shards, or None for single-device execution.
      axis_name: mesh axis name used for collectives.
    """

    def __init__(self, sharded: ShardedDomain, *, dtype=jnp.float32,
                 device_mesh=None, axis_name: str = "shard"):
        self.sharded = sharded
        self.dtype = dtype
        self.dim = sharded.dim
        self.poly_degree = sharded.poly_degree
        self.num_local_nodes = sharded.num_local_nodes
        self.num_boundary_global = sharded.num_boundary_global
        self.device_mesh = device_mesh
        self.axis_name = axis_name if device_mesh is not None else None
        self.spmd = device_mesh is not None
        self.multiprocess = jax.process_count() > 1
        self.num_owned = len(sharded.owned) if sharded.owned \
            else sharded.num_shards

        if self.spmd:
            sizes = dict(zip(device_mesh.axis_names, device_mesh.devices.shape))
            if sizes.get(axis_name) != sharded.num_shards:
                raise ValueError(
                    f"device mesh axis '{axis_name}' has size "
                    f"{sizes.get(axis_name)} but the domain has "
                    f"{sharded.num_shards} shards")

        from ..utils.gll import diff_matrix
        D = diff_matrix(sharded.poly_degree + 1).astype(dtype)

        # Structured domains keep device fields in the point-lattice layout
        # (see ops/gather_scatter.structured_dssum): convert the per-shard
        # element-ordered setup arrays once on the host.
        n = sharded.poly_degree + 1
        n_own = self.num_owned
        if sharded.structured is not None:
            grid = sharded.structured.local_grid()
            self.local_grid = grid
            self.lattice_shape = tuple(g * n for g in grid)

            # tuple of per-factor (P, Mz, My, Mx) lattices: separate
            # contiguous buffers, the measured-fastest representation
            # (see sem.stiffness_apply_lattice)
            lat = [self._host_elem_to_lattice(sharded.geom[p])
                   for p in range(n_own)]
            geom = tuple(np.stack([l[..., k] for l in lat])
                         for k in range(sharded.geom.shape[-1]))
            del lat
            mask = np.stack([self._host_elem_to_lattice(
                sharded.dirichlet_mask[p]) for p in range(n_own)])
            invd = np.stack([self._host_elem_to_lattice(
                sharded.inv_degree_pts[p]) for p in range(n_own)])
        else:
            self.local_grid = None
            self.lattice_shape = None
            geom = sharded.geom.reshape(n_own, -1,
                                        sharded.num_points_per_elem,
                                        sharded.geom.shape[-1])
            mask = sharded.dirichlet_mask
            invd = sharded.inv_degree_pts

        # face-block dssum plan for unstructured 3-D hex shards (the
        # fast exact assembly, ops/face_dssum.py). In multi-process runs
        # each process builds plans for its OWNED shards only; the pad
        # maxima (global SPMD shape requirements) come from one tiny
        # allgather of the local maxima (the gslib-setup collective role,
        # domain.tpp:283-284).
        self._fb_n = n
        self._fb_nr = 0
        self._fb_ng = 0
        fb_stacked = None
        if (sharded.structured is None and sharded.dim == 3
                and sharded.num_points_per_elem == n ** 3):
            from ..ops import face_dssum as fd
            plans, metas = [], []
            for k in range(n_own):
                ivd = sharded.inv_degree_pts[k]
                deg = np.where(ivd > 0, np.round(1.0 / np.maximum(
                    ivd, 1e-30)), 0.0).astype(np.int64)
                glo_k = sharded.glo_num[k].reshape(-1)
                uniq_k = np.unique(glo_k[glo_k >= 0])
                bl = sharded.bnode_local[k]
                bg = sharded.bnode_global[k]
                real_b = bl < uniq_k.size
                iface = {int(uniq_k[l]): int(g)
                         for l, g in zip(bl[real_b], bg[real_b])}
                plan, meta = fd.build_face_plan(
                    sharded.glo_num[k],
                    n, deg.reshape(sharded.glo_num[k].shape),
                    iface_of_node=iface)
                if plan is None:
                    plans = None
                    break
                plans.append(plan)
                metas.append(meta)
            nr = ng = 0
            shapes = None
            if plans:
                nr = max(m["num_rest_nodes"] for m in metas)
                ng = max(m["num_edge_groups"] for m in metas)
                shapes = fd.max_shapes(plans)
            if self.multiprocess:
                from jax.experimental import multihost_utils
                keys = sorted(shapes) if shapes else []
                flat = [1 if plans else 0, nr, ng]
                for key in keys:
                    flat.extend(shapes[key])
                assert len(flat) <= 64, len(flat)
                vec = np.zeros(64, dtype=np.int64)
                vec[:len(flat)] = flat
                allv = np.asarray(multihost_utils.process_allgather(vec))
                if allv[:, 0].min() == 0:
                    plans = None            # any process fell back
                else:
                    gmax = allv.max(axis=0)
                    nr, ng = int(gmax[1]), int(gmax[2])
                    off = 3
                    for key in keys:
                        nd = len(shapes[key])
                        shapes[key] = tuple(
                            int(x) for x in gmax[off:off + nd])
                        off += nd
            if plans:
                self._fb_nr = nr
                self._fb_ng = ng
                plans = [fd.plan_pad_to(p, self._fb_nr, shapes)
                         for p in plans]
                fb_stacked = {
                    key: np.stack([p[key] for p in plans])
                    for key in plans[0]}
                for key in ("rowmask", "emask", "eM"):
                    fb_stacked[key] = fb_stacked[key].astype(dtype)

        if sharded.structured is not None:
            layer_counts = np.asarray(sharded.structured.layer_counts,
                                      dtype=np.int32)[list(sharded.owned)]
            self.ragged = sharded.structured.ragged
        else:
            layer_counts = np.zeros((n_own,), dtype=np.int32)
            self.ragged = False

        if sharded.structured is not None or fb_stacked is not None:
            # the structured lattice path and the face-block unstructured
            # path never touch the generic gather/scatter plan —
            # placeholders save ~0.9 GB of HBM at 64^3 N=7 (gather_ids
            # alone is one int32 per point; ~0.3 GB at PB_1568)
            gather_ids = np.zeros((n_own, 1), dtype=np.int32)
            inv_degree = np.zeros((n_own, 1))
        else:
            gather_ids = sharded.gather_ids
            inv_degree = sharded.inv_degree
        # mask is 0/1 and the structured inverse multiplicities are
        # powers of two ({1, 1/2, 1/4, 1/8}) — exactly representable in
        # bfloat16, and bf16 * f32 promotes to f32, so storing them
        # half-width is bitwise-neutral and saves ~0.5 GB at 64^3 N=7
        small = jnp.bfloat16 if (sharded.structured is not None
                                 and dtype == jnp.float32) else dtype
        arrays = DomainArrays(
            geom=(tuple(np.asarray(g, dtype=dtype) for g in geom)
                  if isinstance(geom, tuple)
                  else np.asarray(geom, dtype=dtype)),
            mask=np.asarray(mask, dtype=small),
            gather_ids=gather_ids,
            inv_degree=np.asarray(inv_degree, dtype=dtype),
            inv_degree_pts=np.asarray(invd, dtype=small),
            bnode_local=sharded.bnode_local,
            bnode_global=sharded.bnode_global,
            D=np.asarray(D),
            layers=layer_counts,
            fb=fb_stacked if sharded.structured is None else None,
        )
        if self.spmd:
            spec = _specs(axis_name, arrays)
            arrays = jax.tree.map(
                lambda x, s: self._put(x, s), arrays, spec,
                is_leaf=lambda s: isinstance(s, P))
        else:
            arrays = jax.tree.map(jnp.asarray, _squeeze_shard(arrays))
        self.arrays = arrays

        # point-space field sharding (P, E*npe) or (E*npe,)
        if self.spmd:
            self.field_sharding = jax.sharding.NamedSharding(
                device_mesh, P(axis_name))
        else:
            self.field_sharding = None

    def _put(self, x, spec):
        """Place a host array on the device mesh: multi-process runs build
        a global jax.Array from each process's local shard slice (the
        per-rank setup of the reference, domain.tpp:45 — no process ever
        materializes another's shards)."""
        x = np.asarray(x)
        sh = jax.sharding.NamedSharding(self.device_mesh, spec)
        if spec == P(self.axis_name) and self.multiprocess:
            gshape = (self.sharded.num_shards,) + x.shape[1:]
            return jax.make_array_from_process_local_data(sh, x, gshape)
        return jax.device_put(x, sh)

    def shard_put(self, stacked, dtype=None):
        """Per-shard setup array (leading axis = owned shards) -> device
        array for the solve: squeezed single-device, stacked single-
        process SPMD, or a global multi-process jax.Array."""
        x = np.asarray(stacked)
        if dtype is not None:
            x = x.astype(dtype)
        if not self.spmd:
            return jnp.asarray(x[0])
        if self.multiprocess:
            return self._put(x, P(self.axis_name))
        return jnp.asarray(x)

    # ---- layout conversion (host, numpy) ----

    def _host_elem_to_lattice(self, arr):
        """Element-ordered (E, npe[, F]) or flat -> lattice (M..., [F])."""
        from ..mesh.layout import elements_to_lattice
        return elements_to_lattice(arr, self.local_grid,
                                   self.poly_degree + 1, self.dim)

    def _host_lattice_to_elem(self, U):
        """Lattice (M..., [F]) -> element-ordered flat (E*npe, [F])."""
        from ..mesh.layout import lattice_to_elements
        return lattice_to_elements(U, self.local_grid,
                                   self.poly_degree + 1, self.dim)

    # ---- closure builders (shard-local SPMD code) ----

    def _ops(self, arrays: DomainArrays):
        st = self.sharded
        axis = self.axis_name

        if st.structured is not None:
            n = st.poly_degree + 1
            # ragged slab partitions: the real top plane is shard-varying
            top = (arrays.layers * n - 1) if self.ragged else None

            def operator(u):
                # fields stay SHAPED (Mz, My, Mx): flattening would
                # materialize a layout copy per apply (see krylov.py)
                return sem.stiffness_apply_lattice(
                    u, arrays.geom, arrays.D, self.dim)

            def dssum(u, apply_mask=True, apply_weight=False):
                return gs.structured_dssum(
                    u, n=n, dim=self.dim,
                    mask=arrays.mask, inv_degree_pts=arrays.inv_degree_pts,
                    axis_name=axis, apply_mask=apply_mask,
                    apply_weight=apply_weight, top_plane=top)
        else:
            def operator(u):
                E, npe = arrays.geom.shape[0], arrays.geom.shape[1]
                au = sem.stiffness_apply(u.reshape(E, npe), arrays.geom,
                                         arrays.D, self.dim)
                return au.reshape(u.shape)

            if arrays.fb is not None:
                # face+edge-block exact assembly (ops/face_dssum.py):
                # the scatter path costs ~30 ms/pass at 2.1M pts on TPU,
                # this one 2.15 ms, bit-identical
                from ..ops import face_dssum as fd

                def dssum(u, apply_mask=True, apply_weight=False):
                    return fd.face_dssum(
                        u, arrays.fb, self._fb_n, self._fb_nr,
                        mask=arrays.mask,
                        inv_degree_pts=arrays.inv_degree_pts,
                        axis_name=axis,
                        num_boundary_global=st.num_boundary_global,
                        apply_mask=apply_mask, apply_weight=apply_weight,
                        num_edge_groups=self._fb_ng)
            else:
                def dssum(u, apply_mask=True, apply_weight=False):
                    return gs.dssum(
                        u, gather_ids=arrays.gather_ids, mask=arrays.mask,
                        inv_degree=arrays.inv_degree,
                        bnode_local=arrays.bnode_local,
                        bnode_global=arrays.bnode_global,
                        num_local_nodes=st.num_local_nodes,
                        num_boundary_global=st.num_boundary_global,
                        axis_name=axis, apply_mask=apply_mask,
                        apply_weight=apply_weight)

        op_dssum = None
        if (st.structured is not None and self.spmd and not self.ragged
                and st.structured.slab_elems >= 3):
            # comm/compute overlap (SURVEY 2.4 north star — the reference's
            # gslib exchange is blocking host-side, domain.tpp:590-594):
            # compute the boundary element layers FIRST, launch the slab
            # ppermute on their xy-summed outer planes, then run the big
            # interior apply — XLA's async collectives overlap the
            # exchange with the interior compute. Bitwise-equal to
            # operator + dssum (tests pin it); z-splits are element-
            # aligned so the layer applies are exact.
            n_ = st.poly_degree + 1
            nsh = st.num_shards

            def op_dssum(z, apply_mask=True):
                Au_lo = sem.stiffness_apply_lattice(
                    z[:n_], tuple(g[:n_] for g in arrays.geom),
                    arrays.D, self.dim)
                Au_hi = sem.stiffness_apply_lattice(
                    z[-n_:], tuple(g[-n_:] for g in arrays.geom),
                    arrays.D, self.dim)
                pl_axes = tuple(range(self.dim - 1))
                plane_lo = gs.lattice_face_sum(Au_lo[0], n_, axes=pl_axes)
                plane_hi = gs.lattice_face_sum(Au_hi[-1], n_, axes=pl_axes)
                up = [(i, i + 1) for i in range(nsh - 1)]
                down = [(i + 1, i) for i in range(nsh - 1)]
                from_below = jax.lax.ppermute(plane_hi, axis, up)
                from_above = jax.lax.ppermute(plane_lo, axis, down)
                # the big interior apply: independent of the permutes
                Au_mid = sem.stiffness_apply_lattice(
                    z[n_:-n_], tuple(g[n_:-n_] for g in arrays.geom),
                    arrays.D, self.dim)
                q = jnp.concatenate([Au_lo, Au_mid, Au_hi], axis=0)
                U = gs.lattice_face_sum(q, n_)
                U = U.at[0].add(from_below)
                U = U.at[-1].add(from_above)
                if apply_mask:
                    U = U * arrays.mask
                return q, U
        elif st.structured is not None and self.spmd and self.ragged:
            # ragged variant: the real top layer sits at a shard-varying
            # index, so the two boundary layers are computed FIRST
            # (dynamic slice for the top) to launch the permutes, then
            # the full apply runs — the 2/S redundant boundary compute
            # buys exchange/compute overlap on uneven slabs too.
            # Bitwise-equal to operator + dssum (z-splits element-
            # aligned; the sent planes are the same values).
            n_ = st.poly_degree + 1
            nsh = st.num_shards

            def op_dssum(z, apply_mask=True):
                top_pl = arrays.layers * n_ - 1           # real top plane
                hi0 = jnp.maximum(top_pl + 1 - n_, 0)
                Au_lo = sem.stiffness_apply_lattice(
                    z[:n_], tuple(g[:n_] for g in arrays.geom),
                    arrays.D, self.dim)
                z_hi = jax.lax.dynamic_slice_in_dim(z, hi0, n_, 0)
                g_hi = tuple(jax.lax.dynamic_slice_in_dim(g, hi0, n_, 0)
                             for g in arrays.geom)
                Au_hi = sem.stiffness_apply_lattice(z_hi, g_hi,
                                                    arrays.D, self.dim)
                pl_axes = tuple(range(self.dim - 1))
                plane_lo = gs.lattice_face_sum(Au_lo[0], n_, axes=pl_axes)
                plane_hi = gs.lattice_face_sum(Au_hi[-1], n_, axes=pl_axes)
                up = [(i, i + 1) for i in range(nsh - 1)]
                down = [(i + 1, i) for i in range(nsh - 1)]
                from_below = jax.lax.ppermute(plane_hi, axis, up)
                from_above = jax.lax.ppermute(plane_lo, axis, down)
                # full apply (boundary layers recomputed — element-
                # aligned, bitwise-equal results), then the exchange adds
                q = sem.stiffness_apply_lattice(z, arrays.geom,
                                                arrays.D, self.dim)
                U = gs.lattice_face_sum(q, n_)
                U = U.at[0].add(from_below)
                cur = jax.lax.dynamic_index_in_dim(U, top_pl, 0,
                                                   keepdims=False)
                U = jax.lax.dynamic_update_index_in_dim(
                    U, cur + from_above, top_pl, 0)
                if apply_mask:
                    U = U * arrays.mask
                return q, U

        def dot(a, b):
            # pytree/stacked-aware global inner product (krylov contract)
            return krylov.tree_dot(a, b, axis_name=axis)

        def dot2(a, b, c, d):
            v = jnp.stack([krylov.tree_dot(a, b), krylov.tree_dot(c, d)])
            v = gs.psum_scalar(v, axis)
            return v[0], v[1]

        operator.fused_dssum = op_dssum
        return operator, dssum, dot, dot2

    # ---- solvers ----

    def _squeeze_extra(self, extra, extra_specs):
        if extra is None:
            return None
        ax = self.axis_name

        def sq(s, x):
            return x[0] if s == P(ax) else x

        # map over the spec tree first: PartitionSpec is a tuple subclass,
        # so it must be declared a leaf explicitly
        return jax.tree.map(sq, extra_specs, extra,
                            is_leaf=lambda s: isinstance(s, P))

    def _solve_impl(self, arrays, extra, f, *, precond_builder, method,
                    max_iterations, num_vectors, tolerance, use_relative,
                    overlap=True, z_dtype=None):
        operator, dssum, dot, dot2 = self._ops(arrays)
        dssum_plain = lambda r: dssum(r, apply_mask=True, apply_weight=False)
        if precond_builder is None:
            # the reference's "unpreconditioned" path is z = QQt r with mask
            # (domain.tpp:650,801)
            precond = dssum_plain
        else:
            precond = precond_builder(arrays, extra,
                                      (operator, dssum, dot, dot2))
        if method == "fcg":
            fused = getattr(operator, "fused_dssum", None) if overlap \
                else None
            return krylov.fcg(operator, precond, dssum_plain, dot, dot2, f,
                              max_iterations=max_iterations,
                              tolerance=tolerance, use_relative=use_relative,
                              op_dssum=fused)
        if method == "fgmres":
            fused = getattr(operator, "fused_dssum", None) if overlap \
                else None
            return krylov.fgmres(operator, precond, dssum_plain, dot, f,
                                 max_iterations=max_iterations,
                                 num_vectors=num_vectors,
                                 tolerance=tolerance,
                                 use_relative=use_relative,
                                 op_dssum=fused, z_dtype=z_dtype)
        raise ValueError(f"unknown method {method!r}")

    def solver(self, method="fcg", precond=None, precond_builder=None,
               max_iterations=500, num_vectors=20, tolerance=None,
               use_relative=True, overlap=True, z_dtype=None):
        """Build a jitted solve function f -> KrylovResult.

        precond: a Preconditioner (solvers/preconditioners.py) carrying its
          own device arrays + shard specs, or None (the reference
          'unpreconditioned' QQt path, domain.tpp:650,801).
        precond_builder: legacy shorthand — a bare builder with no extra
          arrays: builder(arrays, None, ops) -> (r -> z).
        overlap: use the fused boundary-first operator+dssum in FGMRES so
          the slab exchange overlaps the interior compute (numerically
          identical; active for uniform structured SPMD partitions).
        z_dtype: FGMRES-only — storage dtype for the flexible Z basis
          (see krylov.fgmres); jnp.bfloat16 halves the dominant memory
          term of large single-chip FGMRES runs.
        """
        if tolerance is None:
            tolerance = 1.0e-7 if self.dtype == jnp.float64 else 1.0e-4

        if precond is not None:
            builder = precond.build
            extra = precond.extra
            extra_specs = (precond.extra_specs(self.axis_name)
                           if self.spmd else None)
        else:
            builder = precond_builder
            extra, extra_specs = None, None

        impl = partial(self._solve_impl, precond_builder=builder,
                       method=method, max_iterations=max_iterations,
                       num_vectors=num_vectors, tolerance=tolerance,
                       use_relative=use_relative, overlap=overlap,
                       z_dtype=z_dtype)
        if self.spmd:
            mesh = self.device_mesh
            ax = self.axis_name
            specs_cap = extra_specs

            def spmd_impl(arrays, extra, f):
                res = impl(_squeeze_shard(arrays),
                           self._squeeze_extra(extra, specs_cap), f[0])
                return krylov.KrylovResult(
                    u=jax.tree.map(lambda x: x[None], res.u),
                    iterations=res.iterations,
                    residual_history=res.residual_history,
                    r0_norm=res.r0_norm, converged=res.converged)

            out_specs = krylov.KrylovResult(
                u=P(ax), iterations=P(), residual_history=P(),
                r0_norm=P(), converged=P())
            fn = jax.shard_map(spmd_impl, mesh=mesh,
                               in_specs=(_specs(ax, self.arrays), extra_specs, P(ax)),
                               out_specs=out_specs)
            # arrays/extra are jit *arguments*, not closure captures: a
            # captured device array becomes an XLA constant, and constant
            # folding over operator-sized constants stalls compilation
            jfn = jax.jit(fn)
            return lambda f: jfn(self.arrays, extra, f)
        jimpl = jax.jit(impl)
        return lambda f: jimpl(self.arrays, extra, f)

    # ---- fields and manufactured solutions ----

    def points_shape(self):
        """Host-field shape for this process: (owned shards, points)."""
        st = self.sharded
        if self.spmd:
            return (self.num_owned, st.points_per_shard)
        return (st.points_per_shard,)

    @property
    def field_shape(self):
        """Per-shard device field shape: the 3-D lattice for structured
        domains, flat points otherwise."""
        if self.lattice_shape is not None:
            return self.lattice_shape
        return (self.sharded.points_per_shard,)

    def to_device_field(self, host_field: np.ndarray):
        """Element-ordered host values (owned shards) -> device field in
        its natural shape (3-D lattice for structured domains; a global
        jax.Array in multi-process runs). Pad-element points are zeroed:
        device fields must be zero at padding (the face sum would
        otherwise leak pad values into real planes on ragged
        partitions)."""
        vals = np.asarray(host_field).reshape(self.num_owned, -1).copy()
        npe = self.sharded.num_points_per_elem
        vals[~np.repeat(self.sharded.elem_valid, npe, axis=1)] = 0.0
        if self.sharded.structured is not None:
            vals = np.stack([self._host_elem_to_lattice(v) for v in vals])
        return self.shard_put(vals, dtype=self.dtype)

    def from_device_field(self, u) -> np.ndarray:
        """Device field -> element-ordered host values for the OWNED
        shards, shape (len(owned), E*npe)."""
        if self.multiprocess:
            shards = sorted(u.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            vals = np.concatenate([np.asarray(s.data) for s in shards],
                                  axis=0)
        else:
            vals = np.asarray(u)
        vals = vals.reshape((self.num_owned,) + self.field_shape)
        if self.sharded.structured is not None:
            vals = np.stack([self._host_lattice_to_elem(v) for v in vals])
        return vals.reshape(self.num_owned, -1)

    def _jit_pointwise(self, name, run):
        """Cache a jitted (arrays, field) -> field function under `name`."""
        cache = self.__dict__.setdefault("_fn_cache", {})
        if name not in cache:
            if self.spmd:
                ax = self.axis_name
                fn = jax.shard_map(
                    lambda a, u: run(_squeeze_shard(a), u[0])[None],
                    mesh=self.device_mesh, in_specs=(_specs(ax, self.arrays), P(ax)),
                    out_specs=P(ax))
            else:
                fn = run
            cache[name] = jax.jit(fn)
        return cache[name]

    def dssum_field(self, u, apply_mask=True, apply_weight=False):
        """Standalone jitted dssum on a device field (setup utility)."""
        def run(arrays, u, _m=apply_mask, _w=apply_weight):
            _, dssum, _, _ = self._ops(arrays)
            return dssum(u, apply_mask=_m, apply_weight=_w)

        key = ("dssum", apply_mask, apply_weight)
        return self._jit_pointwise(key, run)(self.arrays, u)

    def apply_operator(self, u):
        """Standalone jitted local stiffness apply (for RHS manufacture)."""
        def run(arrays, u):
            operator, _, _, _ = self._ops(arrays)
            return operator(u)

        return self._jit_pointwise("operator", run)(self.arrays, u)

    def precond_probe(self, precond):
        """Jitted (r) -> (z, inner_history) for preconditioners exposing a
        ``.probe`` (the composite's inner FGMRES residuals — the
        reference's per-inner-iteration prints, subdomain.tpp:4430)."""
        builder, extra = precond.build, precond.extra
        specs = precond.extra_specs(self.axis_name) if self.spmd else None

        def impl(arrays, extra, r):
            ops = self._ops(arrays)
            fn = builder(arrays, extra, ops)
            if not hasattr(fn, "probe"):
                raise ValueError("preconditioner has no inner-solve probe")
            return fn.probe(r)

        if self.spmd:
            ax = self.axis_name

            def spmd_impl(arrays, extra, r):
                z, hist = impl(_squeeze_shard(arrays),
                               self._squeeze_extra(extra, specs), r[0])
                # rank-local inner histories differ per shard: report the
                # max (the reference prints per-rank logs; max matches
                # its timing-report aggregation convention)
                return z[None], jax.lax.pmax(hist, ax)

            fn = jax.jit(jax.shard_map(
                spmd_impl, mesh=self.device_mesh,
                in_specs=(_specs(ax, self.arrays), specs, P(ax)),
                out_specs=(P(ax), P())))
            return lambda r: fn(self.arrays, extra, r)
        jfn = jax.jit(impl)
        return lambda r: jfn(self.arrays, extra, r)

    def phase_chain(self, precond, kind: str, iters: int):
        """Jitted (f) -> scalar: ``iters`` chained applications of one
        solver region, for the device-measured phase taxonomy
        (runtime/phases.py; the reference's timed regions,
        poisson.cpp:259-358). Chains carry a loop dependency so XLA
        cannot hoist or overlap iterations; difference-time two chain
        lengths to cancel fixed dispatch/fetch costs.

        Outer kinds: 'nrm' (normalize = dot + scale, the measurement
        baseline), 'op' (operator+dssum), 'dssum'. Composite kinds (need
        a composite ``precond`` exposing ``.parts``): 'cnrm', 'comp_op',
        'comp_dssum', 'inner_precond', 'tree_cascade', 'tree_rhs', plus
        any extra part the preconditioner exposes (the inner='amg'
        composites add 'inner_smooth' / 'inner_transfer' /
        'inner_coarse' — the reference's V-cycle leg split,
        poisson.cpp:277-293; round 5 adds the tree-exchange sub-legs
        'tree_rings'/'tree_coarse' (structured) and 'tree_levels'
        (unstructured), and 'comp_assemble' — the gather half of the
        composite dssum, for the assemble-vs-unassemble row split of
        poisson.cpp:259-358).
        """
        builder = precond.build if precond is not None else None
        extra = precond.extra if precond is not None else None
        specs = (precond.extra_specs(self.axis_name)
                 if (precond is not None and self.spmd) else None)

        def impl(arrays, extra_x, f):
            operator, dssum, dot, dot2 = self._ops(arrays)
            parts = None
            if builder is not None:
                fn = builder(arrays, extra_x, (operator, dssum, dot, dot2))
                parts = getattr(fn, "parts", None)

            def nrm(x):
                s = dot(x, x)
                return x * jax.lax.rsqrt(s + 1e-30).astype(x.dtype)

            if kind in ("nrm", "op", "dssum"):
                step = {
                    "nrm": nrm,
                    "op": lambda x: nrm(dssum(operator(x))),
                    "dssum": lambda x: nrm(dssum(x)),
                }[kind]
                x = jax.lax.fori_loop(0, iters, lambda i, x: step(x), f)
                return dot(x, x).astype(jnp.float32)

            if parts is None:
                raise ValueError(f"phase kind {kind!r} needs a composite "
                                 "preconditioner exposing .parts")

            if kind in ("tree_cascade", "tree_rhs", "tree_rings",
                        "tree_coarse", "tree_levels"):
                part = parts[kind]

                def body(i, carry):
                    x, acc = carry
                    # one-element loop dependency (cheap, un-hoistable)
                    idx = (0,) * x.ndim
                    x = x.at[idx].add((1e-30 * acc).astype(x.dtype))
                    out = part(x)
                    return (x, out[0].reshape(-1)[0].astype(f.dtype))

                # seed acc from f so it carries the shard-varying vma
                # type the loop body produces (shard_map scan requirement)
                acc0 = f.reshape(-1)[0] * 0.0
                _, acc = jax.lax.fori_loop(0, iters, body, (f, acc0))
                return acc.astype(jnp.float32)

            # composite-space chains: carry the composite parts pytree
            def cnrm(x):
                s = krylov.tree_dot(x, x).astype(jnp.float32)
                sc = jax.lax.rsqrt(s + 1e-30)
                return jax.tree.map(
                    lambda u: u * sc.astype(u.dtype), x)

            if kind == "cnrm":
                step = cnrm
            else:
                part_name = {"comp_op": "comp_operator"}.get(kind, kind)
                if part_name not in parts:
                    raise ValueError(
                        f"phase kind {kind!r}: preconditioner exposes "
                        f"{sorted(parts)}")
                part = parts[part_name]
                step = lambda x: cnrm(part(x))
            x0 = parts["tree_rhs"](f)
            x = jax.lax.fori_loop(0, iters, lambda i, x: step(x), x0)
            return krylov.tree_dot(x, x).astype(jnp.float32)

        cache = self.__dict__.setdefault("_fn_cache", {})
        # key on id() but PIN the precond in the value: a bare id can be
        # reused after garbage collection and would serve a stale chain
        key = ("phase_chain", id(precond), kind, iters)
        if key in cache and cache[key][0] is not precond:
            del cache[key]
        if key not in cache:
            if self.spmd:
                ax = self.axis_name

                def spmd_impl(arrays, extra_x, f):
                    s = impl(_squeeze_shard(arrays),
                             self._squeeze_extra(extra_x, specs), f[0])
                    return jax.lax.pmax(s, ax)

                cache[key] = (precond, jax.jit(jax.shard_map(
                    spmd_impl, mesh=self.device_mesh,
                    in_specs=(_specs(ax, self.arrays), specs, P(ax)),
                    out_specs=P())))
            else:
                cache[key] = (precond, jax.jit(impl))
        jfn = cache[key][1]
        return lambda f: jfn(self.arrays, extra, f)

    def residual(self, u, f):
        """(r, ||r||): non-assembled residual and its assembled norm
        sqrt(<r, QQt r>) — the solvers' convergence metric
        (domain.tpp:916-931). Jitted and cached; used by the
        iterative-refinement wrapper and observability tooling."""
        def run_local(arrays, u, f):
            operator, dssum, dot, _ = self._ops(arrays)
            r = f - operator(u)
            rn = jnp.sqrt(jnp.maximum(
                dot(r, dssum(r, apply_mask=True, apply_weight=False)), 0.0))
            return r, rn

        cache = self.__dict__.setdefault("_fn_cache", {})
        if "residual" not in cache:
            if self.spmd:
                ax = self.axis_name

                def fn(a, u, f):
                    r, rn = run_local(_squeeze_shard(a), u[0], f[0])
                    return r[None], rn

                out_specs = (P(ax), P())
                cache["residual"] = jax.jit(jax.shard_map(
                    fn, mesh=self.device_mesh,
                    in_specs=(_specs(ax, self.arrays), P(ax), P(ax)),
                    out_specs=out_specs))
            else:
                cache["residual"] = jax.jit(run_local)
        return cache["residual"](self.arrays, u, f)

    def _global_random_points(self, seed: int) -> np.ndarray:
        """Random values drawn in GLOBAL element order and scattered into
        the padded per-shard layout (zeros at pads) — the field must be
        partition-invariant (and process-invariant in multi-host runs),
        and pad elements interleaved between shards would otherwise shift
        the stream."""
        st = self.sharded
        npe = st.num_points_per_elem
        rng = np.random.default_rng(seed)
        flat = rng.random(st.num_total_elements * npe)
        out = np.zeros((self.num_owned, st.elems_per_shard * npe))
        for k, p in enumerate(st.owned):
            lo, hi = st.elem_offsets[p], st.elem_offsets[p + 1]
            out[k, :(hi - lo) * npe] = flat[lo * npe:hi * npe]
        return out.reshape(-1)

    def initial_function(self, function_id: int = 0, seed: int = 0):
        """Manufactured solutions ids 0-4 (domain.tpp:527-580), made
        continuous and masked exactly like the reference (dssum with
        Dirichlet mask and inverse-multiplicity weight, domain.tpp:579)."""
        st = self.sharded
        c = st.coords.reshape(-1, st.coords.shape[-1])
        x = c[:, 0]
        y = c[:, 1] if self.dim >= 2 else None
        z = c[:, 2] if self.dim >= 3 else None
        pi = np.pi
        base = np.sin(pi * x) * np.sin(pi * y)
        if self.dim == 3:
            base = base * np.sin(pi * z)
        if function_id == 0:
            vals = base
        elif function_id == 1:
            extra = np.sin(2 * pi * x) * np.sin(pi * y)
            if self.dim == 3:
                extra = extra * np.sin(pi * z)
            vals = base + extra
        elif function_id == 2:
            vals = np.exp(x) * base
        elif function_id == 3:
            vals = base + 0.2 * self._global_random_points(seed)
        elif function_id == 4:
            vals = self._global_random_points(seed)
        else:
            raise ValueError(f"unknown function id {function_id}")
        u = self.to_device_field(vals.reshape(self.num_owned, -1))
        return self.dssum_field(u, apply_mask=True, apply_weight=True)

    def manufacture_rhs(self, u_star):
        """f = A u* (local apply, no dssum), as poisson.cpp:218-219."""
        return self.apply_operator(u_star)
