"""Structured spectral-element mesh generation (box and Kershaw meshes).

The reference reads per-rank Nek5000-exported binaries
(/root/reference/domain.tpp:44-231: size, x/y/z, glo_num, node_degree,
p_mask, g_1..g_6). Those meshes are external data we do not have, so this
module *generates* the same nine per-element arrays from scratch for
tensor-product box meshes, optionally warped by the standard Kershaw
transformation (the reference's benchmark family, run.py:24-37).

Everything here is host-side float64 numpy; device conversion happens in
the solver setup.

Local intra-element ordering matches the reference: arrays are stored
(..., n_z, n_y, n_x) so that raveling gives ``v = i + j*n + k*n^2`` with
the x-index fastest (domain.okl:17-18, 32-34).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..utils.gll import gll_points_weights, diff_matrix

__all__ = ["GlobalMesh", "box_mesh", "kershaw_mesh", "geometric_factors",
           "scramble_mesh"]


@dataclass
class GlobalMesh:
    """A complete spectral-element mesh, all elements, one address space.

    Per-element arrays use local ordering v = i + j*n (+ k*n^2), x fastest.
    ``geom`` holds the g_1..g_{3 or 6} factors of the reference
    (element.hpp:42, NUM_GEOM_FACTS): in 2D [G_rr, G_ss, G_rs], in 3D
    [G_rr, G_ss, G_tt, G_rs, G_rt, G_st], with GLL quadrature weights and
    |J| folded in, exactly as consumed by the stiffness kernels
    (domain.okl:29-49).
    """

    dim: int
    poly_degree: int
    elem_shape: tuple[int, ...]       # elements per dimension (mx, my[, mz])
    coords: np.ndarray                # (E, npe, dim) nodal coordinates
    glo_num: np.ndarray               # (E, npe) int64 global node ids, 0-based
    node_degree: np.ndarray           # (E, npe) int32 global multiplicity
    dirichlet_mask: np.ndarray        # (E, npe) float, 0.0 on Dirichlet boundary
    geom: np.ndarray                  # (E, npe, num_geom) geometric factors
    mass: np.ndarray                  # (E, npe) diagonal GLL mass w * |J|
    structured_layout: bool = True    # elements stored in slab (lattice) order

    @property
    def num_elements(self) -> int:
        return self.coords.shape[0]

    @property
    def num_points_per_elem(self) -> int:
        return self.coords.shape[1]

    @property
    def num_points(self) -> int:
        return self.coords.shape[0] * self.coords.shape[1]

    @property
    def num_nodes(self) -> int:
        return int(self.glo_num.max()) + 1

    @property
    def num_geom(self) -> int:
        return self.geom.shape[-1]


def _reference_coords(elem_shape, poly_degree):
    """Unit-box nodal coordinates and global numbering for a structured mesh.

    Returns (coords_axes, glo_num) where coords_axes is a list of per-dim
    (E, n_z, n_y, n_x)-shaped nodal coordinates in [0, 1].
    """
    dim = len(elem_shape)
    n = poly_degree + 1
    r, _ = gll_points_weights(n)
    t = (r + 1.0) / 2.0  # GLL nodes mapped to [0, 1]

    # per-dimension 1-D nodal positions for every element column
    axes_1d = []
    for m in elem_shape:
        # (m, n): axis position of node i of element e
        axes_1d.append((np.arange(m)[:, None] + t[None, :]) / m)

    # per-dimension global 1-D node index (shared at element interfaces)
    gidx_1d = [np.arange(m)[:, None] * poly_degree + np.arange(n)[None, :]
               for m in elem_shape]
    gdims = [m * poly_degree + 1 for m in elem_shape]

    # element ordering: x fastest (e = ex + ey*mx + ez*mx*my), i.e. a
    # row-major ravel of the (ez, ey, ex) lattice — so contiguous element
    # ranges are slabs of the last dimension (the SPMD partition unit)
    rev = np.indices(tuple(reversed(elem_shape)))
    elem_multi = [rev[dim - 1 - d].reshape(-1) for d in range(dim)]

    E = int(np.prod(elem_shape))
    shape_local = (n,) * dim  # (n_z, n_y, n_x) storage order

    coords_axes = [np.empty((E,) + shape_local) for _ in range(dim)]
    glo_num = np.empty((E,) + shape_local, dtype=np.int64)

    # build with broadcasting: for dim d, local axis position in storage
    # order is axis (dim-1-d): x varies along the last storage axis.
    for d in range(dim):
        ax = axes_1d[d]  # (m_d, n)
        per_elem = ax[elem_multi[d]]  # (E, n)
        shp = [1] * dim
        shp[dim - 1 - d] = n
        coords_axes[d][:] = per_elem.reshape((E,) + tuple(shp))

    g_parts = []
    stride = 1
    for d in range(dim):
        gi = gidx_1d[d][elem_multi[d]]  # (E, n) global 1-D index along dim d
        shp = [1] * dim
        shp[dim - 1 - d] = n
        g_parts.append(gi.reshape((E,) + tuple(shp)) * stride)
        stride *= gdims[d]
    glo_num[:] = sum(g_parts)

    return coords_axes, glo_num, gdims


def _kershaw_right(eps, x):
    return np.where(x <= 0.5, (2.0 - eps) * x, 1.0 + eps * (x - 1.0))


def _kershaw_left(eps, x):
    return 1.0 - _kershaw_right(eps, 1.0 - x)


def _kershaw_step(a, b, x):
    x = np.clip(x, 0.0, 1.0)
    s = x * x * x * (x * (6.0 * x - 15.0) + 10.0)  # smootherstep
    return a + (b - a) * s


def kershaw_transform(eps_y, eps_z, x, y, z=None):
    """The standard 6-layer Kershaw warp of the unit box (the mesh family
    of the reference's benchmarks, run.py:24-49; construction follows the
    public CEED/MFEM definition)."""
    layer = np.minimum((x * 6.0).astype(np.int64), 5)
    lam = x * 6.0 - layer

    def warp(eps, c):
        lo, hi = _kershaw_left(eps, c), _kershaw_right(eps, c)
        out = np.where(layer == 0, lo, 0.0)
        out = np.where((layer == 1) | (layer == 4), _kershaw_step(lo, hi, lam), out)
        out = np.where(layer == 2, _kershaw_step(hi, lo, lam / 2.0), out)
        out = np.where(layer == 3, _kershaw_step(hi, lo, (1.0 + lam) / 2.0), out)
        out = np.where(layer == 5, hi, out)
        return out

    Y = warp(eps_y, y)
    Z = warp(eps_z, z) if z is not None else None
    return x, Y, Z


def geometric_factors(coords: np.ndarray, dim: int, poly_degree: int,
                      chunk: int = 8192) -> tuple[np.ndarray, np.ndarray]:
    """Compute the SEM geometric factors G = w |J| (J^{-1} J^{-T}).

    ``coords`` is (E, npe, dim). Returns ``(geom, mass)``: geom is
    (E, npe, 3) in 2D or (E, npe, 6) in 3D, ordered as the reference's
    g_1..g_6 (domain.okl:29-49): 2D [G_rr, G_ss, G_rs]; 3D [G_rr, G_ss,
    G_tt, G_rs, G_rt, G_st]; mass is the (E, npe) lumped mass w |J|.

    Runs as a single fused XLA kernel in float64, chunked over elements
    (the host here has ONE core: the numpy form was the dominant mesh-
    setup cost at production sizes — ~1000 s for Kershaw 64^3; XLA fuses
    the Jacobian/adjugate arithmetic into one pass). The kernel is pinned
    to the CPU backend: setup needs f64, which the TPU-class default
    device does not compile. Falls back to the numpy reference
    implementation only if JAX is unavailable.
    """
    try:
        return _geometric_factors_xla(coords, dim, poly_degree, chunk)
    except ImportError:                             # pragma: no cover
        import warnings
        warnings.warn("JAX unavailable: mesh setup falling back to the "
                      "slow numpy geometric-factors path")
        return _geometric_factors_np(coords, dim, poly_degree)


def _cpu_x64():
    """f64 on the CPU backend: setup kernels need double precision and
    the TPU-class default device does not support it (ADVICE r2)."""
    import contextlib
    import jax
    stack = contextlib.ExitStack()
    stack.enter_context(jax.enable_x64(True))
    # local_devices, not devices: under jax.distributed the global list
    # starts with process 0's devices, and pinning another process's
    # setup to a non-addressable device deadlocks the gloo handshake
    stack.enter_context(jax.default_device(
        jax.local_devices(backend="cpu")[0]))
    return stack


def _geometric_factors_xla(coords, dim, poly_degree, chunk):
    import jax
    import jax.numpy as jnp

    n = poly_degree + 1
    E = coords.shape[0]
    ng = 3 if dim == 2 else 6
    D = diff_matrix(n)
    _, w = gll_points_weights(n)
    wq = w
    for _ in range(dim - 1):
        wq = np.multiply.outer(w, wq)
    shape_local = (n,) * dim

    with _cpu_x64():
        Dt = jnp.asarray(D.T, dtype=jnp.float64)
        wq_d = jnp.asarray(wq, dtype=jnp.float64)

        @jax.jit
        def kernel(X):
            # X: (C, n[,n[,n]], dim) float64 — same arithmetic order as
            # the numpy reference (_geometric_factors_np) below
            def deriv_along(F, axis):
                G = jnp.tensordot(F, Dt, axes=([axis], [0]),
                                  precision=jax.lax.Precision.HIGHEST)
                return jnp.moveaxis(G, -1, axis)

            cols = []
            for a in range(dim):
                axis = 1 + (dim - 1 - a)
                cols.append(deriv_along(X, axis))
            J = jnp.stack(cols, axis=-1)           # (..., d, a)
            if dim == 2:
                a_, b_ = J[..., 0, 0], J[..., 0, 1]
                c_, d_ = J[..., 1, 0], J[..., 1, 1]
                detJ = a_ * d_ - b_ * c_
                Jinv = jnp.stack([
                    jnp.stack([d_, -b_], axis=-1),
                    jnp.stack([-c_, a_], axis=-1)], axis=-2)
            else:
                c00 = J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1]
                c01 = J[..., 1, 2] * J[..., 2, 0] - J[..., 1, 0] * J[..., 2, 2]
                c02 = J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0]
                detJ = (J[..., 0, 0] * c00 + J[..., 0, 1] * c01
                        + J[..., 0, 2] * c02)
                r0 = jnp.stack([
                    c00,
                    J[..., 0, 2] * J[..., 2, 1] - J[..., 0, 1] * J[..., 2, 2],
                    J[..., 0, 1] * J[..., 1, 2] - J[..., 0, 2] * J[..., 1, 1],
                ], axis=-1)
                r1 = jnp.stack([
                    c01,
                    J[..., 0, 0] * J[..., 2, 2] - J[..., 0, 2] * J[..., 2, 0],
                    J[..., 0, 2] * J[..., 1, 0] - J[..., 0, 0] * J[..., 1, 2],
                ], axis=-1)
                r2 = jnp.stack([
                    c02,
                    J[..., 0, 1] * J[..., 2, 0] - J[..., 0, 0] * J[..., 2, 1],
                    J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0],
                ], axis=-1)
                Jinv = jnp.stack([r0, r1, r2], axis=-2)
            Jinv = Jinv / detJ[..., None, None]
            Gfull = jnp.einsum("...ad,...bd->...ab", Jinv, Jinv,
                               precision=jax.lax.Precision.HIGHEST)
            Gfull = Gfull * detJ[..., None, None]
            Gfull = Gfull * wq_d[None, ..., None, None]
            if dim == 2:
                pairs = [(0, 0), (1, 1), (0, 1)]
            else:
                pairs = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
            g = jnp.stack([Gfull[..., a, b] for a, b in pairs], axis=-1)
            mass = wq_d[None] * detJ
            C = X.shape[0]
            return (g.reshape(C, n ** dim, len(pairs)),
                    mass.reshape(C, n ** dim))

        g_out = np.empty((E, n ** dim, ng))
        m_out = np.empty((E, n ** dim))
        Xall = coords.reshape((E,) + shape_local + (dim,))
        for s in range(0, E, chunk):
            e = min(s + chunk, E)
            gs_, ms_ = kernel(jnp.asarray(Xall[s:e], dtype=jnp.float64))
            g_out[s:e] = np.asarray(gs_)
            m_out[s:e] = np.asarray(ms_)
    return g_out, m_out


def _geometric_factors_np(coords: np.ndarray, dim: int,
                          poly_degree: int) -> np.ndarray:
    """Numpy reference implementation of :func:`geometric_factors` (kept
    as the fallback and the cross-check oracle for the XLA kernel)."""
    n = poly_degree + 1
    E = coords.shape[0]
    D = diff_matrix(n)
    _, w = gll_points_weights(n)
    shape_local = (n,) * dim
    X = coords.reshape((E,) + shape_local + (dim,))

    # Jacobian J[e, ..., d, a] = d x_d / d r_a; r_a is the a-th reference
    # coordinate: a=0 (r, along x-storage = last axis), a=1 (s), a=2 (t).
    def deriv_along(F, axis):
        # (D @ u) along a given axis: sum_k D[i,k] F[..., k, ...]
        G = np.tensordot(F, D.T, axes=([axis], [0]))
        return np.moveaxis(G, -1, axis)

    J = np.empty((E,) + shape_local + (dim, dim))
    for a in range(dim):
        axis = 1 + (dim - 1 - a)  # storage axis for reference direction a
        J[..., :, a] = deriv_along(X, axis)

    # closed-form batched det/inverse (vectorized adjugate): stacked
    # np.linalg.inv dispatches LAPACK per 2x2/3x3 matrix and dominated
    # the mesh-setup time at production sizes
    if dim == 2:
        a, b = J[..., 0, 0], J[..., 0, 1]
        c, d = J[..., 1, 0], J[..., 1, 1]
        detJ = a * d - b * c
        Jinv = np.empty_like(J)
        Jinv[..., 0, 0] = d
        Jinv[..., 0, 1] = -b
        Jinv[..., 1, 0] = -c
        Jinv[..., 1, 1] = a
        Jinv /= detJ[..., None, None]
    else:
        c00 = J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1]
        c01 = J[..., 1, 2] * J[..., 2, 0] - J[..., 1, 0] * J[..., 2, 2]
        c02 = J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0]
        detJ = (J[..., 0, 0] * c00 + J[..., 0, 1] * c01
                + J[..., 0, 2] * c02)
        Jinv = np.empty_like(J)
        Jinv[..., 0, 0] = c00
        Jinv[..., 1, 0] = c01
        Jinv[..., 2, 0] = c02
        Jinv[..., 0, 1] = (J[..., 0, 2] * J[..., 2, 1]
                           - J[..., 0, 1] * J[..., 2, 2])
        Jinv[..., 1, 1] = (J[..., 0, 0] * J[..., 2, 2]
                           - J[..., 0, 2] * J[..., 2, 0])
        Jinv[..., 2, 1] = (J[..., 0, 1] * J[..., 2, 0]
                           - J[..., 0, 0] * J[..., 2, 1])
        Jinv[..., 0, 2] = (J[..., 0, 1] * J[..., 1, 2]
                           - J[..., 0, 2] * J[..., 1, 1])
        Jinv[..., 1, 2] = (J[..., 0, 2] * J[..., 1, 0]
                           - J[..., 0, 0] * J[..., 1, 2])
        Jinv[..., 2, 2] = (J[..., 0, 0] * J[..., 1, 1]
                           - J[..., 0, 1] * J[..., 1, 0])
        Jinv /= detJ[..., None, None]
    Gfull = np.einsum("...ad,...bd->...ab", Jinv, Jinv) * detJ[..., None, None]

    wq = w
    for _ in range(dim - 1):
        wq = np.multiply.outer(w, wq)  # (n_z, n_y, n_x) product weights
    Gfull *= wq[None, ..., None, None]

    if dim == 2:
        pairs = [(0, 0), (1, 1), (0, 1)]
    else:
        pairs = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]
    g = np.stack([Gfull[..., a, b] for a, b in pairs], axis=-1)
    mass = (wq[None] * detJ).reshape(E, n ** dim)
    return g.reshape(E, n ** dim, len(pairs)), mass


def _trilinear_nodes(elem_shape, poly_degree, vertex_transform):
    """Nodal coordinates for a vertex-warped mesh.

    The warp is applied to element *vertices* only; interior GLL nodes are
    placed by d-linear interpolation, so every element is a (bi/tri)linear
    hex with a smooth, invertible isoparametric map even when the warp has
    kinks inside an element (the Kershaw map is piecewise linear).
    """
    dim = len(elem_shape)
    n = poly_degree + 1
    from ..utils.gll import gll_points_weights
    r, _ = gll_points_weights(n)
    t = (r + 1.0) / 2.0
    blend = np.stack([1.0 - t, t], axis=0)  # (2, n)

    # lattice of warped vertices: (m_0+1, ..., m_{dim-1}+1, dim) in ij order
    grids = np.meshgrid(*[np.arange(m + 1) / m for m in elem_shape],
                        indexing="ij")
    if dim == 2:
        vx, vy = grids
        wx, wy, _ = vertex_transform(vx, vy, None)
        verts = np.stack([wx, wy], axis=-1)
    else:
        vx, vy, vz = grids
        wx, wy, wz = vertex_transform(vx, vy, vz)
        verts = np.stack([wx, wy, wz], axis=-1)

    rev = np.indices(tuple(reversed(elem_shape)))
    emulti = [rev[dim - 1 - d].reshape(-1) for d in range(dim)]
    E = int(np.prod(elem_shape))

    # corner coords per element: (E,) + (2,)*dim + (dim,)
    corner_idx = np.meshgrid(*([np.arange(2)] * dim), indexing="ij")
    corners = np.empty((E,) + (2,) * dim + (dim,))
    it = np.ndindex(*(2,) * dim)
    for c in it:
        sel = tuple(emulti[d] + c[d] for d in range(dim))
        corners[(slice(None),) + c] = verts[sel]

    # d-linear blend to GLL nodes, storage order (E, n_z, n_y, n_x, dim);
    # one fused XLA kernel chunked over elements (single-core host: the
    # numpy tensordot/transpose chain was a top mesh-setup cost)
    try:
        return _blend_corners_xla(corners, blend, dim, n)
    except ImportError:                             # pragma: no cover
        import warnings
        warnings.warn("JAX unavailable: mesh setup falling back to the "
                      "slow numpy corner-blend path")
        return _blend_corners_np(corners, blend, dim, n)


def _blend_corners_np(corners, blend, dim, n):
    E = corners.shape[0]
    out = corners
    for d in range(dim):
        # contract corner axis for dimension d with blend along that axis;
        # corner axis order matches dims (x, y, z); storage axis for dim d
        # in the output should be (dim-1-d)
        out = np.tensordot(out, blend, axes=([1], [0]))
        # tensordot appends the n-axis at the end; we will reorder below
    # out now has shape (E, dim, n_x, n_y[, n_z]) -> wait: corner axes were
    # consumed left-to-right, appended axes are (n for x, n for y, n for z)
    # after the trailing coordinate axis. Reorder to (E, n_z, n_y, n_x, dim).
    if dim == 2:
        out = np.transpose(out, (0, 3, 2, 1))  # (E, n_y, n_x, dim)
    else:
        out = np.transpose(out, (0, 4, 3, 2, 1))  # (E, n_z, n_y, n_x, dim)
    return out.reshape(E, n ** dim, dim)


def _blend_corners_xla(corners, blend, dim, n, chunk: int = 16384):
    import jax
    import jax.numpy as jnp

    E = corners.shape[0]
    with _cpu_x64():
        B = jnp.asarray(blend, dtype=jnp.float64)

        @jax.jit
        def kernel(C):
            out = C
            for _ in range(dim):
                out = jnp.tensordot(out, B, axes=([1], [0]),
                                    precision=jax.lax.Precision.HIGHEST)
            perm = (0, 3, 2, 1) if dim == 2 else (0, 4, 3, 2, 1)
            out = jnp.transpose(out, perm)
            return out.reshape(out.shape[0], n ** dim, dim)

        res = np.empty((E, n ** dim, dim))
        for s in range(0, E, chunk):
            e = min(s + chunk, E)
            res[s:e] = np.asarray(
                kernel(jnp.asarray(corners[s:e], dtype=jnp.float64)))
    return res


def _build(elem_shape, poly_degree, transform=None, vertex_transform=None) -> GlobalMesh:
    dim = len(elem_shape)
    n = poly_degree + 1
    npe = n ** dim
    coords_axes, glo_num, gdims = _reference_coords(elem_shape, poly_degree)
    E = glo_num.shape[0]

    if transform is not None:
        coords_axes = transform(coords_axes)

    if vertex_transform is not None:
        coords = _trilinear_nodes(elem_shape, poly_degree, vertex_transform)
    else:
        coords = np.stack([c.reshape(E, npe) for c in coords_axes], axis=-1)
    glo_flat = glo_num.reshape(E, npe)

    degree_global = np.bincount(glo_flat.ravel(), minlength=int(glo_flat.max()) + 1)
    node_degree = degree_global[glo_flat].astype(np.int32)

    # Dirichlet on the whole outer boundary (the reference's p_mask comes
    # from Nek5000 with the same convention: 0 on boundary nodes).
    gids = glo_flat.copy()
    mask = np.ones((E, npe))
    for d in range(dim):
        gi = gids % gdims[d]
        mask *= (gi != 0) & (gi != gdims[d] - 1)
        gids //= gdims[d]

    geom, mass = geometric_factors(coords, dim, poly_degree)
    return GlobalMesh(
        dim=dim,
        poly_degree=poly_degree,
        elem_shape=tuple(elem_shape),
        coords=coords,
        glo_num=glo_flat,
        node_degree=node_degree,
        dirichlet_mask=mask,
        geom=geom,
        mass=mass,
    )


def box_mesh(elem_shape, poly_degree, extent=None) -> GlobalMesh:
    """Uniform box mesh of [0,e_0] x [0,e_1] (x [0,e_2]); the unit
    square/cube when ``extent`` is None. A non-unit extent keeps elements
    isotropic when the element grid is elongated (the weak-scaling
    scenario: grow the domain with the shard count)."""
    elem_shape = tuple(elem_shape)
    if extent is None:
        return _build(elem_shape, poly_degree)
    extent = tuple(extent)

    def transform(axes):
        return [a * e for a, e in zip(axes, extent)]

    return _build(elem_shape, poly_degree, transform=transform)


def kershaw_mesh(elem_shape, poly_degree, epsilon=0.3,
                 extent=None) -> GlobalMesh:
    """Kershaw-warped box mesh (reference benchmark meshes, run.py:24-49).

    epsilon=1.0 gives the uniform box; smaller epsilon gives higher
    distortion (the reference sweeps 1.0 and 0.3). ``extent`` scales the
    physical domain after the warp (see box_mesh).
    """
    elem_shape = tuple(elem_shape)
    ext = tuple(extent) if extent is not None else None

    def vtransform(x, y, z):
        X, Y, Z = kershaw_transform(epsilon, epsilon, x, y, z)
        if ext is not None:
            X = X * ext[0]
            Y = Y * ext[1]
            if Z is not None:
                Z = Z * ext[2]
        return X, Y, Z

    return _build(elem_shape, poly_degree, vertex_transform=vtransform)


# ---------------------------------------------------------------------------
# unstructured-connectivity scrambling


def _proper_rotations(dim: int):
    """All orientation-preserving symmetries of the square (4) / cube (24)
    as (axis_perm, flip) pairs acting on local (z, y, x) index tuples."""
    import itertools
    rots = []
    for perm in itertools.permutations(range(dim)):
        for flips in itertools.product((False, True), repeat=dim):
            # determinant of the signed permutation must be +1
            sign = 1
            # permutation parity
            seen = [False] * dim
            for i in range(dim):
                if seen[i]:
                    continue
                j, clen = i, 0
                while not seen[j]:
                    seen[j] = True
                    j = perm[j]
                    clen += 1
                if clen % 2 == 0:
                    sign = -sign
            for f in flips:
                if f:
                    sign = -sign
            if sign == 1:
                rots.append((perm, flips))
    return rots


def _rotation_node_perm(perm, flips, n: int, dim: int) -> np.ndarray:
    """Node permutation P with new_data[P] = old_data, i.e.
    new_data[v'] = old_data[v] where v' is v's rotated position."""
    idx = np.indices((n,) * dim).reshape(dim, -1)      # old (z, y, x)
    new_idx = np.empty_like(idx)
    for d in range(dim):
        src = idx[perm[d]]
        new_idx[d] = (n - 1 - src) if flips[d] else src
    # flatten new position (x fastest = last axis)
    vnew = np.zeros(idx.shape[1], dtype=np.int64)
    for d in range(dim):
        vnew = vnew * n + new_idx[d]
    out = np.empty(n ** dim, dtype=np.int64)
    out[vnew] = np.arange(n ** dim)
    return out


def scramble_mesh(mesh: GlobalMesh, seed: int = 0,
                  permute: bool = True) -> GlobalMesh:
    """Destroy the structured element layout: random element permutation +
    a random proper rotation of every element's local frame. With
    permute=False only the local frames rotate — elements keep their
    spatial order, so contiguous partitions stay localized (like real
    Nek5000 partitions) while neighbor orientations are still arbitrary.

    The result is a genuinely unstructured-connectivity hex mesh (like the
    reference's Nek5000 pebble-bed exports, run.py:51-79, where neighbor
    elements meet with arbitrary relative orientations and the element
    order carries no geometric meaning) while keeping the exact geometry —
    so solutions are comparable against the structured original.

    The scramble decisions depend only on (num_elements, seed), NOT the
    polynomial order: calling scramble_mesh(mesh_builder(o), seed) for
    different o yields element-wise consistent meshes, as the composite
    setup requires of its mesh_builder.
    """
    dim = mesh.dim
    n = mesh.poly_degree + 1
    E = mesh.num_elements
    rng = np.random.default_rng(seed)
    elem_perm = rng.permutation(E) if permute else np.arange(E)
    rots = _proper_rotations(dim)
    rot_choice = rng.integers(0, len(rots), size=E)

    node_perms = [_rotation_node_perm(p, f, n, dim) for p, f in rots]

    def take(arr):
        out = np.empty_like(arr[elem_perm])
        for e in range(E):
            src = arr[elem_perm[e]]
            out[e] = src[node_perms[rot_choice[elem_perm[e]]]]
        return out

    coords = take(mesh.coords)
    geom, mass = geometric_factors(coords, dim, mesh.poly_degree)
    return GlobalMesh(
        dim=dim,
        poly_degree=mesh.poly_degree,
        elem_shape=mesh.elem_shape,
        coords=coords,
        glo_num=take(mesh.glo_num),
        node_degree=take(mesh.node_degree),
        dirichlet_mask=take(mesh.dirichlet_mask),
        geom=geom,
        mass=mass,
        structured_layout=False,
    )
