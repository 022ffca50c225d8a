"""Mesh generator invariants (the replacement for Nek5000 mesh exports)."""

import numpy as np
import pytest

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh


@pytest.mark.parametrize("shape,N", [((3, 2), 3), ((2, 2, 2), 2), ((2, 3, 4), 3)])
def test_shared_nodes_have_equal_coords(shape, N):
    mesh = mg.box_mesh(shape, N)
    gids = mesh.glo_num.ravel()
    coords = mesh.coords.reshape(-1, mesh.dim)
    order = np.argsort(gids, kind="stable")
    gs, cs = gids[order], coords[order]
    same = gs[1:] == gs[:-1]
    assert np.max(np.abs(cs[1:][same] - cs[:-1][same])) < 1e-12


def test_node_degree_counts():
    mesh = mg.box_mesh((2, 2), 2)
    # corner node shared by 4 elements has degree 4
    counts = np.bincount(mesh.glo_num.ravel())
    assert counts.max() == 4
    assert np.all(mesh.node_degree.ravel() ==
                  counts[mesh.glo_num.ravel()])


def test_dirichlet_mask_boundary_only():
    mesh = mg.box_mesh((3, 3), 3)
    coords = mesh.coords.reshape(-1, 2)
    on_bd = ((np.abs(coords[:, 0]) < 1e-12) | (np.abs(coords[:, 0] - 1) < 1e-12)
             | (np.abs(coords[:, 1]) < 1e-12) | (np.abs(coords[:, 1] - 1) < 1e-12))
    mask = mesh.dirichlet_mask.ravel()
    assert np.all(mask[on_bd] == 0.0)
    assert np.all(mask[~on_bd] == 1.0)


@pytest.mark.parametrize("dim", [2, 3])
def test_geometric_factors_affine_box(dim):
    # uniform box: J = diag(h/2), G_aa = w * |J| * (2/h)^2, off-diag = 0
    shape = (2,) * dim
    N = 4
    mesh = mg.box_mesh(shape, N)
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.utils.gll import gll_points_weights
    _, w = gll_points_weights(N + 1)
    h = 1.0 / shape[0]
    detJ = (h / 2) ** dim
    wq = w
    for _ in range(dim - 1):
        wq = np.multiply.outer(w, wq)
    expected_diag = wq.ravel() * detJ * (2 / h) ** 2
    for d in range(dim):
        np.testing.assert_allclose(mesh.geom[0, :, d], expected_diag,
                                   atol=1e-13)
    for d in range(dim, mesh.num_geom):
        assert np.max(np.abs(mesh.geom[0, :, d])) < 1e-13
    np.testing.assert_allclose(mesh.mass[0], wq.ravel() * detJ, atol=1e-14)


def test_mass_sums_to_volume():
    for build, vol in [(lambda: mg.box_mesh((3, 2), 4), 1.0),
                       (lambda: mg.kershaw_mesh((6, 6), 3, 0.3), 1.0),
                       (lambda: mg.kershaw_mesh((6, 6, 6), 2, 0.3), 1.0)]:
        mesh = build()
        assert abs(mesh.mass.sum() - vol) < 1e-10


def test_kershaw_is_valid_mesh():
    mesh = mg.kershaw_mesh((6, 6, 6), 2, epsilon=0.3)
    # positive Jacobian everywhere (mass = w |J| > 0)
    assert mesh.mass.min() > 0
    # still matches at shared nodes
    gids = mesh.glo_num.ravel()
    coords = mesh.coords.reshape(-1, 3)
    order = np.argsort(gids, kind="stable")
    gs, cs = gids[order], coords[order]
    same = gs[1:] == gs[:-1]
    assert np.max(np.abs(cs[1:][same] - cs[:-1][same])) < 1e-12


@pytest.mark.parametrize("P", [1, 3, 8])
def test_partition_roundtrip(P):
    mesh = mg.box_mesh((4, 4), 3)
    sd = partition_mesh(mesh, P)
    assert sd.num_shards == P
    assert sd.elem_valid.sum() == mesh.num_elements
    # every real point's gather id maps to a valid node
    for p in range(P):
        ids = sd.gather_ids[p]
        real = sd.elem_valid[p].repeat(mesh.num_points_per_elem)
        assert np.all(ids[real] < sd.num_local_nodes)
        assert np.all(ids[~real] == sd.num_local_nodes)
    # interface nodes: each appears in >= 2 shards
    if P > 1:
        assert sd.num_boundary_global > 0


def test_partition_boundary_detection_matches_degree_rule():
    # the reference's rule: a node is boundary iff local multiplicity
    # != global multiplicity (domain.tpp:253-267)
    mesh = mg.box_mesh((4, 2), 2)
    P = 4
    sd = partition_mesh(mesh, P)
    npe = mesh.num_points_per_elem
    counts_global = np.bincount(mesh.glo_num.ravel())
    for p in range(P):
        valid = sd.elem_valid[p]
        gids = sd.glo_num[p][valid].ravel()
        uniq, cnt = np.unique(gids, return_counts=True)
        is_bd_ref = cnt != counts_global[uniq]
        nb = (sd.bnode_local[p] < sd.num_local_nodes).sum()
        assert nb == is_bd_ref.sum()


def test_xla_setup_kernels_match_numpy_reference():
    # the fused XLA geometry kernels (geometric_factors, corner blend)
    # must reproduce the numpy reference implementations exactly (they
    # replaced the single-core numpy forms that dominated mesh setup at
    # production sizes — the domain.tpp:44-231 setup role). Call the XLA
    # kernels DIRECTLY so an import/compile failure fails the test rather
    # than silently exercising the numpy fallback twice (ADVICE r2).
    mesh = mg.kershaw_mesh((3, 4, 5), 4, epsilon=0.3)
    g_xla, m_xla = mg._geometric_factors_xla(mesh.coords, 3, 4, chunk=17)
    assert np.asarray(g_xla).dtype == np.float64
    g_np, m_np = mg._geometric_factors_np(mesh.coords, 3, 4)
    np.testing.assert_allclose(g_xla, g_np, rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(m_xla, m_np, rtol=1e-13, atol=1e-15)

    # corner blend: drive both implementations on the same corner array
    n = 5
    rng = np.random.default_rng(7)
    corners = rng.standard_normal((11, 2, 2, 2, 3))
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.utils.gll import gll_points_weights
    r, _ = gll_points_weights(n)
    t = (r + 1.0) / 2.0
    blend = np.stack([1.0 - t, t], axis=0)
    c_xla = mg._blend_corners_xla(corners, blend, 3, n, chunk=4)
    c_np = mg._blend_corners_np(corners, blend, 3, n)
    np.testing.assert_allclose(c_xla, c_np, rtol=1e-14, atol=1e-15)
