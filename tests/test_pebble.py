"""Pebble-bed mesh family: the reference's PB_146/PB_1568 benchmark
geometry class (/root/reference/run.py:51-79) rebuilt as a generator —
voxel-carved fluid region around packed spheres, body-fitted by vertex
snapping, genuinely irregular element topology (holes, variable vertex
valence), Dirichlet on outer box + pebble surfaces.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.pebble import (
    pebble_mesh, pack_pebbles)
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import graph as gr
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain


def test_pack_pebbles_deterministic_and_disjoint():
    c1, r1 = pack_pebbles((10, 10, 10), 6, seed=3, solid_fraction=0.1)
    c2, r2 = pack_pebbles((10, 10, 10), 6, seed=3, solid_fraction=0.1)
    np.testing.assert_array_equal(c1, c2)
    assert r1 == r2 and 2 <= len(c1) <= 6
    for i in range(len(c1)):
        assert (c1[i] >= r1 - 1e-12).all() and (c1[i] <= 1 - r1 + 1e-12).all()
        for j in range(i):
            assert np.linalg.norm(c1[i] - c1[j]) >= 2 * r1

def test_pebble_mesh_topology_and_geometry():
    m = pebble_mesh((10, 10, 10), 2, num_pebbles=6, seed=1)
    assert not m.structured_layout
    # holes were carved but the bulk survives
    assert 0 < m.num_elements < 1000
    # every element has positive Jacobian (no inversion from the snap)
    assert m.mass.min() > 0
    # irregular adjacency: variable neighbor counts (unlike a box where
    # interior elements all see 26)
    m1 = pebble_mesh((10, 10, 10), 1, num_pebbles=6, seed=1)
    adj = gr.element_adjacency(m1.glo_num)
    deg = np.asarray(adj.sum(axis=1)).ravel()
    assert deg.min() < deg.max()
    # pebble surfaces are Dirichlet: nodes strictly inside the box with
    # mask 0 must exist (the outer box alone would leave none)
    interior = (m.coords > 1e-9).all(axis=-1) & (m.coords < 1 - 1e-9).all(axis=-1)
    assert ((m.dirichlet_mask == 0) & interior).any()
    # mask is node-consistent: same global node -> same mask everywhere
    mask_of = {}
    for g, v in zip(m.glo_num.ravel(), m.dirichlet_mask.ravel()):
        assert mask_of.setdefault(int(g), float(v)) == float(v)

def test_pebble_mesh_order_consistent_builder():
    # the composite mesh_builder contract: same elements, same local
    # frames at every order (corner coords and corner global ids align)
    mk = lambda o: pebble_mesh((8, 8, 8), o, num_pebbles=4, seed=2)
    m1, m3 = mk(1), mk(3)
    assert m1.num_elements == m3.num_elements
    E = m3.num_elements
    c3 = m3.coords.reshape(E, 4, 4, 4, 3)[:, ::3, ::3, ::3].reshape(E, 8, 3)
    np.testing.assert_allclose(c3, m1.coords, atol=1e-12)

def test_pebble_solve_matches_dense_oracle():
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.analysis import (
        assembled_operator_dense)
    m = pebble_mesh((4, 4, 4), 2, num_pebbles=2, seed=4,
                    solid_fraction=0.15)
    A = assembled_operator_dense(m)
    free = np.flatnonzero(
        np.bincount(m.glo_num.ravel(),
                    weights=m.dirichlet_mask.ravel()) > 0)
    # SPD on the free nodes
    Af = A[np.ix_(free, free)]
    np.testing.assert_allclose(Af, Af.T, atol=1e-10)
    assert np.linalg.eigvalsh(Af).min() > 0

    dom = Domain(partition_mesh(m, 1, structured=False), dtype=jnp.float64)
    u_star = dom.initial_function(0)
    f = dom.manufacture_rhs(u_star)
    res = dom.solver(method="fcg", max_iterations=400, tolerance=1e-10)(f)
    assert bool(res.converged)
    err = np.abs(dom.from_device_field(res.u)
                 - dom.from_device_field(u_star)).max()
    scale = np.abs(dom.from_device_field(u_star)).max()
    assert err <= 1e-7 * scale

def test_pebble_composite_preconditioner_beats_jacobi():
    from functools import partial
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.unstructured import (
        composite_dd_unstructured)
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import preconditioners as pc

    builder = lambda o: pebble_mesh((6, 6, 6), o, num_pebbles=4, seed=2)
    mesh = builder(3)
    dom = Domain(partition_mesh(mesh, 1, structured=False),
                 dtype=jnp.float64)
    u_star = dom.initial_function(4, seed=0)
    f = dom.manufacture_rhs(u_star)

    res_j = dom.solver(method="fgmres", max_iterations=300, tolerance=1e-8,
                       precond=pc.jacobi(dom))(f)
    k_j = int(np.isfinite(np.asarray(res_j.residual_history)).sum())

    pre = composite_dd_unstructured(dom, builder, poly_reduction=2,
                                    inner="amg", fine_mesh=mesh)
    res_c = dom.solver(method="fgmres", max_iterations=100, tolerance=1e-8,
                       precond=pre)(f)
    k_c = int(np.isfinite(np.asarray(res_c.residual_history)).sum())
    assert bool(res_c.converged)
    assert k_c < k_j / 3, (k_c, k_j)
