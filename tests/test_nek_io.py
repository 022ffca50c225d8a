"""Nek5000-export format I/O: write/read round trip and end-to-end solve
on a read-back mesh (the migration path for users of the reference,
whose mesh inputs are per-rank lx1_<n>/*.dat dumps, domain.tpp:44-231).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import nek
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import subdomain as sub


def _roundtrip(mesh, tmp_path, num_ranks):
    level = nek.write_nek_dir(str(tmp_path), mesh, num_ranks=num_ranks)
    assert os.path.isdir(level)
    back = nek.read_nek_dir(str(tmp_path), mesh.poly_degree,
                            validate_geom=True)
    return back


@pytest.mark.parametrize("num_ranks", [1, 3])
def test_roundtrip_kershaw_3d(tmp_path, num_ranks):
    mesh = mg.kershaw_mesh((3, 4, 5), 3, epsilon=0.3)
    back = _roundtrip(mesh, tmp_path, num_ranks)
    assert back.dim == 3 and back.poly_degree == 3
    np.testing.assert_array_equal(back.coords, mesh.coords)
    np.testing.assert_array_equal(back.geom, mesh.geom)
    np.testing.assert_array_equal(back.dirichlet_mask, mesh.dirichlet_mask)
    np.testing.assert_array_equal(back.node_degree, mesh.node_degree)
    # ids re-ranked densely: identical up to order-preserving relabel,
    # and the generator's ids are already dense, so equal here
    np.testing.assert_array_equal(back.glo_num, mesh.glo_num)
    np.testing.assert_allclose(back.mass, mesh.mass, rtol=1e-13)


def test_roundtrip_2d(tmp_path):
    mesh = mg.kershaw_mesh((4, 6), 4, epsilon=0.5)
    back = _roundtrip(mesh, tmp_path, 2)
    assert back.dim == 2 and back.num_geom == 3
    np.testing.assert_array_equal(back.coords, mesh.coords)
    np.testing.assert_array_equal(back.geom, mesh.geom)


def test_roundtrip_unstructured_scrambled(tmp_path):
    mesh = mg.scramble_mesh(mg.kershaw_mesh((3, 3, 3), 2, epsilon=0.3),
                            seed=5)
    back = _roundtrip(mesh, tmp_path, 2)
    np.testing.assert_array_equal(back.coords, mesh.coords)
    np.testing.assert_array_equal(back.glo_num, mesh.glo_num)
    assert back.structured_layout is False


def test_available_orders_and_builder(tmp_path):
    for o in (3, 1):
        nek.write_nek_dir(str(tmp_path), mg.box_mesh((2, 2, 2), o),
                          num_ranks=1)
    assert nek.available_orders(str(tmp_path)) == [1, 3]
    builder = nek.nek_mesh_builder(str(tmp_path))
    m1 = builder(1)
    assert m1.poly_degree == 1 and m1.num_elements == 8


def test_corrupt_sizes_rejected(tmp_path):
    mesh = mg.box_mesh((2, 2), 2)
    level = nek.write_nek_dir(str(tmp_path), mesh, num_ranks=1)
    # truncate one binary file -> loud failure, not silent garbage
    path = os.path.join(level, "x_0.2.dat")
    data = open(path, "rb").read()
    open(path, "wb").write(data[:-8])
    with pytest.raises(ValueError, match="expected"):
        nek.read_nek_dir(str(tmp_path), 2)


def test_solve_on_nek_readback_matches_original(tmp_path):
    """Composite-preconditioned solve on the read-back mesh reproduces
    the original mesh's convergence history (the format carries
    everything the solver consumes)."""
    shape = (2, 2, 4)
    orders = (3, 1)
    base = lambda o: mg.scramble_mesh(
        mg.kershaw_mesh(shape, o, epsilon=0.4), seed=2, permute=False)
    for o in orders:
        nek.write_nek_dir(str(tmp_path), base(o), num_ranks=2)
    builder = nek.nek_mesh_builder(str(tmp_path))

    hists = []
    for mk in (base, builder):
        mesh = mk(3)
        dom = Domain(partition_mesh(mesh, 1), dtype=jnp.float64)
        u_star = dom.initial_function(4, seed=3)
        f = dom.manufacture_rhs(u_star)
        pre = sub.composite_dd(dom, mk, poly_reduction=2, inner="amg",
                               fine_mesh=mesh)
        res = dom.solver(method="fgmres", max_iterations=60,
                         tolerance=1e-8, precond=pre)(f)
        assert res.converged
        h = np.asarray(res.residual_history)
        hists.append(h[np.isfinite(h)])
    np.testing.assert_allclose(hists[0], hists[1], rtol=1e-10)
