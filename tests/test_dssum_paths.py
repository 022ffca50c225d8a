"""Structured (tensor-stencil) dssum must equal the generic gather/scatter
path — single device and 8-shard, 2D and 3D, with/without mask/weight."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain


def fields_equal(mesh, dom_a, dom_b, vals, **kw):
    def pack(dom):
        sd = dom.sharded
        buf = np.zeros((sd.num_shards, sd.elems_per_shard,
                        mesh.num_points_per_elem))
        k = 0
        for p in range(sd.num_shards):
            ne = int(sd.elem_valid[p].sum())
            npe = mesh.num_points_per_elem
            buf[p, :ne] = vals[k:k + ne * npe].reshape(ne, npe)
            k += ne * npe
        return dom.to_device_field(buf.reshape(sd.num_shards, -1))

    def unpack(dom, u):
        sd = dom.sharded
        u = dom.from_device_field(u).reshape(sd.num_shards,
                                             sd.elems_per_shard, -1)
        return np.concatenate([u[p][sd.elem_valid[p]]
                               for p in range(sd.num_shards)]).ravel()

    ra = unpack(dom_a, dom_a.dssum_field(pack(dom_a), **kw))
    rb = unpack(dom_b, dom_b.dssum_field(pack(dom_b), **kw))
    np.testing.assert_allclose(ra, rb, atol=1e-13)


@pytest.mark.parametrize("shape,N", [((3, 4), 3), ((5, 2), 2),
                                     ((2, 3, 4), 2), ((3, 3, 3), 3)])
@pytest.mark.parametrize("P", [1, 8])
@pytest.mark.parametrize("kw", [dict(), dict(apply_weight=True),
                                dict(apply_mask=False)])
def test_structured_matches_generic(shape, N, P, kw):
    mesh = mg.kershaw_mesh(shape, N, 0.4) if len(shape) == 2 else mg.box_mesh(shape, N)
    sd_s = partition_mesh(mesh, P, structured=True)
    sd_g = partition_mesh(mesh, P, structured=False)
    assert sd_s.structured is not None and sd_g.structured is None
    if P == 1:
        dom_s = Domain(sd_s, dtype=jnp.float64)
        dom_g = Domain(sd_g, dtype=jnp.float64)
    else:
        dm = jax.make_mesh((P,), ("shard",))
        dom_s = Domain(sd_s, dtype=jnp.float64, device_mesh=dm)
        dom_g = Domain(sd_g, dtype=jnp.float64, device_mesh=dm)
    rng = np.random.default_rng(0)
    vals = rng.random(mesh.num_points)
    fields_equal(mesh, dom_s, dom_g, vals, **kw)


def test_structured_solve_matches_generic():
    mesh = mg.kershaw_mesh((4, 4), 4, 0.3)
    dm = jax.make_mesh((8,), ("shard",))
    dom_s = Domain(partition_mesh(mesh, 8, structured=True),
                   dtype=jnp.float64, device_mesh=dm)
    dom_g = Domain(partition_mesh(mesh, 8, structured=False),
                   dtype=jnp.float64, device_mesh=dm)
    for dom in (dom_s, dom_g):
        u_star = dom.initial_function(0)
        f = dom.manufacture_rhs(u_star)
        res = dom.solver(method="fcg", max_iterations=300, tolerance=1e-10)(f)
        assert bool(res.converged)
    h_s = np.asarray(res.residual_history)  # last = generic
    res_s = dom_s.solver(method="fcg", max_iterations=300, tolerance=1e-10)(
        dom_s.manufacture_rhs(dom_s.initial_function(0)))
    np.testing.assert_allclose(
        np.asarray(res_s.residual_history)[:10], h_s[:10], rtol=1e-9)
