"""Face-block dssum (ops/face_dssum.py): exact equality with the
scatter-path assembly on unstructured hex meshes, single-shard and SPMD.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.pebble import pebble_mesh
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain


def _node_sums(mesh, vals_flat):
    """Ground truth: per-node sums scattered back to points (numpy)."""
    glo = mesh.glo_num.reshape(-1)
    sums = np.bincount(glo, weights=vals_flat, minlength=mesh.num_nodes)
    return sums[glo]


def _host_field(dom, mesh, vals_flat):
    """Global element-ordered values -> per-shard padded host field."""
    sd = dom.sharded
    npe = mesh.num_points_per_elem
    out = np.zeros((dom.num_owned, sd.elems_per_shard * npe))
    bounds = sd.elem_offsets
    for k, p in enumerate(sd.owned):
        lo, hi = bounds[p], bounds[p + 1]
        out[k, :(hi - lo) * npe] = vals_flat[lo * npe:hi * npe]
    return out


def _check(mesh, Pn):
    rng = np.random.default_rng(3)
    vals = rng.random(mesh.num_points)
    expected = _node_sums(mesh, vals)

    sd = partition_mesh(mesh, Pn, structured=False)
    dm = jax.make_mesh((Pn,), ("shard",)) if Pn > 1 else None
    dom = Domain(sd, dtype=jnp.float64, device_mesh=dm)
    if Pn == 1:
        assert dom.arrays.fb is not None  # the fast path engaged
    u = dom.to_device_field(_host_field(dom, mesh, vals))
    y = dom.dssum_field(u, apply_mask=False)
    got = dom.from_device_field(y).reshape(dom.num_owned, -1)

    npe = mesh.num_points_per_elem
    bounds = sd.elem_offsets
    for k, p in enumerate(sd.owned):
        lo, hi = bounds[p], bounds[p + 1]
        if Pn == 1:
            # single shard: bitwise-exact vs the numpy ground truth
            np.testing.assert_array_equal(
                got[k, :(hi - lo) * npe], expected[lo * npe:hi * npe])
        else:
            # cross-shard psum ordering differs from numpy's bincount
            # at the last bit on interface nodes
            np.testing.assert_allclose(
                got[k, :(hi - lo) * npe], expected[lo * npe:hi * npe],
                rtol=1e-14, atol=1e-15)


def test_face_dssum_scrambled_single():
    _check(mg.scramble_mesh(mg.kershaw_mesh((3, 3, 4), 3, 0.3), seed=5), 1)


def test_face_dssum_pebble_single():
    _check(pebble_mesh((8, 8, 8), 2, num_pebbles=4, seed=2), 1)


def test_face_dssum_scrambled_spmd():
    _check(mg.scramble_mesh(mg.kershaw_mesh((3, 3, 4), 2, 0.3), seed=5,
                            permute=False), 4)


def test_face_dssum_pebble_spmd():
    _check(pebble_mesh((8, 8, 8), 2, num_pebbles=4, seed=2), 4)


def test_face_dssum_weight_mask_match_scatter():
    # mask/weight variants agree with the scatter path bit-for-bit
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops import gather_scatter as gs
    mesh = mg.scramble_mesh(mg.kershaw_mesh((3, 3, 3), 3, 0.3), seed=1)
    sd = partition_mesh(mesh, 1, structured=False)
    dom = Domain(sd, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    u = dom.to_device_field(
        rng.random((1, mesh.num_points)))
    a = dom.arrays
    # the domain trims the scatter-plan arrays when the face-block plan
    # is active — build the reference from the partition's own plan
    for am in (False, True):
        for aw in (False, True):
            got = dom.dssum_field(u, apply_mask=am, apply_weight=aw)
            ref = gs.dssum(
                u, gather_ids=jnp.asarray(sd.gather_ids[0]), mask=a.mask,
                inv_degree=jnp.asarray(sd.inv_degree[0]),
                bnode_local=a.bnode_local,
                bnode_global=a.bnode_global,
                num_local_nodes=sd.num_local_nodes,
                num_boundary_global=sd.num_boundary_global,
                axis_name=None, apply_mask=am, apply_weight=aw)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=0, atol=1e-15)
