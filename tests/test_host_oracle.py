"""Host-side f64 oracle (solvers/host_oracle.py): the double-precision
criterion engine for headline sizes where device-resident f64 geometry
does not fit in HBM. Parity against the device f64 Domain is the test:
same operator image, same residual norm, same refinement endpoint.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import subdomain as sub
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.host_oracle import (
    HostOperator, host_refine_solve)


def test_host_operator_matches_device_f64():
    mesh = mg.kershaw_mesh((3, 4, 5), 3, epsilon=0.3)
    sd = partition_mesh(mesh, 1)
    dom64 = Domain(sd, dtype=jnp.float64)
    host = HostOperator(mesh, chunk=7)

    rng = np.random.default_rng(3)
    vals = rng.random(mesh.num_points)
    u = dom64.to_device_field(vals.reshape(1, -1))
    au_dev = dom64.from_device_field(dom64.manufacture_rhs(u)).reshape(-1)
    au_host = host.apply(vals)
    assert np.allclose(au_dev, au_host, rtol=1e-12, atol=1e-12)

    f = dom64.manufacture_rhs(u)
    r_dev, rn_dev = dom64.residual(u, f)
    r_host, rn_host = host.residual(vals, au_host)
    assert abs(float(rn_dev) - rn_host) <= 1e-10 * max(rn_host, 1.0)

    # dssum parity (mask + QQ^T sum)
    s_dev = dom64.from_device_field(dom64.dssum_field(u)).reshape(-1)
    s_host = host.dssum(vals)
    assert np.allclose(s_dev, s_host, rtol=1e-12, atol=1e-12)


def test_host_refinement_reaches_double_accuracy_2d():
    mesh = mg.kershaw_mesh((6, 6), 4, epsilon=0.3)
    sd = partition_mesh(mesh, 1)
    dom32 = Domain(sd, dtype=jnp.float32)
    host = HostOperator(mesh)

    u_star = np.asarray(
        dom32.from_device_field(dom32.initial_function(4, seed=0)),
        dtype=np.float64).reshape(-1)
    f64 = host.apply(u_star)
    solve32 = dom32.solver(method="fgmres", max_iterations=200)
    res = host_refine_solve(host, dom32, solve32, f64, tolerance=1e-9)
    assert res.converged, res.history
    assert res.rel_residual < 1e-9
    err = np.abs(res.u - u_star).max()
    assert err <= 1e-6 * np.abs(u_star).max(), err


def test_driver_host_refine_mode():
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation
    import io
    cfg = Config(mesh="kershaw", shape=(4, 4, 4), poly_degree=3,
                 poly_reduction=2, max_iterations=60,
                 refine_tolerance=1e-7, refine_mode="host")
    rec = run_simulation(cfg, out=io.StringIO())
    assert rec["converged"]
    assert rec["refined_converged"]
    assert rec["refined_rel_residual"] < 1e-7
    assert rec["refined_max_error"] < 1e-6


def test_host_refinement_multi_shard_p8():
    """SPMD host refinement: a P=8 virtual-mesh run certifies the 1e-7
    double criterion end-to-end (round-5: the num_shards==1 guard is
    gone — global<->owned layout maps route the f64 residual through
    the sharded f32 solver)."""
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.host_oracle import (
        global_to_owned, owned_to_global)
    shape, N = (8, 8), 4
    mesh = mg.kershaw_mesh(shape, N, epsilon=0.3)
    sd = partition_mesh(mesh, 8)
    dmesh = jax.make_mesh((8,), ("shard",))
    dom32 = Domain(sd, dtype=jnp.float32, device_mesh=dmesh)
    host = HostOperator(mesh)

    # layout round-trip: global -> owned -> global is the identity
    rng = np.random.default_rng(0)
    g = rng.random(mesh.num_points)
    assert np.allclose(owned_to_global(dom32, global_to_owned(dom32, g)), g)

    u_star = owned_to_global(
        dom32, dom32.from_device_field(dom32.initial_function(4, seed=0)))
    f64 = host.apply(u_star)
    solve32 = dom32.solver(method="fgmres", max_iterations=300)
    res = host_refine_solve(host, dom32, solve32, f64, tolerance=1e-7)
    assert res.converged, res.history
    assert res.rel_residual < 1e-7
    # the criterion is the f64 residual (domain.hpp:118); pointwise error
    # carries the epsilon=0.3 warp's conditioning on top of it
    err = np.abs(res.u - u_star).max()
    assert err <= 1e-5 * np.abs(u_star).max(), err


def test_driver_host_refine_mode_p8():
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation
    import io
    cfg = Config(mesh="kershaw", shape=(4, 4, 16), poly_degree=3,
                 poly_reduction=2, max_iterations=120, num_shards=8,
                 refine_tolerance=1e-7, refine_mode="host")
    rec = run_simulation(cfg, out=io.StringIO())
    assert rec["converged"]
    assert rec["refined_converged"]
    assert rec["refined_rel_residual"] < 1e-7


def test_host_refinement_matches_device_refinement_3d():
    shape, N, r = (4, 4, 4), 3, 2
    mk = partial(mg.kershaw_mesh, shape, epsilon=0.3)
    mesh = mk(N)
    sd = partition_mesh(mesh, 1)
    dom32 = Domain(sd, dtype=jnp.float32)
    host = HostOperator(mesh)
    pre = sub.composite_dd(dom32, mk, poly_reduction=r, inner="amg",
                           fine_mesh=mesh)
    solve32 = dom32.solver(method="fgmres", max_iterations=100, precond=pre)

    u_star = np.asarray(
        dom32.from_device_field(dom32.initial_function(4, seed=0)),
        dtype=np.float64).reshape(-1)
    f64 = host.apply(u_star)
    res = host_refine_solve(host, dom32, solve32, f64, tolerance=1e-9)
    assert res.converged
    assert res.rel_residual < 1e-9
    assert res.cycles <= 4, res.history
    err = np.abs(res.u - u_star).max()
    assert err <= 1e-7 * np.abs(u_star).max(), err
