"""Runtime layer: config, timer, driver CLI, sweep, io, native kernels."""

import json
import os

import numpy as np
import pytest

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.timer import Timer
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime import sweep as sw
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime import analysis as an


def test_config_cli_roundtrip():
    cfg = Config.from_args(["5", "4", "1", "1", "--mesh", "box",
                            "--shape", "4,4,8", "--num-shards", "2",
                            "--solver", "fcg", "--ptype", "float32"])
    assert cfg.poly_degree == 5 and cfg.poly_reduction == 4
    assert cfg.shape == (4, 4, 8) and cfg.mesh == "box"
    assert cfg.solver == "fcg" and cfg.num_shards == 2
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_timer_accumulates_and_reports():
    t = Timer(sync=False)
    t.initialize()
    with t("solve.run"):
        x = sum(range(1000))
    with t("solve.run"):
        pass
    assert t.as_dict()["solve.run"]["count"] == 2
    assert "solve.run" in t.report()
    assert x == 499500


def test_driver_end_to_end(tmp_path, capsys):
    cfg = Config(mesh="kershaw", shape=(3, 3, 8), epsilon=0.3,
                 poly_degree=3, poly_reduction=2, solver="fgmres",
                 preconditioner="composite", inner="amg",
                 max_iterations=80, stype="float64", ptype="float32",
                 tolerance=1e-9, output=str(tmp_path / "fields.npz"))
    rec = run_simulation(cfg)
    assert rec["converged"]
    assert rec["iterations"] < 25
    assert rec["max_error"] < 1e-6
    data = np.load(tmp_path / "fields.npz")
    assert "u" in data and "u_star" in data and "coords" in data
    assert np.isfinite(data["u"]).all()


def test_driver_vtk_output(tmp_path):
    cfg = Config(mesh="box", shape=(2, 2, 4), poly_degree=2,
                 poly_reduction=1, preconditioner="jacobi",
                 max_iterations=300, tolerance=1e-6,
                 output=str(tmp_path / "fields.vtk"))
    rec = run_simulation(cfg)
    text = (tmp_path / "fields.vtk").read_text()
    assert "DATASET UNSTRUCTURED_GRID" in text
    assert "SCALARS u" in text
    assert rec["converged"]


def test_sweep_runs_and_resumes(tmp_path):
    base = Config(mesh="box", shape=(2, 2, 4), poly_degree=2,
                  poly_reduction=1, preconditioner="jacobi",
                  max_iterations=300, tolerance=1e-6)
    out = str(tmp_path / "sweep")
    res1 = sw.sweep(base, {"solver": ["fcg", "fgmres"]}, out)
    assert len(res1) == 2 and all(r["converged"] for r in res1)
    # resume: no recomputation, results loaded from disk
    files = sorted(os.listdir(out))
    res2 = sw.sweep(base, {"solver": ["fcg", "fgmres"]}, out)
    assert sorted(os.listdir(out)) == files
    assert len(res2) == 2


def test_analysis_dense_oracle_matches_matrix_free():
    # the analysis.py cross-validation role: assembled dense operator vs
    # the matrix-free device apply + dssum
    import jax.numpy as jnp
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain

    mesh = mg.kershaw_mesh((3, 4), 3, epsilon=0.3)
    A = an.assembled_operator_dense(mesh)
    assert np.abs(A - A.T).max() < 1e-10

    dom = Domain(partition_mesh(mesh, 1), dtype=jnp.float64)
    rng = np.random.default_rng(0)
    v_nodes = rng.standard_normal(mesh.num_nodes)
    mask = np.ones(mesh.num_nodes)
    for e in range(mesh.num_elements):
        mask[mesh.glo_num[e]] = np.minimum(mask[mesh.glo_num[e]],
                                           mesh.dirichlet_mask[e])
    v_nodes *= mask
    u_pts = v_nodes[mesh.glo_num.reshape(-1)]
    au = dom.apply_operator(dom.to_device_field(u_pts))
    au_sum = dom.dssum_field(au)
    au_elem = dom.from_device_field(au_sum).reshape(-1)
    want_nodes = (A @ v_nodes) * mask
    got_first = {}
    ok = True
    for i, g in enumerate(mesh.glo_num.reshape(-1)):
        if mask[g] == 0.0:
            continue
        ok = ok and abs(au_elem[i] - want_nodes[g]) < 1e-9
    assert ok


def test_compare_histories():
    h1 = [1.0, 0.1, 0.01, 0.001]
    h2 = [1.0, 0.11, 0.012, 0.0011]
    rep = an.compare_histories(h1, h2)
    assert rep["match"]
    rep2 = an.compare_histories([1.0, 0.5, 0.25, 0.12, 0.06, 0.03],
                                [1.0, 1e-6])
    assert not rep2["match"]


def test_native_kernels_match_python():
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.utils import native
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.amg.fem import p1_stiffness_grid
    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(1)
    X = np.stack(np.meshgrid(*[np.linspace(0, 1, s) for s in (5, 6, 7)],
                             indexing="ij")[::-1], axis=-1)
    X = X + 0.02 * rng.standard_normal(X.shape)
    A_py = p1_stiffness_grid(X, use_native=False)
    A_nat = p1_stiffness_grid(X, use_native=True)
    assert (A_py != A_nat).nnz == 0 or abs(A_py - A_nat).max() < 1e-13

    # coo_to_csr vs scipy on random duplicated COO
    rows = rng.integers(0, 50, 2000)
    cols = rng.integers(0, 40, 2000)
    vals = rng.standard_normal(2000)
    import scipy.sparse as sp
    want = sp.coo_matrix((vals, (rows, cols)), shape=(50, 40)).tocsr()
    want.sum_duplicates()
    got = native.coo_to_csr(rows, cols, vals, (50, 40))
    assert abs(want - got).max() < 1e-13


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime import checkpoint as ck
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.amg import composite as comp
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.subdomain import _build_group_specs

    mesh = mg.box_mesh((3, 3, 6), 2)
    groups = _build_group_specs(6, 1, 1, [2], 6)
    hs = [comp.build_composite_hierarchy(groups, {2: mesh}, (3, 3), 6, 0, 3)]
    path = str(tmp_path / "setup.npz")
    ck.save_hierarchies(path, hs)
    back = ck.load_hierarchies(path)
    assert len(back) == 1
    h0, h1 = hs[0], back[0]
    assert len(h0.mats) == len(h1.mats)
    for a, b in zip(h0.mats, h1.mats):
        assert abs(a - b).max() == 0.0
    assert abs(h0.Q - h1.Q).max() == 0.0
    assert np.allclose(h0.coarse_inv, h1.coarse_inv)
    assert np.allclose(h0.lmaxs, h1.lmaxs)


def test_nan_guard_stops_solver():
    # SURVEY 5.3: NaN residuals must terminate the iteration cleanly
    import jax.numpy as jnp
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain

    mesh = mg.box_mesh((2, 2, 4), 2)
    dom = Domain(partition_mesh(mesh, 1), dtype=jnp.float64)
    f = dom.to_device_field(np.full((1, mesh.num_points), np.nan))
    res = dom.solver(method="fcg", max_iterations=50, tolerance=1e-8)(f)
    assert not bool(res.converged)
    assert int(res.iterations) <= 2  # stopped immediately, no hang


def test_phase_report(capsys):
    import io
    import jax.numpy as jnp
    from functools import partial
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.phases import phase_report
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config

    shape = (2, 2, 8)
    mesh = mg.kershaw_mesh(shape, 2, epsilon=0.3)
    dom = Domain(partition_mesh(mesh, 1), dtype=jnp.float32)
    buf = io.StringIO()
    rep = phase_report(dom, partial(mg.kershaw_mesh, shape, epsilon=0.3),
                       cfg=Config(poly_reduction=1), iterations=4, out=buf)
    assert "total per iteration" in rep
    assert all(np.isfinite(v) for v in rep.values())
    assert "phase report" in buf.getvalue()
    # device-measured region rows (the reference's ~20-region taxonomy,
    # poisson.cpp:259-358) are present and non-negative
    region_keys = [k for k in rep if k.startswith("region.")]
    assert len(region_keys) >= 9
    assert all(rep[k] >= 0.0 for k in region_keys)
    assert "region.domain.operator_application" in rep
    assert "region.subdomain.tree_construction (restriction cascade)" in rep


def test_driver_multishard_cli():
    # the CLI SPMD path: num_shards > 1 builds the device mesh and runs
    # the full sharded composite solve (8 virtual CPU devices in CI)
    cfg = Config(mesh="kershaw", shape=(2, 2, 8), epsilon=0.3,
                 poly_degree=2, poly_reduction=1, num_shards=4,
                 preconditioner="composite", inner="amg",
                 max_iterations=100, tolerance=1e-8)
    rec = run_simulation(cfg, out=open(os.devnull, "w"))
    assert rec["converged"]
    assert rec["max_error"] < 1e-5


def test_phase_chain_spmd():
    # the device-measured region chains compile and run on a sharded mesh
    # (every chain embeds the real collectives: psum dots, ring ppermute,
    # coarse all_gather)
    import jax
    import jax.numpy as jnp
    from functools import partial
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import subdomain as sub

    shape = (2, 2, 8)
    mesh = mg.kershaw_mesh(shape, 2, epsilon=0.3)
    dm = jax.make_mesh((4,), ("shard",))
    dom = Domain(partition_mesh(mesh, 4), dtype=jnp.float32,
                 device_mesh=dm)
    pre = sub.composite_dd(dom, partial(mg.kershaw_mesh, shape,
                                        epsilon=0.3),
                           poly_reduction=1, inner="amg", fine_mesh=mesh)
    f = dom.manufacture_rhs(dom.initial_function(4, seed=0))
    for kind in ("op", "tree_rhs", "comp_op", "inner_precond",
                 # round-5 sub-kinds: ring/coarse tree legs + the
                 # assemble (gather) half of the composite dssum
                 "tree_rings", "tree_coarse", "comp_assemble"):
        v = float(dom.phase_chain(pre, kind, 3)(f))
        assert np.isfinite(v), kind


def test_cli_phase_report_flag():
    cfg = Config.from_args(["2", "1", "--phase-report",
                            "--shape", "2,2,4", "--mesh", "box"])
    assert cfg.phase_report
    assert Config.from_json(cfg.to_json()) == cfg


def test_checkpoint_skips_setup(tmp_path):
    # second run with --checkpoint must reuse the mesh + chain artifacts
    # and reproduce the identical history (SURVEY.md 5.4 extension)
    import io
    import time
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation

    cfg = Config(mesh="kershaw", shape=(4, 4, 4), poly_degree=3,
                 poly_reduction=2, max_iterations=60,
                 checkpoint=str(tmp_path))
    t0 = time.time()
    rec1 = run_simulation(cfg, out=io.StringIO())
    t1 = time.time() - t0
    files = list(tmp_path.iterdir())
    assert any("mesh_" in f.name for f in files)
    assert any("chain_" in f.name for f in files)
    # deterministic reuse evidence: the second run must never call the
    # mesh generator or the vertex-chain builder (wall-clock comparisons
    # are noise-bound at this test size)
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.amg import composite as amgc

    def _boom(*a, **k):
        raise AssertionError("setup was not skipped on checkpoint resume")

    saved = (mg.kershaw_mesh, amgc.vertex_q1_hierarchy)
    mg.kershaw_mesh, amgc.vertex_q1_hierarchy = _boom, _boom
    try:
        rec2 = run_simulation(cfg, out=io.StringIO())
    finally:
        mg.kershaw_mesh, amgc.vertex_q1_hierarchy = saved
    assert rec1["converged"] and rec2["converged"]
    np.testing.assert_allclose(rec2["residual_history"],
                               rec1["residual_history"], rtol=1e-12)


def test_inner_history_probe():
    import io
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation

    out = io.StringIO()
    cfg = Config(mesh="kershaw", shape=(4, 4, 8), poly_degree=3,
                 poly_reduction=2, max_iterations=60, num_shards=4,
                 inner_history=True)
    rec = run_simulation(cfg, out=out)
    text = out.getvalue()
    assert rec["converged"]
    assert "inner iteration:   0" in text
    assert "inner iteration:   4" in text  # 4 fixed inner iterations
    # per-shard timing vectors in the reference's report schema
    assert "mean:" in text and "[ " in text


def test_composite_region_field_dump(tmp_path):
    # the reference dumps the subdomain/superdomain composite fields for
    # visualization (subdomain.tpp:4649-4791); --output-composite is the
    # npz equivalent (per-group values + regenerated coordinates)
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation
    import io as _io
    path = str(tmp_path / "comp.npz")
    cfg = Config(mesh="kershaw", shape=(4, 4, 4), poly_degree=3,
                 poly_reduction=2, max_iterations=40,
                 output_composite=path)
    rec = run_simulation(cfg, out=_io.StringIO())
    assert rec["converged"]
    z = np.load(path)
    assert "group0_values" in z and "group0_coords" in z
    assert z["group0_values"].shape + (3,) == z["group0_coords"].shape


def test_composite_region_field_dump_spmd(tmp_path):
    # round 5: SPMD runs dump one npz PER SHARD (_s{p} suffix), the
    # per-rank Silo analog of subdomain.tpp:4649-4791
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.config import Config
    from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.runtime.driver import run_simulation
    import io as _io
    path = str(tmp_path / "comp.npz")
    cfg = Config(mesh="kershaw", shape=(4, 4, 8), poly_degree=3,
                 poly_reduction=2, max_iterations=60, num_shards=2,
                 output_composite=path)
    rec = run_simulation(cfg, out=_io.StringIO())
    assert rec["converged"]
    for p in range(2):
        z = np.load(str(tmp_path / f"comp_s{p}.npz"))
        assert "group0_values" in z and "group0_coords" in z
        assert (z["group0_values"].shape + (3,)
                == z["group0_coords"].shape)
