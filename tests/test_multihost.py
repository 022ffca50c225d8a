"""Multi-host execution path: a 2-process CPU run (gloo collectives, 2
virtual devices per process) with local-only setup must reproduce the
single-process residual history exactly — the rebuild's replacement for
the reference's multi-node cluster validation (SURVEY.md section 4:
'Multi-host without a cluster').
"""

import json
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from functools import partial

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh import generator as mg
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.mesh.partition import partition_mesh
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers.domain import Domain
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.solvers import subdomain as sub

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _single_process_reference(mode="structured"):
    """The same problem/config as tests/multihost_worker.py, one process."""
    inner = "amg"
    if mode.endswith("-femamg"):
        mode = mode[:-len("-femamg")]
        inner = "fem-amg"
    shape = (2, 2, 8)
    base = partial(mg.box_mesh, shape, extent=(1.0, 1.0, 4.0))
    if mode == "unstructured":
        mk = lambda o: mg.scramble_mesh(base(o), seed=3, permute=False)
    else:
        mk = base
    mesh = mk(3)
    sd = partition_mesh(mesh, 4)
    dom = Domain(sd, dtype=jnp.float64,
                 device_mesh=jax.make_mesh((4,), ("shard",)))
    u_star = dom.initial_function(4, seed=1)
    f = dom.manufacture_rhs(u_star)
    pre = sub.composite_dd(dom, mk, poly_reduction=2, inner=inner)
    res = dom.solver(method="fgmres", max_iterations=100, tolerance=1e-8,
                     precond=pre)(f)
    hist = np.asarray(res.residual_history)
    return int(res.iterations), hist[np.isfinite(hist)]


def _run_two_process(tmp_path, port, mode):
    out = tmp_path / "mh.json"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(_ROOT, "tests", "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", port, str(out), mode],
        env=env, cwd=_ROOT, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for pid in range(2)]
    outputs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, o in zip(procs, outputs):
        if p.returncode != 0:
            pytest.fail(f"worker failed (rc={p.returncode}):\n{o[-3000:]}")
    return json.loads(out.read_text())


def test_two_process_run_matches_single_process(tmp_path):
    rec = _run_two_process(tmp_path, "12875", "structured")
    assert rec["converged"]
    iters1, hist1 = _single_process_reference()
    assert rec["iterations"] == iters1, (rec["iterations"], iters1)
    # atol floor: the final entries sit at machine zero where cross-
    # process reduction-order noise is all that remains
    np.testing.assert_allclose(rec["history"], hist1, rtol=1e-9,
                               atol=1e-14)
    assert rec["err_local"] < 1e-7
    # per-rank timing vectors are MEASURED per process, not fabricated
    # (round-3 VERDICT: timer.py repeated one scalar P times). The probe
    # sleeps 50 ms on process 0 and 100 ms on process 1.
    tv = rec["timer_vec"]
    assert len(tv) == 2 and tv[1] > tv[0] + 0.02, tv
    assert tv[0] >= 0.045 and tv[1] >= 0.095, tv
    # the report expands process values to the 4-shard vector (2 each)
    assert f"{tv[0]:.6f} {tv[0]:.6f} {tv[1]:.6f} {tv[1]:.6f}" \
        in rec["timer_report"], rec["timer_report"]


def test_two_process_fem_amg_matches_single_process(tmp_path):
    # the reference-faithful fem-amg inner in a multi-process run
    # (round-3 VERDICT gap: the oracle was single-process only). The
    # hierarchy build replicates over shards like the reference's
    # element graph; BSR values materialize for owned shards only.
    rec = _run_two_process(tmp_path, "12879", "structured-femamg")
    assert rec["converged"]
    iters1, hist1 = _single_process_reference("structured-femamg")
    assert rec["iterations"] == iters1, (rec["iterations"], iters1)
    np.testing.assert_allclose(rec["history"], hist1, rtol=1e-9,
                               atol=1e-14)
    assert rec["err_local"] < 5e-7


def test_two_process_unstructured_fem_amg_matches_single_process(tmp_path):
    rec = _run_two_process(tmp_path, "12881", "unstructured-femamg")
    assert rec["converged"]
    iters1, hist1 = _single_process_reference("unstructured-femamg")
    assert rec["iterations"] == iters1, (rec["iterations"], iters1)
    np.testing.assert_allclose(rec["history"], hist1, rtol=1e-9,
                               atol=1e-14)
    assert rec["err_local"] < 5e-7


def test_two_process_unstructured_matches_single_process(tmp_path):
    # the generic-partition (unstructured) composite with multi-host
    # local-only setup: every stacked device array is materialized only
    # for owned shards, yet the residual history must reproduce the
    # single-process run
    rec = _run_two_process(tmp_path, "12877", "unstructured")
    assert rec["converged"]
    iters1, hist1 = _single_process_reference("unstructured")
    assert rec["iterations"] == iters1, (rec["iterations"], iters1)
    np.testing.assert_allclose(rec["history"], hist1, rtol=1e-9,
                               atol=1e-14)
    assert rec["err_local"] < 1e-7
    # round-4: the fast face-block dssum engages multi-process (pad
    # maxima via allgather) and the per-process keyed setup cache hits
    assert rec["fb_active"] is True
    assert rec["cache_hit"] is True
