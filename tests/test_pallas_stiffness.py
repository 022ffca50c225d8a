"""Fused Pallas SEM stiffness apply (ops/pallas_kernels.
stiffness_lattice_3d): correctness vs the XLA lattice path
(the hot kernel, domain.okl:5-98 equivalent)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops import sem
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops.pallas_kernels import (
    stiffness_lattice_3d, stiffness_lattice_3d_supported)
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.utils.gll import diff_matrix


def _problem(n, shape, dtype, seed=0):
    rng = np.random.default_rng(seed)
    U = jnp.asarray(rng.standard_normal(shape), dtype)
    G = tuple(jnp.asarray(rng.standard_normal(shape), dtype)
              for _ in range(6))
    D = jnp.asarray(diff_matrix(n), dtype)
    return U, G, D


@pytest.mark.parametrize("n,shape", [(8, (16, 128, 128)),
                                     (4, (8, 128, 256))])
def test_interpret_matches_xla_f32(n, shape):
    U, G, D = _problem(n, shape, jnp.float32)
    ref = np.asarray(sem.stiffness_apply_lattice(U, G, D, 3))
    Db, Dbt, D_np = sem._pallas_lattice_consts(n, jnp.float32)
    out = np.asarray(stiffness_lattice_3d(U, G, Db, Dbt, n, D_np,
                                          interpret=True))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 2e-6


def test_interpret_bf16_more_accurate_than_xla_bf16():
    # the kernel accumulates in f32 regardless of I/O dtype; both paths
    # must agree with the f64 oracle within bf16 resolution
    n, shape = 8, (8, 128, 128)
    U64, G64, D64 = _problem(n, shape, jnp.float64, seed=3)
    with jax.enable_x64(True):
        oracle = np.asarray(sem.stiffness_apply_lattice(
            jnp.asarray(np.asarray(U64), jnp.float64),
            tuple(jnp.asarray(np.asarray(g), jnp.float64) for g in G64),
            jnp.asarray(np.asarray(D64), jnp.float64), 3))
    U = U64.astype(jnp.bfloat16)
    G = tuple(g.astype(jnp.bfloat16) for g in G64)
    Db, Dbt, D_np = sem._pallas_lattice_consts(n, jnp.float32)
    out = np.asarray(stiffness_lattice_3d(U, G, Db, Dbt, n, D_np,
                                          interpret=True)).astype(np.float64)
    scale = np.abs(oracle).max()
    assert np.abs(out - oracle).max() / scale < 0.05  # bf16 inputs


def test_supported_gate():
    assert not stiffness_lattice_3d_supported((16, 127, 128), 8,
                                              jnp.float32)
    assert not stiffness_lattice_3d_supported((15, 128, 128), 8,
                                              jnp.float32)
    assert not stiffness_lattice_3d_supported((16, 128, 128), 7,
                                              jnp.float32)
    assert not stiffness_lattice_3d_supported((16, 128, 128), 8,
                                              jnp.float64)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    assert stiffness_lattice_3d_supported((16, 128, 128), 8,
                                          jnp.float32) == on_tpu


@pytest.mark.skipif(jax.devices()[0].platform not in ("tpu", "axon"),
                    reason="compiled Pallas path needs TPU")
def test_compiled_matches_xla_on_tpu():
    n, shape = 8, (16, 256, 128)
    U, G, D = _problem(n, shape, jnp.float32, seed=1)
    Db, Dbt, D_np = sem._pallas_lattice_consts(n, jnp.float32)
    out = np.asarray(stiffness_lattice_3d(U, G, Db, Dbt, n, D_np))
    # force the XLA path for the reference value
    import polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops.sem as sem_mod
    orig = sem_mod._PALLAS_STIFFNESS
    sem_mod._PALLAS_STIFFNESS = False
    try:
        ref = np.asarray(sem.stiffness_apply_lattice(U, G, D, 3))
    finally:
        sem_mod._PALLAS_STIFFNESS = orig
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 2e-6
