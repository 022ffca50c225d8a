"""Pallas TPU kernels, validated in interpreter mode on CPU.

The driver bench runs the compiled kernels on real TPU hardware; CI
validates numerics via the Pallas interpreter against the XLA roll
implementation (which is itself validated against the generic
gather-scatter in test_dssum_paths.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops import gather_scatter as gs
from polynomial_reduction_with_full_domain_decomposition_preconditioner_tpu.ops import pallas_kernels as pk


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)


@pytest.mark.parametrize("shape,n", [
    ((16, 16, 16), 4), ((24, 12, 8), 4), ((8, 8, 8), 2),
    ((32, 16, 16), 8), ((16, 8, 24), 8),
])
def test_face_sum_kernel_matches_rolls(interpret_pallas, shape, n):
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    want = gs.lattice_face_sum(U, n, axes=(2, 1, 0))
    got = pk.lattice_face_sum_3d(U, n)
    assert float(jnp.abs(want - got).max()) == 0.0


def test_face_sum_kernel_bf16(interpret_pallas):
    # bf16 I/O with f32 in-kernel accumulation (Mosaic rotate is 32-bit
    # only): agrees with the bf16 roll path to 1 ulp
    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.standard_normal((32, 16, 128)), jnp.bfloat16)
    want = gs.lattice_face_sum(U, 8, axes=(2, 1, 0)).astype(jnp.float32)
    got = pk.lattice_face_sum_3d(U, 8).astype(jnp.float32)
    denom = np.maximum(np.abs(np.asarray(want)), 1.0)
    assert (np.abs(np.asarray(want - got)) / denom).max() < 0.02


def test_face_sum_kernel_fused_mask_weight(interpret_pallas):
    # fused mask/weight multiplies (structured_dssum's single-shard path)
    # match the separate XLA multiplies exactly in f32
    rng = np.random.default_rng(2)
    shape, n = (16, 16, 16), 4
    U = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, shape), jnp.float32)
    w = jnp.asarray(1.0 / rng.integers(1, 5, shape), jnp.float32)
    base = gs.lattice_face_sum(U, n, axes=(2, 1, 0))
    got = pk.lattice_face_sum_3d(U, n, mask=mask, weight=w)
    assert float(jnp.abs(base * w * mask - got).max()) == 0.0
    got_m = pk.lattice_face_sum_3d(U, n, mask=mask)
    assert float(jnp.abs(base * mask - got_m).max()) == 0.0
    got_w = pk.lattice_face_sum_3d(U, n, weight=w)
    assert float(jnp.abs(base * w - got_w).max()) == 0.0


def test_dispatch_falls_back_off_tpu():
    # CPU backend: the dispatcher must use the roll path (no pallas_call)
    assert not gs._use_pallas_face_sum(jnp.zeros((16, 16, 128)))
