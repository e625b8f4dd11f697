"""Tests for the fused energy-score kernel (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import ddm_tpu.ops.energy as E
from ddm_tpu.ops.losses import generalized_energy_terms


@pytest.fixture()
def interpret_kernels(monkeypatch):
    monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")


def _data(B=16, m=4, D=256, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, (B, m, D)),
            jax.random.normal(k2, (B, D)))


@pytest.mark.parametrize("beta", [0.1, 1.0, 2.0])
def test_fused_matches_jnp(interpret_kernels, beta):
    xh, x0 = _data()
    want = generalized_energy_terms(xh, x0, beta)
    got = E._fused(xh, x0, beta)
    for a, b in zip(got, want):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


@pytest.mark.parametrize("beta", [0.1, 2.0])
def test_fused_gradients_match(interpret_kernels, beta):
    xh, x0 = _data(B=8, m=3, D=128)

    def loss(fn):
        def f(xh, x0):
            c, i = fn(xh, x0, beta)
            return 1.7 * c - 0.3 * i
        return f

    ref = jax.grad(loss(generalized_energy_terms), argnums=(0, 1))(xh, x0)
    ker = jax.grad(loss(E._fused), argnums=(0, 1))(xh, x0)
    for a, b in zip(ref, ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_dispatch_falls_back_on_cpu_and_toy_shapes():
    xh, x0 = _data(B=4, m=2, D=2)  # toy shape: D not lane aligned
    got = E.fused_energy_terms(xh, x0, 0.1)
    want = generalized_energy_terms(xh, x0, 0.1)
    np.testing.assert_allclose(float(got[0]), float(want[0]), rtol=1e-6)
    np.testing.assert_allclose(float(got[1]), float(want[1]), rtol=1e-6)


def test_choose_bb_divides():
    for B, m, D in [(256, 8, 3072), (56, 8, 3072), (3, 8, 3072)]:
        bb = E._choose_bb(B, m, D)
        assert B % bb == 0 or bb == 1


# ---- anchor-streaming tier (m > 16; the BASELINE.json m=32 sweep point) ----


@pytest.mark.parametrize("beta", [0.1, 1.0, 2.0])
def test_stream_matches_jnp(interpret_kernels, beta):
    xh, x0 = _data(B=8, m=24, D=256, seed=1)
    want = generalized_energy_terms(xh, x0, beta)
    got = E._fused_stream(xh, x0, beta)
    for a, b in zip(got, want):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


@pytest.mark.parametrize("beta", [0.1, 2.0])
def test_stream_gradients_match(interpret_kernels, beta):
    xh, x0 = _data(B=4, m=24, D=128, seed=2)

    def loss(fn):
        def f(xh, x0):
            c, i = fn(xh, x0, beta)
            return 1.7 * c - 0.3 * i
        return f

    ref = jax.grad(loss(generalized_energy_terms), argnums=(0, 1))(xh, x0)
    ker = jax.grad(loss(E._fused_stream), argnums=(0, 1))(xh, x0)
    for a, b in zip(ref, ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_stream_sweep_slice_parity(interpret_kernels):
    """The exact BASELINE.json m=32 slice at reduced B (the kernel body is
    bb-blocked, so B only multiplies identical blocks)."""
    xh, x0 = _data(B=8, m=32, D=3072, seed=3)
    assert E._stream_supported(8, 32, 3072)
    want = generalized_energy_terms(xh, x0, 1.0)
    got = E._fused_stream(xh, x0, 1.0)
    for a, b in zip(got, want):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_stream_dispatch_gate(monkeypatch):
    monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")
    assert E._stream_supported(256, 32, 3072)
    assert not E._stream_supported(256, 8, 3072)    # unrolled kernel's range
    assert not E._stream_supported(256, 128, 3072)  # above _STREAM_M_MAX
    assert not E._stream_supported(256, 20, 3072)   # m must tile sublanes
    assert not E._stream_supported(256, 64, 32768)  # VMEM working set
