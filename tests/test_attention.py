"""Correctness tests for the fused short-sequence attention kernel.

The Pallas kernels run in interpret mode on CPU (bit-accurate semantics,
no TPU needed); the XLA fallback doubles as the numerical oracle.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import ddm_tpu.ops.attention as A


@pytest.fixture()
def interpret_kernels(monkeypatch):
    monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")


def _qkv(B=16, N=64, H=6, Dh=64, dtype=jnp.float32, seed=0):
    D = H * Dh
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return [jax.random.normal(k, (B, N, D), dtype) for k in ks]


def test_reference_matches_naive():
    B, N, H, Dh = 4, 8, 2, 16
    q, k, v = _qkv(B, N, H, Dh)
    got = A.attention_reference(q, k, v, H)
    qr = np.asarray(q).reshape(B, N, H, Dh)
    kr = np.asarray(k).reshape(B, N, H, Dh)
    vr = np.asarray(v).reshape(B, N, H, Dh)
    s = np.einsum("bnhd,bmhd->bhnm", qr, kr) * Dh**-0.5
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    want = np.einsum("bhnm,bmhd->bnhd", p, vr).reshape(B, N, H * Dh)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_choose_blocks_constraints():
    for B, N, D in [(2048, 64, 384), (256, 64, 384), (64, 16, 128), (8, 64, 384)]:
        bi, g = A._choose_blocks(B, N, D)
        assert B % bi == 0 and bi % g == 0
        assert 4 * bi * N * D * 2 < 6 * 1024 * 1024


def test_fused_kernel_matches_reference(interpret_kernels):
    q, k, v = _qkv(B=16)
    want = A.attention_reference(q, k, v, 6)
    got = A._fused_attention(q, k, v, 6, (64) ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_kernel_gradients_match(interpret_kernels):
    q, k, v = _qkv(B=8)
    do = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss(fn):
        return lambda q, k, v: jnp.vdot(fn(q, k, v), do)

    ref = jax.grad(loss(lambda q, k, v: A.attention_reference(q, k, v, 6)),
                   argnums=(0, 1, 2))(q, k, v)
    ker = jax.grad(loss(lambda q, k, v: A._fused_attention(q, k, v, 6, 64**-0.5)),
                   argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ref, ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_fused_attention_cpu_fallback_is_reference():
    """Off-TPU the public API must route to the XLA path (exact match)."""
    q, k, v = _qkv(B=8)
    np.testing.assert_array_equal(
        np.asarray(A.fused_attention(q, k, v, 6)),
        np.asarray(A.attention_reference(q, k, v, 6, 64**-0.5)),
    )


def _block_args(B=16, N=64, H=6, Dh=64, seed=1):
    D = H * Dh
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    return (
        jax.random.normal(ks[0], (B, N, D)),
        1.0 + 0.1 * jax.random.normal(ks[1], (D,)),
        0.1 * jax.random.normal(ks[2], (D,)),
        0.05 * jax.random.normal(ks[3], (D, 3 * D)),
        0.05 * jax.random.normal(ks[4], (3 * D,)),
        0.05 * jax.random.normal(ks[5], (D, D)),
        0.05 * jax.random.normal(ks[6], (D,)),
    )


def test_fused_block_matches_reference(interpret_kernels):
    args = _block_args()
    want = A.attention_block_reference(*args, 6)
    got = A._fused_block(*args, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_block_gradients_match(interpret_kernels):
    args = _block_args(B=8)
    do = jax.random.normal(jax.random.PRNGKey(9), args[0].shape)
    f_ref = lambda *a: jnp.vdot(A.attention_block_reference(*a, 6), do)
    f_ker = lambda *a: jnp.vdot(A._fused_block(*a, 6), do)
    gr = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    gk = jax.grad(f_ker, argnums=tuple(range(7)))(*args)
    names = ["x", "ln_scale", "ln_bias", "wqkv", "bqkv", "wproj", "bproj"]
    for n, a, b in zip(names, gr, gk):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=3e-6,
            err_msg=f"grad mismatch for {n}",
        )


def test_fused_block_cpu_fallback_is_reference():
    args = _block_args(B=4)
    np.testing.assert_array_equal(
        np.asarray(A.fused_attention_block(*args, 6)),
        np.asarray(A.attention_block_reference(*args, 6)),
    )


def test_flash_wrapper_layout_roundtrip(interpret_kernels):
    B, N, H, Dh = 8, 64, 6, 64
    q4 = jax.random.normal(jax.random.PRNGKey(3), (B, N, H, Dh))
    out = A.flash_attention(q4, q4, q4)
    assert out.shape == (B, N, H, Dh)
    want = A.attention_reference(
        q4.reshape(B, N, H * Dh), q4.reshape(B, N, H * Dh),
        q4.reshape(B, N, H * Dh), H,
    ).reshape(B, N, H, Dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
