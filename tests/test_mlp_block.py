"""Interpret-mode correctness tests for the fused MLP half-block kernel."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import ddm_tpu.ops.mlp_block as M


@pytest.fixture()
def interpret_kernels(monkeypatch):
    monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")


def _args(T=64, D=128, F=256, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    return (
        jax.random.normal(ks[0], (T, D), jnp.float32),
        1.0 + 0.1 * jax.random.normal(ks[1], (D,)),
        0.1 * jax.random.normal(ks[2], (D,)),
        0.05 * jax.random.normal(ks[3], (D, F)),
        0.05 * jax.random.normal(ks[4], (F,)),
        0.05 * jax.random.normal(ks[5], (F, D)),
        0.05 * jax.random.normal(ks[6], (D,)),
    )


def test_erf_poly_accuracy():
    x = jnp.linspace(-5, 5, 1001)
    np.testing.assert_allclose(
        np.asarray(M._erf_poly(x)), np.asarray(jax.lax.erf(x)), atol=5e-7
    )


def test_fused_forward_matches_reference(interpret_kernels):
    args = _args()
    want = M.mlp_block_reference(*args, dtype=jnp.float32)
    got = M._fused(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_gradients_match(interpret_kernels):
    args = _args(T=32)
    do = jax.random.normal(jax.random.PRNGKey(9), args[0].shape)
    f_ref = lambda *a: jnp.vdot(M.mlp_block_reference(*a, dtype=jnp.float32), do)
    f_ker = lambda *a: jnp.vdot(M._fused(*a), do)
    gr = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    gk = jax.grad(f_ker, argnums=tuple(range(7)))(*args)
    for name, a, b in zip(["x", "scale", "bias", "w1", "b1", "w2", "b2"], gr, gk):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"grad mismatch for {name}",
        )


def test_dispatch_falls_back_on_cpu():
    args = _args(T=16)
    got = M.fused_mlp_block(*args)
    want = M.mlp_block_reference(*args, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_row_block_divides():
    for T, D, F in [(131072, 384, 1536), (4096, 384, 1536), (24, 128, 256)]:
        rb = M._row_block(T, D, F)
        assert T % rb == 0 or rb == 8


def test_row_block_env_cap(monkeypatch):
    """DDM_TPU_MLP_ROW_BLOCK caps the kernel row block (the scoped-vmem
    escape hatch documented in ROADMAP); unset/0 leaves the choice alone,
    and the cap still respects the T-divisibility walk."""
    from ddm_tpu.ops.mlp_block import _row_block

    base = _row_block(2048 * 64, 384, 1536)
    assert base >= 256
    monkeypatch.setenv("DDM_TPU_MLP_ROW_BLOCK", "256")
    assert _row_block(2048 * 64, 384, 1536) == 256
    monkeypatch.setenv("DDM_TPU_MLP_ROW_BLOCK", "0")
    assert _row_block(2048 * 64, 384, 1536) == base


def test_fast_gelu_opt_in(interpret_kernels, monkeypatch):
    """DDM_TPU_FAST_GELU=1 switches kernel AND fallback to the sigmoid
    GELU consistently: fused == reference under the flag, both differ
    from the exact-erf path by a small, activation-shaped amount, and
    gradients stay fused==reference."""
    args = _args(T=32)
    exact = M.mlp_block_reference(*args, dtype=jnp.float32)

    monkeypatch.setenv("DDM_TPU_FAST_GELU", "1")
    got = M._fused(*args)
    want = M.mlp_block_reference(*args, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # the approximation is actually active (differs from exact erf) but
    # bounded by the known max error of x*sigmoid(1.702x) (~0.02) scaled
    # through W2
    delta = float(jnp.abs(want - exact).max())
    assert 1e-6 < delta < 0.1

    do = jax.random.normal(jax.random.PRNGKey(9), args[0].shape)
    f_ref = lambda *a: jnp.vdot(M.mlp_block_reference(*a, dtype=jnp.float32), do)
    f_ker = lambda *a: jnp.vdot(M._fused(*a), do)
    gr = jax.grad(f_ref, argnums=(0, 3, 5))(*args)
    gk = jax.grad(f_ker, argnums=(0, 3, 5))(*args)
    for name, a, b in zip(["x", "w1", "w2"], gr, gk):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"fast-gelu grad mismatch for {name}",
        )


def test_persist_skips_recompute_tier(interpret_kernels, monkeypatch):
    """persist=True routes widths that would pick the kernel-forward +
    recompute-backward pair to plain XLA (autodiff-saved residuals), and
    leaves the in-VMEM-backward tier alone where it fits (ROOFLINE §4's
    hybrid persist-residuals policy)."""
    # T=32 walks rb below the 64-row floor -> in-VMEM tier off, fwdonly on
    args = _args(T=32)
    T, D = args[0].shape
    F = args[3].shape[1]
    assert not M._mlp_kernel_ok(T, D, F) and M._mlp_fwd_kernel_ok(T, D, F)

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("recompute tier selected despite persist=True")

    monkeypatch.setattr(M, "_fused_fwdonly", boom)
    want = M.mlp_block_reference(*args, dtype=jnp.float32)
    got = M.fused_mlp_block(*args, persist=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    do = jax.random.normal(jax.random.PRNGKey(9), args[0].shape)
    gr = jax.grad(lambda *a: jnp.vdot(
        M.mlp_block_reference(*a, dtype=jnp.float32), do), argnums=(0, 3, 5))(*args)
    gp = jax.grad(lambda *a: jnp.vdot(
        M.fused_mlp_block(*a, persist=True), do), argnums=(0, 3, 5))(*args)
    for name, a, b in zip(["x", "w1", "w2"], gr, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=f"persist grad mismatch for {name}")

    # where the in-VMEM backward fits (T=64 -> rb=64), persist must NOT
    # demote the fully-fused kernel to XLA
    args64 = _args(T=64)
    assert M._mlp_kernel_ok(64, D, F)
    monkeypatch.setattr(M, "mlp_block_reference", boom)
    got64 = M.fused_mlp_block(*args64, persist=True)
    assert got64.shape == (64, D)


def test_fast_gelu_derivative_consistent():
    """_dgelu_fast is the true derivative of _gelu_fast (finite diff)."""
    x = jnp.linspace(-4, 4, 201)
    eps = 1e-3
    fd = (M._gelu_fast(x + eps) - M._gelu_fast(x - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(M._dgelu_fast(x)), np.asarray(fd),
                               atol=1e-3)  # fp32 central-difference noise
