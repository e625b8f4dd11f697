"""Interpret-mode correctness tests for the expert-batched FFN kernel.

The kernel must match the jnp reference (and through it, flax Dense+gelu
numerics) in value AND gradients, including the per-expert dW accumulator
re-initialisation across the (E, S/rb) grid — the bug class this guards is
expert e+1's dW starting from expert e's accumulated value.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ddm_tpu.ops.expert_ffn as X


@pytest.fixture()
def interpret_kernels(monkeypatch):
    monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")


def _args(E=3, S=128, D=128, F=256, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    return (
        jax.random.normal(ks[0], (E, S, D), jnp.float32),
        0.05 * jax.random.normal(ks[1], (E, D, F)),
        0.05 * jax.random.normal(ks[2], (E, F)),
        0.05 * jax.random.normal(ks[3], (E, F, D)),
        0.05 * jax.random.normal(ks[4], (E, D)),
    )


def test_forward_matches_reference(interpret_kernels):
    args = _args()
    got = X.expert_ffn(*args)
    want = X.expert_ffn_reference(*args, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_gradients_match(interpret_kernels):
    args = _args()

    def loss_k(*a):
        return jnp.sum(X.expert_ffn(*a).astype(jnp.float32) ** 2)

    def loss_r(*a):
        return jnp.sum(
            X.expert_ffn_reference(*a, dtype=jnp.float32).astype(jnp.float32)
            ** 2
        )

    gk = jax.grad(loss_k, argnums=tuple(range(5)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(5)))(*args)
    for a, b, name in zip(gk, gr, ["dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5, err_msg=name
        )


def test_per_expert_accumulators_are_independent(interpret_kernels):
    """dW of expert e must not inherit expert e-1's accumulator: compare a
    2-expert batched grad against two single-expert runs."""
    args = _args(E=2, S=256)

    def loss(*a):
        return jnp.sum(X.expert_ffn(*a).astype(jnp.float32) ** 2)

    dw1 = jax.grad(loss, argnums=1)(*args)
    for e in range(2):
        sub = tuple(a[e : e + 1] for a in args)
        dw1_e = jax.grad(loss, argnums=1)(*sub)
        np.testing.assert_allclose(
            np.asarray(dw1[e]), np.asarray(dw1_e[0]), rtol=2e-5, atol=2e-5,
            err_msg=f"expert {e}",
        )


def test_fchunked_forward_matches_reference(interpret_kernels, monkeypatch):
    """The F-chunked forward (double-buffered-weight wall at DiT-B+
    widths) is exact up to the kernel's rational-erf GELU."""
    monkeypatch.setattr(X, "_expert_fwd_fchunks", lambda S, D, F: 2)
    args = _args()
    got = X._expert_ffn_fwdonly(*args)
    want = X.expert_ffn_reference(*args, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
    # gradients flow through the XLA-reference backward regardless of k
    g = jax.grad(lambda *a: jnp.sum(X._expert_ffn_fwdonly(*a) ** 2),
                 argnums=1)(*args)
    gr = jax.grad(
        lambda *a: jnp.sum(
            X.expert_ffn_reference(*a, dtype=jnp.float32) ** 2),
        argnums=1)(*args)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=3e-4, atol=3e-4)


def test_gate():
    # off-TPU without interpret mode the kernel must not be selected
    assert not X.expert_ffn_ok(8, 20480, 384, 1536) or (
        jax.default_backend() == "tpu"
    )


def test_gate_shapes(interpret_kernels):
    assert X.expert_ffn_ok(8, 20480, 384, 1536)   # DiT-S production shape
    assert not X.expert_ffn_ok(8, 20480, 8, 16)   # D % 128 != 0
    # DiT-B width: backward residents (12*D*F = 28 MB) cannot fit, the
    # forward-only tier (4*D*F = 9.4 MB) can — the dense path's split
    assert not X.expert_ffn_ok(8, 20480, 768, 3072)
    assert X.expert_ffn_fwd_ok(8, 20480, 768, 3072)


def test_fwdonly_tier_gradients(interpret_kernels):
    """The forward-only tier (Pallas fwd + XLA bwd over saved inputs) must
    match the reference in value and grads."""
    args = _args()

    def loss_k(*a):
        return jnp.sum(X._expert_ffn_fwdonly(*a).astype(jnp.float32) ** 2)

    def loss_r(*a):
        return jnp.sum(
            X.expert_ffn_reference(*a, dtype=jnp.float32).astype(jnp.float32)
            ** 2
        )

    np.testing.assert_allclose(
        np.asarray(X._expert_ffn_fwdonly(*args)),
        np.asarray(X.expert_ffn_reference(*args, dtype=jnp.float32)),
        rtol=2e-5, atol=2e-5,
    )
    gk = jax.grad(loss_k, argnums=tuple(range(5)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(5)))(*args)
    for a, b, name in zip(gk, gr, ["dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5, err_msg=name
        )
