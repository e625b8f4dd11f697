"""Interpret-mode parity tests for the fused MoE dispatch/combine kernels.

Oracle: the einsum routing path in ``ddm_tpu.models.moe.MoEMLP`` (itself
oracle-tested per token in ``tests/test_moe.py``). The fused path must
match it in value AND gradients — including the hand-written VJPs'
LayerNorm/router/softmax/gate-renormalisation chain and the Switch aux
loss — for top-1 and top-2 routing, with capacity drops engaged, and with
a non-8-multiple capacity (slot-dim padding). The bug classes guarded:
wrong queue positions from the triangular-matmul cumsum, over-capacity
tokens leaking through padded slots, and gradient mismatches in any of the
five parameter cotangents.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddm_tpu.models.moe import MoEMLP

pytestmark = pytest.mark.slow


@pytest.fixture()
def interpret_kernels(monkeypatch):
    monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")


def _setup(topk, T=512, D=128, E=4, hidden=256, gs=128, cf=0.5, seed=0):
    """cf=0.5 forces capacity drops; cap = ceil(gs*cf*topk/E) = 16*topk."""
    mod = MoEMLP(D, hidden, E, capacity_factor=cf, group_size=gs,
                 topk=topk, dtype=jnp.float32)
    k = jax.random.PRNGKey(seed)
    rows = jax.random.normal(k, (T, D), jnp.float32)
    s = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(seed + 1), (D,))
    b = 0.1 * jax.random.normal(jax.random.PRNGKey(seed + 2), (D,))
    params = mod.init(jax.random.PRNGKey(seed + 3), rows,
                      ln_scale=s, ln_bias=b)
    return mod, params, rows, s, b


def _loss(mod, params, rows, s, b, aux_w=0.01):
    out, mut = mod.apply(params, rows, ln_scale=s, ln_bias=b,
                         mutable=["losses"])
    (aux,) = jax.tree.leaves(dict(mut)["losses"])
    return jnp.sum(out.astype(jnp.float32) ** 2) + aux_w * aux, out, aux


@pytest.mark.parametrize("topk", [1, 2])
def test_fused_matches_einsum_path(interpret_kernels, monkeypatch, topk):
    mod, params, rows, s, b = _setup(topk)

    calls = {"dispatch": 0}
    import ddm_tpu.ops.moe_dispatch as MD

    real = MD.moe_dispatch

    def spy(cfg, *a):
        calls["dispatch"] += 1
        return real(cfg, *a)

    monkeypatch.setattr(MD, "moe_dispatch", spy)
    _, out_f, aux_f = _loss(mod, params, rows, s, b)
    assert calls["dispatch"] == 1, "fused path was not taken"

    monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "0")  # jnp fallback
    _, out_r, aux_r = _loss(mod, params, rows, s, b)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(aux_f), float(aux_r), rtol=1e-5)


@pytest.mark.parametrize("topk", [1, 2])
def test_fused_gradients_match(interpret_kernels, topk):
    mod, params, rows, s, b = _setup(topk)

    def loss_fn(params, rows, s, b):
        return _loss(mod, params, rows, s, b)[0]

    g_f = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(params, rows, s, b)

    import os
    os.environ["DDM_TPU_PALLAS_INTERPRET"] = "0"
    try:
        g_r = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(params, rows, s, b)
    finally:
        os.environ["DDM_TPU_PALLAS_INTERPRET"] = "1"

    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_r = jax.tree.leaves(g_r)
    assert len(flat_f) == len(flat_r)
    for (path, a), bb in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_unaligned_capacity_pads_slots(interpret_kernels):
    # gs=96, cf=0.9, E=4 -> cap = ceil(96*0.9/4) = 22 (not a multiple of 8)
    mod, params, rows, s, b = _setup(1, T=192, gs=96, cf=0.9, E=4)
    _, out_f, _ = _loss(mod, params, rows, s, b)
    import os
    os.environ["DDM_TPU_PALLAS_INTERPRET"] = "0"
    try:
        _, out_r, _ = _loss(mod, params, rows, s, b)
    finally:
        os.environ["DDM_TPU_PALLAS_INTERPRET"] = "1"
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)


def test_ragged_rows_fall_back(interpret_kernels):
    """T % gs != 0 takes the padded einsum path and still agrees with the
    LN-outside contract (no crash, output sliced back to T rows)."""
    mod, params, rows, s, b = _setup(1, T=200, gs=128)
    out, _ = mod.apply(params, rows, ln_scale=s, ln_bias=b,
                       mutable=["losses"])
    assert out.shape == (200, 128)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dispatch_env_hatch_forces_einsum(interpret_kernels, monkeypatch):
    """DDM_TPU_MOE_DISPATCH=off is the measurement escape hatch (ROOFLINE
    §4a A/Bs the fused kernels against the einsum path on hardware): it
    must close the fused gate while leaving values identical."""
    from ddm_tpu.ops.moe_dispatch import moe_dispatch_ok

    assert moe_dispatch_ok(512, 128, 4, 16, 128, 1)
    monkeypatch.setenv("DDM_TPU_MOE_DISPATCH", "off")
    assert not moe_dispatch_ok(512, 128, 4, 16, 128, 1)

    mod, params, rows, s, b = _setup(topk=1)
    off = mod.apply(params, rows, ln_scale=s, ln_bias=b)
    monkeypatch.delenv("DDM_TPU_MOE_DISPATCH")
    on = mod.apply(params, rows, ln_scale=s, ln_bias=b)
    np.testing.assert_allclose(np.asarray(off), np.asarray(on),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("res_dtype", [jnp.float32, jnp.bfloat16])
def test_residual_fused_matches_einsum(interpret_kernels, res_dtype):
    """The in-kernel residual add (moe_combine_res) must match the einsum
    path's XLA fp32 residual add in value AND in every gradient including
    d/d(residual) — for both residual dtypes the DiT block can supply
    (bf16 stream after a fused attention half, fp32 after an XLA one)."""
    mod, params, rows, s, b = _setup(1)
    res = jax.random.normal(jax.random.PRNGKey(9), rows.shape).astype(
        res_dtype)

    def loss_fn(params, rows, s, b, res):
        out, mut = mod.apply(params, rows, ln_scale=s, ln_bias=b,
                             residual=res, mutable=["losses"])
        (aux,) = jax.tree.leaves(dict(mut)["losses"])
        return jnp.sum(out.astype(jnp.float32) ** 2) + 0.01 * aux

    val_f = loss_fn(params, rows, s, b, res)
    g_f = jax.grad(loss_fn, argnums=(0, 1, 4))(params, rows, s, b, res)

    import os
    os.environ["DDM_TPU_PALLAS_INTERPRET"] = "0"  # einsum fallback
    try:
        val_r = loss_fn(params, rows, s, b, res)
        g_r = jax.grad(loss_fn, argnums=(0, 1, 4))(params, rows, s, b, res)
    finally:
        os.environ["DDM_TPU_PALLAS_INTERPRET"] = "1"

    np.testing.assert_allclose(float(val_f), float(val_r), rtol=2e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_r = jax.tree.leaves(g_r)
    assert len(flat_f) == len(flat_r)
    for (path, a), bb in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            rtol=5e-4, atol=5e-5, err_msg=jax.tree_util.keystr(path),
        )


def test_aux_stats_match_einsum_formula(interpret_kernels):
    """The in-kernel (cnt, psum) aux statistics must reproduce the einsum
    path's aux value: E * sum(frac_e * mean_prob_e) with frac from the
    pre-capacity first-choice one-hot (capacity-dropped tokens still
    count — they were routed)."""
    mod, params, rows, s, b = _setup(1, cf=0.25)  # heavy drops
    _, _, aux_f = _loss(mod, params, rows, s, b)
    import os
    os.environ["DDM_TPU_PALLAS_INTERPRET"] = "0"
    try:
        _, _, aux_r = _loss(mod, params, rows, s, b)
    finally:
        os.environ["DDM_TPU_PALLAS_INTERPRET"] = "1"
    np.testing.assert_allclose(float(aux_f), float(aux_r), rtol=1e-5)


@pytest.mark.parametrize("topk", [1, 2])
def test_rows_sentinel_matches_einsum(interpret_kernels, topk):
    """residual="rows" (the DiT block's production contract) must match
    the einsum path given the same declaration, in value and EVERY
    gradient: the fused path routes the residual through the dispatch
    pass-through (moe_dispatch_thru) so d(rows) is the LN-path cotangent
    plus the block-output cotangent, joined inside the backward kernel."""
    mod, params, rows, s, b = _setup(topk)

    def loss_fn(params, rows, s, b):
        out, mut = mod.apply(params, rows, ln_scale=s, ln_bias=b,
                             residual="rows", mutable=["losses"])
        (aux,) = jax.tree.leaves(dict(mut)["losses"])
        return jnp.sum(out.astype(jnp.float32) ** 2) + 0.01 * aux

    import ddm_tpu.ops.moe_dispatch as MD
    thru_calls = {"n": 0}
    real = MD.moe_dispatch_thru

    def spy(cfg, *a):
        thru_calls["n"] += 1
        return real(cfg, *a)

    MD.moe_dispatch_thru = spy
    try:
        val_f = loss_fn(params, rows, s, b)
        g_f = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(params, rows, s, b)
    finally:
        MD.moe_dispatch_thru = real
    assert thru_calls["n"] > 0  # the pass-through path actually engaged

    import os
    os.environ["DDM_TPU_PALLAS_INTERPRET"] = "0"  # einsum fallback
    try:
        val_r = loss_fn(params, rows, s, b)
        g_r = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(params, rows, s, b)
    finally:
        os.environ["DDM_TPU_PALLAS_INTERPRET"] = "1"

    np.testing.assert_allclose(float(val_f), float(val_r), rtol=2e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_r = jax.tree.leaves(g_r)
    assert len(flat_f) == len(flat_r)
    for (path, a), bb in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            rtol=5e-4, atol=5e-5, err_msg=jax.tree_util.keystr(path),
        )
