"""EMA parameter averaging: update math, state/checkpoint plumbing, CLI.

The reference has no EMA (capability addition); the contract here is the
standard diffusion-model one: ema += (1-decay)*(params-ema) once per
optimizer step, eval/sampling consume the average, checkpoints carry both
trees, and runs without --ema-decay are byte-identical to before (the
field is None == an empty pytree).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import train_cifar10_dit as cifar_cli
from ddm_tpu.models.mlp import DDDMMLP
from ddm_tpu.training import TrainState, make_train_step, update_ema
from ddm_tpu.utils import checkpoint as ckpt_lib


def _mlp_state(ema: bool):
    model = DDDMMLP()
    x = jnp.zeros((4, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((4,)), x)
    return model, TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-2),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def test_update_ema_math():
    _, state = _mlp_state(ema=True)
    moved = state.replace(
        params=jax.tree.map(lambda p: p + 1.0, state.params))
    out = update_ema(moved, decay=0.9)
    for e, p0 in zip(jax.tree.leaves(out.ema_params),
                     jax.tree.leaves(state.params)):
        np.testing.assert_allclose(
            np.asarray(e), np.asarray(p0) + 0.1, rtol=1e-6)


def test_train_step_updates_ema_only_when_present():
    model, state = _mlp_state(ema=True)
    step = make_train_step(model.apply, m=2, beta=0.1, lam=1.0, w_bias=0.0,
                           ema_decay=0.5)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    ema0 = jax.tree.map(np.asarray, state.ema_params)
    state2, _ = step(state, jax.random.PRNGKey(2), x0)
    # ema moved halfway (decay 0.5) toward the updated params
    for e0, e1, p1 in zip(jax.tree.leaves(ema0),
                          jax.tree.leaves(state2.ema_params),
                          jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(
            np.asarray(e1), (np.asarray(e0) + np.asarray(p1)) / 2,
            rtol=1e-5, atol=1e-7)

    _, plain = _mlp_state(ema=False)
    plain2, _ = step(plain, jax.random.PRNGKey(2), x0)
    assert plain2.ema_params is None


def test_checkpoint_roundtrip_and_pre_ema_resume(tmp_path):
    model, state = _mlp_state(ema=True)
    step = make_train_step(model.apply, m=2, beta=0.1, lam=1.0, w_bias=0.0,
                           ema_decay=0.5)
    state, _ = step(state, jax.random.PRNGKey(2),
                    jax.random.normal(jax.random.PRNGKey(1), (8, 2)))
    path = str(tmp_path / "m.ckpt")
    ckpt_lib.save_train_state(path, state, config={"a": 1})

    _, template = _mlp_state(ema=True)
    restored, _ = ckpt_lib.restore_train_state(path, template)
    for a, b in zip(jax.tree.leaves(state.ema_params),
                    jax.tree.leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # load_params(ema=True) returns the average, not the raw params
    raw, _ = ckpt_lib.load_params(path)
    avg, _ = ckpt_lib.load_params(path, ema=True)
    assert not np.allclose(
        jax.tree.leaves(raw)[0], jax.tree.leaves(avg)[0])

    # resuming an EMA run from a PRE-EMA checkpoint cold-starts the
    # average from the restored params
    _, no_ema = _mlp_state(ema=False)
    pre = str(tmp_path / "pre.ckpt")
    ckpt_lib.save_train_state(pre, no_ema)
    _, template2 = _mlp_state(ema=True)
    resumed, _ = ckpt_lib.restore_train_state(pre, template2)
    for a, b in zip(jax.tree.leaves(resumed.params),
                    jax.tree.leaves(resumed.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # non-EMA checkpoints refuse --ema loudly
    with pytest.raises(ValueError, match="no EMA"):
        ckpt_lib.load_params(pre, ema=True)


def test_ema_skips_frozen_micro_steps_under_grad_accum():
    """--ema-decay x --grad-accum: MultiSteps freezes params for N-1 of
    every N micro-steps; blending on those would shorten the averaging
    horizon to decay^N per real update. With ema_every=N the EMA must be
    untouched after micro-step 1 and blended exactly once after step 2."""
    from ddm_tpu.parallel import (REPLICATED_RULES, make_mesh,
                                  make_sharded_train_step,
                                  place_train_state, shard_batch)

    model = DDDMMLP()
    x = jnp.zeros((8, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((8,)), x)
    inner = optax.adam(1e-2)
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=optax.MultiSteps(inner, every_k_schedule=2),
        ema_params=jax.tree.map(jnp.copy, params),
    )
    mesh = make_mesh(tp=1)
    state, shardings = place_train_state(state, mesh, REPLICATED_RULES)
    step = make_sharded_train_step(
        model.apply, mesh, shardings, m=2, beta=0.1, lam=1.0, w_bias=0.0,
        ema_decay=0.5, ema_every=2,
    )
    ema0 = jax.tree.map(np.asarray, jax.device_get(state.ema_params))
    batch = jax.random.normal(jax.random.PRNGKey(1), (8, 2))

    state, _ = step(state, jax.random.PRNGKey(2), shard_batch(batch, mesh))
    for a, b in zip(jax.tree.leaves(ema0),
                    jax.tree.leaves(jax.device_get(state.ema_params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    state, _ = step(state, jax.random.PRNGKey(3), shard_batch(batch, mesh))
    for e0, e1, p1 in zip(jax.tree.leaves(ema0),
                          jax.tree.leaves(jax.device_get(state.ema_params)),
                          jax.tree.leaves(jax.device_get(state.params))):
        np.testing.assert_allclose(
            np.asarray(e1), (np.asarray(e0) + np.asarray(p1)) / 2,
            rtol=1e-5, atol=1e-7)


def test_cifar_cli_ema_end_to_end(tmp_path):
    """--ema-decay trains, checkpoints both trees, and generate.py --ema
    samples from the average."""
    import generate

    cifar_cli.main([
        "--synthetic", "--epochs", "1", "--batch", "8",
        "--embed-dim", "64", "--depth", "1", "--heads", "2",
        "--time-embed", "16", "--m", "2", "--sample-batch", "4",
        "--sample-steps", "2", "--eval-every", "0", "--dtype", "float32",
        "--ema-decay", "0.99", "--out", str(tmp_path),
    ])
    ckpt = str(tmp_path / "model_final.ckpt")
    raw, _ = ckpt_lib.load_params(ckpt)
    avg, _ = ckpt_lib.load_params(ckpt, ema=True)
    assert not np.allclose(jax.tree.leaves(raw)[0], jax.tree.leaves(avg)[0])

    npz = tmp_path / "ema.npz"
    generate.main(["--ckpt", ckpt, "--ema", "--n", "2", "--batch", "2",
                   "--steps", "2", "--out", "", "--npz", str(npz)])
    x = np.load(npz)["samples"]
    assert np.isfinite(x).all()

    with open(tmp_path / "config.json") as f:
        assert json.load(f)["ema_decay"] == 0.99
