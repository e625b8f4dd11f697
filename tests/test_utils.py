"""Tests for utils: checkpointing round trips, profiling, plotting."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ddm_tpu.models.mlp import DDDMMLP
from ddm_tpu.training import TrainState
from ddm_tpu.utils import checkpoint as ck
from ddm_tpu.utils.plotting import plot_training_curves, save_image_grid, save_scatter
from ddm_tpu.utils.profiling import Throughput, trace


def _state(seed=0, lr=1e-3):
    model = DDDMMLP(hidden=16)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 2)),
                        jnp.zeros((1,)), jnp.zeros((1, 2)))
    return TrainState.create(apply_fn=model.apply, params=params,
                             tx=optax.adam(lr))


def test_params_checkpoint_roundtrip(tmp_path):
    state = _state()
    path = ck.save_checkpoint(str(tmp_path / "m.ckpt"), state.params,
                              config={"beta": 0.1, "m": 8})
    params, cfg = ck.load_checkpoint(path)
    assert cfg == {"beta": 0.1, "m": 8}
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_checkpoint_resumes_step_and_opt(tmp_path):
    state = _state()
    # advance a couple of steps so opt state is non-trivial
    g = jax.tree.map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads=g).apply_gradients(grads=g)
    path = ck.save_train_state(str(tmp_path / "s.ckpt"), state, config={"epoch": 2})
    restored, cfg = ck.restore_train_state(path, _state())
    assert cfg["epoch"] == 2
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_rejects_foreign_files(tmp_path):
    bad = tmp_path / "x.ckpt"
    bad.write_bytes(b"not a checkpoint at all")
    with pytest.raises(ValueError, match="not a ddm_tpu checkpoint"):
        ck.load_checkpoint(str(bad))


def test_latest_checkpoint_picks_highest_epoch(tmp_path):
    for e in (1, 12, 3):
        (tmp_path / f"model_epoch{e:03d}.ckpt").write_bytes(b"x")
    (tmp_path / "model_final.ckpt").write_bytes(b"x")
    assert ck.latest_checkpoint(str(tmp_path)).endswith("model_epoch012.ckpt")
    assert ck.latest_checkpoint(str(tmp_path / "missing")) is None


def test_throughput_counts():
    th = Throughput(window=4)
    for _ in range(6):
        th.update(10)
        time.sleep(0.01)
    assert th.overall > 0
    assert th.rate > 0
    assert th.per_chip <= th.rate


def test_trace_noop_without_logdir():
    with trace(None):
        pass  # must not start the profiler


def test_save_image_grid_layouts(tmp_path):
    imgs_nhwc = np.random.rand(5, 8, 8, 3).astype(np.float32)
    save_image_grid(imgs_nhwc, str(tmp_path / "a.png"))
    imgs_nchw = np.random.rand(4, 3, 8, 8).astype(np.float32)
    save_image_grid(imgs_nchw, str(tmp_path / "b.png"), nrow=2)
    assert (tmp_path / "a.png").stat().st_size > 0
    assert (tmp_path / "b.png").stat().st_size > 0
    with pytest.raises(ValueError, match="rank 4"):
        save_image_grid(np.zeros((8, 8, 3)), str(tmp_path / "c.png"))


def test_plot_training_curves_skips_mismatched_and_raises_when_empty(tmp_path):
    hist = {"step": [1, 2, 3], "loss": [1.0, 0.5, 0.2], "bad": [1.0]}
    path = plot_training_curves(hist, str(tmp_path / "p.png"),
                                title="t", xlabel="x", x_key="step")
    assert os.path.exists(path)
    with pytest.raises(ValueError, match="No metrics"):
        plot_training_curves({"step": [1, 2]}, str(tmp_path / "q.png"),
                             title="t", xlabel="x", x_key="step")


def test_save_scatter(tmp_path):
    pts = np.random.randn(100, 2)
    save_scatter(pts, str(tmp_path / "s.png"))
    assert (tmp_path / "s.png").stat().st_size > 0
