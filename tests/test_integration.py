"""Single-host integration tests (SURVEY §4): train-to-quality and artifacts.

The toy run uses the repo's own acceptance signal — MMD^2 against fresh GMM
samples after training (reference ``run_example.py:99-111``) — on a reduced
but real recipe. Slow-ish (~1 min on the CPU test runner); everything else
in the suite is unit-level.
"""

import json
import os

import jax
import numpy as np
import pytest

from ddm_tpu import TrainConfig, rbf_mmd2, sample_dddm, sample_gmm, train_dddm
from ddm_tpu.utils.checkpoint import load_checkpoint


def test_toy_trains_to_low_mmd(tmp_path):
    cfg = TrainConfig(epochs=700, batch=256, steps_per_scan=350, seed=0,
                      log_every=10**9)
    state, history = train_dddm(cfg, outdir=str(tmp_path), return_history=True)

    # training actually progressed and stayed finite
    assert len(history["step"]) == 700
    assert np.all(np.isfinite(history["loss"]))
    # confinement plateaus near the known optimum (~0.93-1.0 at this recipe)
    assert np.mean(history["confidence"][-50:]) < 1.1

    key = jax.random.PRNGKey(1)
    kg, kr = jax.random.split(key)
    xg = sample_dddm(state.apply_fn, state.params, kg, n_samples=2048,
                     steps=20, eps_churn=0.0)
    xr = sample_gmm(kr, 2048)
    mmd2 = float(rbf_mmd2(xg, xr, sigma=1.0))
    # the independent torch oracle reaches ~0.04 at 5000 steps; 700 steps on
    # a quarter batch should already be well under 0.5 (untrained ~1.0+)
    assert mmd2 < 0.5, mmd2

    # artifact contract (reference training.py:168-193)
    assert (tmp_path / "model.ckpt").exists()
    with open(tmp_path / "training_metrics.json") as f:
        metrics = json.load(f)
    assert set(metrics) == {"step", "loss", "confidence", "interaction", "weight"}
    assert (tmp_path / "training_dynamics.png").exists()

    # checkpoint round-trips
    params, saved_cfg = load_checkpoint(str(tmp_path / "model.ckpt"))
    assert saved_cfg["epochs"] == 700
    x2 = sample_dddm(state.apply_fn, params, kg, n_samples=64, steps=5,
                     eps_churn=0.0)
    x1 = sample_dddm(state.apply_fn, state.params, kg, n_samples=64, steps=5,
                     eps_churn=0.0)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)
