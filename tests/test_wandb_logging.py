"""W&B logging-path tests using a mock module (wandb is not installed here).

Verifies the reference namespace scheme (SURVEY §5.5): toy logs ``train/*``
per step and ``plots/*`` images; missing wandb raises the reference's
friendly RuntimeError.
"""

import sys
import types

import numpy as np
import pytest

from ddm_tpu import TrainConfig, train_dddm


class _FakeRun:
    def __init__(self):
        self.logged = []
        self.finished = False

    def log(self, payload, step=None):
        self.logged.append((step, payload))

    def finish(self):
        self.finished = True


@pytest.fixture()
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    runs = []

    def init(**kwargs):
        run = _FakeRun()
        run.init_kwargs = kwargs
        runs.append(run)
        return run

    mod.init = init
    mod.Image = lambda path: ("image", path)
    mod._runs = runs
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_toy_wandb_namespaces(tmp_path, fake_wandb):
    cfg = TrainConfig(epochs=6, batch=32, steps_per_scan=3, use_wandb=True,
                      wandb_project="proj-x", wandb_run_name="run-y")
    train_dddm(cfg, outdir=str(tmp_path))

    (run,) = fake_wandb._runs
    assert run.init_kwargs["project"] == "proj-x"
    assert run.init_kwargs["name"] == "run-y"
    assert run.finished

    train_logs = [(s, p) for s, p in run.logged if any(k.startswith("train/") for k in p)]
    assert len(train_logs) == 6  # one per step
    steps = [s for s, _ in train_logs]
    assert steps == [1, 2, 3, 4, 5, 6]
    assert set(train_logs[0][1]) == {
        "train/loss", "train/confidence", "train/interaction", "train/weight"
    }

    plot_logs = [p for _, p in run.logged if any(k.startswith("plots/") for k in p)]
    assert len(plot_logs) == 1
    ((kind, path),) = plot_logs[0].values()
    assert kind == "image" and path.endswith("training_dynamics.png")


def test_missing_wandb_raises_friendly_error(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # force import failure
    cfg = TrainConfig(epochs=1, batch=8, use_wandb=True)
    with pytest.raises((RuntimeError, ImportError), match="[Ww]andb|Weights"):
        train_dddm(cfg, outdir=str(tmp_path))
