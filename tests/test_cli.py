"""CLI contract tests (argparse validation, config precedence, smoke runs)."""

import argparse
import json
import sys

import numpy as np
import pytest

import run_example as toy_cli
import train_cifar10_dit as cifar_cli
from ddm_tpu.utils.config import apply_config


def test_cifar_cli_rejects_m_below_two(capsys):
    with pytest.raises(SystemExit):
        cifar_cli.main(["--m", "1", "--synthetic"])
    assert "m must be >= 2" in capsys.readouterr().err


def test_cifar_cli_rejects_bad_eval_args(capsys):
    with pytest.raises(SystemExit):
        cifar_cli.main(["--eval-every", "1", "--eval-samples", "0"])
    assert "--eval-samples" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cifar_cli.main(["--eval-batch", "0"])


def test_config_precedence_cli_over_yaml(tmp_path):
    """CLI-explicit > YAML > default (fill-only-defaults merge)."""
    cfg = tmp_path / "c.yaml"
    cfg.write_text("epochs: 7\nbatch: 99\n")
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch", type=int, default=128)
    args = parser.parse_args(["--config", str(cfg), "--epochs", "3"])
    apply_config(parser, args)
    assert args.epochs == 3  # CLI wins
    assert args.batch == 99  # YAML fills the default


def test_config_empty_yaml_is_noop(tmp_path):
    cfg = tmp_path / "empty.yaml"
    cfg.write_text("")
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--x", type=int, default=5)
    args = parser.parse_args(["--config", str(cfg)])
    apply_config(parser, args)
    assert args.x == 5


def test_config_non_mapping_yaml_rejected(tmp_path):
    cfg = tmp_path / "list.yaml"
    cfg.write_text("- a\n- b\n")
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    args = parser.parse_args(["--config", str(cfg)])
    with pytest.raises(ValueError, match="mapping"):
        apply_config(parser, args)


def test_toy_cli_end_to_end(tmp_path, monkeypatch):
    """The toy entry point trains, samples, and writes every artifact."""
    monkeypatch.setattr(sys, "argv", [
        "run_example.py", "--epochs", "20", "--batch", "32",
        "--steps", "3", "--steps-per-scan", "10", "--eps-churn", "0.0",
        "--out", str(tmp_path),
    ])
    toy_cli.main()
    with open(tmp_path / "metrics.json") as f:
        payload = json.load(f)
    assert "mmd2_rbf_sigma1" in payload
    assert payload["sampling"]["samples_per_sec"] > 0
    assert len(payload["training"]["step"]) == 20
    for artifact in ("gen.png", "ref.png", "model.ckpt",
                     "training_metrics.json", "training_dynamics.png"):
        assert (tmp_path / artifact).exists(), artifact


def test_cifar_cli_end_to_end(tmp_path, monkeypatch):
    """The CIFAR entry point runs an epoch on synthetic data with eval and
    writes the reference artifact set. (FID embedder construction is forced
    to fail so the test exercises the documented MMD-only degradation
    instead of compiling Inception on the CPU runner.)"""
    import ddm_tpu.models.inception as inception_mod

    def _raise(*a, **k):
        raise RuntimeError("no inception in tests")

    monkeypatch.setattr(inception_mod, "InceptionEmbedding", _raise)
    cifar_cli.main([
        "--synthetic", "--epochs", "1", "--batch", "16",
        "--embed-dim", "64", "--depth", "1", "--heads", "2",
        "--time-embed", "16", "--m", "2", "--sample-batch", "4",
        "--sample-steps", "2", "--eval-every", "1", "--eval-samples", "32",
        "--eval-batch", "16", "--mmd-samples", "32", "--fid-samples", "32",
        "--ckpt-every", "1", "--dtype", "float32", "--out", str(tmp_path),
    ])
    for artifact in ("model_epoch001.ckpt", "model_final.ckpt", "config.json",
                     "samples.png", "train_metrics.json", "epoch_metrics.json",
                     "eval_metrics.json", "train_dynamics.png"):
        assert (tmp_path / artifact).exists(), artifact
    with open(tmp_path / "eval_metrics.json") as f:
        ev = json.load(f)
    assert "mmd" in ev and len(ev["epoch"]) == 1


def test_cifar_cli_dry_eval(tmp_path):
    """--dry-eval rehearses the full FID+MMD protocol with no training:
    real stats from the test loader, samples from the untrained model
    through the real (random-fallback here) Inception tower, and writes
    eval_metrics.json. This is the 'drop weights at a path and go'
    rehearsal for the first networked run."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random-weights fallback warns
        cifar_cli.main([
            "--synthetic", "--dry-eval", "--batch", "16",
            "--embed-dim", "64", "--depth", "1", "--heads", "2",
            "--time-embed", "16", "--m", "2",
            "--sample-steps", "2", "--eval-samples", "8",
            "--eval-batch", "8", "--mmd-samples", "8", "--fid-samples", "8",
            "--dtype", "float32", "--out", str(tmp_path),
        ])
    with open(tmp_path / "eval_metrics.json") as f:
        ev = json.load(f)
    assert set(ev) >= {"epoch", "fid", "mmd"}
    assert ev["epoch"] == [0]
    import numpy as np

    assert np.isfinite(ev["fid"][0]) and np.isfinite(ev["mmd"][0])
    # no training artifacts
    assert not (tmp_path / "model_final.ckpt").exists()


def test_shipped_configs_parse_against_cifar_cli():
    """Every shipped CIFAR yaml must be consumable by the CLI parser."""
    import os

    import yaml

    for name in ("cifar10_dit.yaml", "cifar10_dit_b.yaml",
                 "cifar10_dit_l.yaml", "cifar10_dit_moe.yaml"):
        path = os.path.join(os.path.dirname(cifar_cli.__file__), "configs", name)
        with open(path) as f:
            data = yaml.safe_load(f)
        # reuse the real parser: unknown keys must not exist
        parser_args = []
        ns = None
        try:
            # build the parser exactly as main() does, but don't train
            import unittest.mock as mock

            with mock.patch.object(cifar_cli, "train") as fake_train:
                cifar_cli.main(["--config", path])
                ns = fake_train.call_args[0][0]
        except SystemExit as exc:  # pragma: no cover
            raise AssertionError(f"{name} rejected: {exc}") from exc
        for key, value in data.items():
            assert hasattr(ns, key), f"{name}: unknown key {key}"


def test_cli_model_defaults_match_factory():
    """The train CLI's model/sampler flag defaults and the package factory
    defaults are one source of truth (VERDICT r2: generate.py used to
    hand-duplicate them and the copies could drift)."""
    from ddm_tpu.models.factory import MODEL_DEFAULTS, SAMPLER_DEFAULTS

    ns = cifar_cli.build_parser().parse_args([])
    for key, value in {**MODEL_DEFAULTS, **SAMPLER_DEFAULTS}.items():
        assert getattr(ns, key) == value, key


def test_generate_cli_from_checkpoint(tmp_path):
    """generate.py rebuilds the model from the ckpt-embedded run config and
    samples without any training-side state: PNG grid + NPZ with samples in
    [-1, 1] at the run's image size (the inference/serving surface)."""
    import numpy as np

    import generate as generate_cli

    out = tmp_path / "run"
    cifar_cli.main([
        "--synthetic", "--epochs", "1", "--batch", "8",
        "--embed-dim", "64", "--depth", "1", "--heads", "2",
        "--time-embed", "16", "--m", "2", "--sample-batch", "0",
        "--eval-every", "0", "--ckpt-every", "1", "--dtype", "float32",
        "--out", str(out),
    ])
    png = tmp_path / "gen.png"
    npz = tmp_path / "gen.npz"
    generate_cli.main([
        "--ckpt", str(out), "--n", "6", "--batch", "4", "--steps", "2",
        "--out", str(png), "--npz", str(npz), "--seed", "3",
    ])
    assert png.exists()
    data = np.load(npz)["samples"]
    assert data.shape == (6, 32, 32, 3)
    assert np.all(data >= -1.0) and np.all(data <= 1.0)
    assert np.std(data) > 0

    # deterministic given the same seed/steps
    npz2 = tmp_path / "gen2.npz"
    generate_cli.main([
        "--ckpt", str(out / "model_final.ckpt"), "--n", "6", "--batch", "4",
        "--steps", "2", "--out", "", "--npz", str(npz2), "--seed", "3",
    ])
    np.testing.assert_array_equal(data, np.load(npz2)["samples"])

    # --config overlays the ckpt config: a partial override file touching
    # only sampler keys must NOT reset the model keys (embed_dim=64 here)
    # to DiT-S defaults — the params would no longer fit the model.
    override = tmp_path / "override.json"
    override.write_text(json.dumps({"eps_churn": 0.0}))
    npz3 = tmp_path / "gen3.npz"
    generate_cli.main([
        "--ckpt", str(out), "--config", str(override), "--n", "2",
        "--batch", "2", "--steps", "2", "--out", "", "--npz", str(npz3),
    ])
    assert np.load(npz3)["samples"].shape == (2, 32, 32, 3)


def test_cifar_cli_pipeline_parallel(tmp_path, monkeypatch):
    """--pp 2 end-to-end: pipeline-staged training epoch + eval + sampling
    on the virtual 8-device mesh (data=4 x pipe=2). Exercises the
    pipeline param re-pack (to/from_pipeline_params), the staged shard_map
    step, the pipe-axis grad clipper, and the canonical-params conversion
    that sampling/eval need."""
    import ddm_tpu.models.inception as inception_mod

    def _raise(*a, **k):
        raise RuntimeError("no inception in tests")

    monkeypatch.setattr(inception_mod, "InceptionEmbedding", _raise)
    cifar_cli.main([
        "--synthetic", "--epochs", "1", "--batch", "16",
        "--embed-dim", "64", "--depth", "2", "--heads", "2",
        "--time-embed", "16", "--m", "2", "--pp", "2",
        "--pp-microbatches", "2", "--sample-batch", "4",
        "--sample-steps", "2", "--eval-every", "1", "--eval-samples", "32",
        "--eval-batch", "16", "--mmd-samples", "32", "--fid-samples", "32",
        "--ckpt-every", "1", "--dtype", "float32", "--out", str(tmp_path),
    ])
    for artifact in ("model_epoch001.ckpt", "model_final.ckpt",
                     "samples.png", "eval_metrics.json"):
        assert (tmp_path / artifact).exists(), artifact
    with open(tmp_path / "eval_metrics.json") as f:
        ev = json.load(f)
    assert "mmd" in ev and len(ev["epoch"]) == 1

    # a --pp checkpoint (staged {'embed','stages'} layout on disk) must
    # load into the PLAIN model for inference: load_params re-packs it
    import generate as gen_cli

    npz = tmp_path / "pp_samples.npz"
    gen_cli.main([
        "--ckpt", str(tmp_path / "model_final.ckpt"), "--n", "2",
        "--batch", "2", "--steps", "2", "--out", "", "--npz", str(npz),
    ])
    assert np.load(npz)["samples"].shape == (2, 32, 32, 3)


def test_cifar_cli_pp_validation(capsys):
    with pytest.raises(SystemExit):
        cifar_cli.main(["--pp", "2", "--fsdp"])
    assert "--pp does not compose with --fsdp" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cifar_cli.main(["--pp", "3", "--depth", "8"])
    assert "--pp must divide --depth" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cifar_cli.main(["--pp", "2", "--mlp-persist", "4"])
    assert "--mlp-persist does not compose" in capsys.readouterr().err
    with pytest.raises(SystemExit):  # 8 virtual devices: pp=2 -> dp=4
        cifar_cli.main(["--pp", "2", "--batch", "30"])
    assert "data shards" in capsys.readouterr().err
    with pytest.raises(SystemExit):  # rows = 32/4*8 = 64, not / 3
        cifar_cli.main(["--pp", "2", "--batch", "32",
                        "--pp-microbatches", "3"])
    assert "per-shard row count" in capsys.readouterr().err


def test_cifar_cli_sequence_parallel(tmp_path, monkeypatch):
    """--tp 2 --sp end-to-end: sequence-parallel training epoch + sampling
    on the virtual 8-device mesh (data=4 x model=2). Exercises the
    token-sharded block stack inside the shard_map step plus the plain
    (full-weight, SP-inert) instance for sampling."""
    import ddm_tpu.models.inception as inception_mod

    def _raise(*a, **k):
        raise RuntimeError("no inception in tests")

    monkeypatch.setattr(inception_mod, "InceptionEmbedding", _raise)
    cifar_cli.main([
        "--synthetic", "--epochs", "1", "--batch", "16",
        "--embed-dim", "64", "--depth", "2", "--heads", "2",
        "--time-embed", "16", "--m", "2", "--tp", "2", "--sp",
        "--sample-batch", "4", "--sample-steps", "2", "--eval-every", "0",
        "--ckpt-every", "1", "--dtype", "float32", "--out", str(tmp_path),
    ])
    for artifact in ("model_final.ckpt", "samples.png", "config.json"):
        assert (tmp_path / artifact).exists(), artifact
    with open(tmp_path / "config.json") as f:
        assert json.load(f)["sp"] is True


def test_cifar_cli_sp_validation(capsys):
    with pytest.raises(SystemExit):
        cifar_cli.main(["--sp"])
    assert "requires --tp > 1" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cifar_cli.main(["--sp", "--tp", "6", "--image-size", "16",
                        "--patch-size", "4"])  # 16 tokens % 6 != 0
    assert "divisible" in capsys.readouterr().err


def test_cifar_cli_3d_parallel(tmp_path, monkeypatch):
    """--pp 2 --tp 2 --sp end-to-end on the 8-device mesh (data=2 x pipe=2
    x model=2): 3-D staged training + checkpoint + sampling, then
    generate.py from the staged checkpoint."""
    import ddm_tpu.models.inception as inception_mod

    def _raise(*a, **k):
        raise RuntimeError("no inception in tests")

    monkeypatch.setattr(inception_mod, "InceptionEmbedding", _raise)
    cifar_cli.main([
        "--synthetic", "--epochs", "1", "--batch", "8",
        "--embed-dim", "64", "--depth", "2", "--heads", "2",
        "--time-embed", "16", "--m", "2", "--pp", "2", "--tp", "2", "--sp",
        "--pp-microbatches", "2", "--sample-batch", "4",
        "--sample-steps", "2", "--eval-every", "0", "--ckpt-every", "1",
        "--dtype", "float32", "--out", str(tmp_path),
    ])
    for artifact in ("model_final.ckpt", "samples.png", "config.json"):
        assert (tmp_path / artifact).exists(), artifact

    import generate as gen_cli

    npz = tmp_path / "s3d.npz"
    gen_cli.main([
        "--ckpt", str(tmp_path / "model_final.ckpt"), "--n", "2",
        "--batch", "2", "--steps", "2", "--out", "", "--npz", str(npz),
    ])
    assert np.load(npz)["samples"].shape == (2, 32, 32, 3)


def test_cifar_cli_moe_expert_parallel(tmp_path, monkeypatch):
    """--moe-experts 4 --tp 2 end-to-end: expert-parallel MoE training +
    sampling on the virtual mesh (experts sharded E/tp per model shard),
    then generate.py from the MoE checkpoint."""
    import ddm_tpu.models.inception as inception_mod

    def _raise(*a, **k):
        raise RuntimeError("no inception in tests")

    monkeypatch.setattr(inception_mod, "InceptionEmbedding", _raise)
    cifar_cli.main([
        "--synthetic", "--epochs", "1", "--batch", "16",
        "--embed-dim", "64", "--depth", "2", "--heads", "2",
        "--time-embed", "16", "--m", "2", "--tp", "2",
        "--moe-experts", "4", "--sample-batch", "4", "--sample-steps", "2",
        "--eval-every", "0", "--ckpt-every", "1", "--dtype", "float32",
        "--out", str(tmp_path),
    ])
    assert (tmp_path / "model_final.ckpt").exists()

    import generate as gen_cli

    npz = tmp_path / "moe.npz"
    gen_cli.main([
        "--ckpt", str(tmp_path / "model_final.ckpt"), "--n", "2",
        "--batch", "2", "--steps", "2", "--out", "", "--npz", str(npz),
    ])
    assert np.load(npz)["samples"].shape == (2, 32, 32, 3)


def test_cifar_cli_lr_schedule_and_grad_accum(tmp_path):
    """--lr-schedule cosine --warmup-steps and --grad-accum train end-to-end
    on synthetic data and write the artifact set; train metrics stay finite
    (the schedule and MultiSteps wrapper live inside the compiled step)."""
    cifar_cli.main([
        "--synthetic", "--epochs", "1", "--batch", "8",
        "--embed-dim", "64", "--depth", "1", "--heads", "2",
        "--time-embed", "16", "--m", "2", "--sample-batch", "0",
        "--eval-every", "0", "--dtype", "float32",
        "--lr-schedule", "cosine", "--warmup-steps", "4",
        "--lr-min", "1e-6", "--grad-accum", "2", "--out", str(tmp_path),
    ])
    with open(tmp_path / "train_metrics.json") as f:
        hist = json.load(f)
    assert all(np.isfinite(hist["loss"]))


def test_grad_accum_matches_large_batch():
    """MultiSteps wiring: N micro-steps at batch B == one step at batch N*B
    when the SAME per-microbatch grads feed both (params untouched until
    the N-th micro-step, then updated with the mean gradient)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ddm_tpu.models.mlp import DDDMMLP
    from ddm_tpu.training import TrainState, make_loss_fn

    model = DDDMMLP()
    x = jnp.zeros((4, 2))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((4,)), x)
    hp = dict(m=2, beta=0.1, lam=1.0, w_bias=0.0)
    loss_fn = make_loss_fn(model.apply, **hp)
    keys = [jax.random.PRNGKey(7), jax.random.PRNGKey(8)]
    batches = [jax.random.normal(k, (4, 2)) for k in keys]

    inner = optax.chain(optax.clip_by_global_norm(1e-3), optax.adam(1e-3))
    acc = TrainState.create(
        apply_fn=model.apply, params=jax.tree.map(jnp.copy, params),
        tx=optax.MultiSteps(inner, every_k_schedule=2),
    )
    p0 = acc.params
    grads = []
    for k, b in zip(keys, batches):
        (_, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            acc.params, k, b)
        grads.append(g)
        acc = acc.apply_gradients(grads=g)
        if len(grads) == 1:  # params must not move on the first micro-step
            for a, b2 in zip(jax.tree.leaves(p0), jax.tree.leaves(acc.params)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))

    ref = TrainState.create(
        apply_fn=model.apply, params=jax.tree.map(jnp.copy, params), tx=inner)
    mean_g = jax.tree.map(lambda a, b: (a + b) / 2, *grads)
    ref = ref.apply_gradients(grads=mean_g)
    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(acc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_cifar_cli_moe_validation(capsys):
    with pytest.raises(SystemExit):
        cifar_cli.main(["--moe-experts", "3", "--tp", "2"])
    assert "divisible by --tp" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cifar_cli.main(["--moe-experts", "4", "--mlp-persist", "2"])
    assert "dense MLP half" in capsys.readouterr().err


def test_bench_flop_counter_moe_accounting():
    """The audited MFU counter: MoE model FLOPs = dense with the MLP term
    replaced by router + topk * capacity * dense-MLP (GShard accounting;
    dispatch/combine excluded) — pins the maths the bench JSON's MFU
    claims derive from."""
    import bench

    common = dict(img=32, patch=4, dim=384, depth=8, heads=6,
                  time_dim=256, mlp_ratio=4.0, m=8)
    dense, _ = bench.dit_train_flops_per_image(**common)
    moe, _ = bench.dit_train_flops_per_image(
        **common, moe_experts=8, moe_capacity=1.25, moe_topk=2)
    n_tok = (32 // 4) ** 2
    mlp_dense = 2 * 2 * n_tok * 384 * 1536
    router = 2 * n_tok * 384 * 8
    # swap per-block MLP term: fwd scale = 3 (fwd+bwd) * m=8 * depth=8
    expected = dense + 3 * 8 * 8 * (router + 2 * 1.25 * mlp_dense - mlp_dense)
    np.testing.assert_allclose(moe, expected, rtol=1e-12)
    # remat adds exactly one forward set
    _, hw = bench.dit_train_flops_per_image(**common, remat=True)
    np.testing.assert_allclose(hw, dense / 3 * 4, rtol=1e-12)


def test_moe_attn_bi_default_does_not_leak(monkeypatch, tmp_path):
    """The MoE-at-DiT-B-width DDM_TPU_ATTN_BWD_BI=2 default must be
    restored after main() returns: programmatic callers (this very test
    suite) would otherwise run every LATER dense model with a silently
    capped attention backward."""
    import os
    import unittest.mock as mock

    monkeypatch.delenv("DDM_TPU_ATTN_BWD_BI", raising=False)
    with mock.patch.object(cifar_cli, "train") as fake_train:
        def check_set(args):
            assert os.environ.get("DDM_TPU_ATTN_BWD_BI") == "2"
        fake_train.side_effect = check_set
        cifar_cli.main([
            "--synthetic", "--moe-experts", "8", "--embed-dim", "768",
            "--heads", "12", "--depth", "12", "--out", str(tmp_path),
        ])
    assert "DDM_TPU_ATTN_BWD_BI" not in os.environ

    # a user-exported value is NOT touched (and not popped)
    monkeypatch.setenv("DDM_TPU_ATTN_BWD_BI", "4")
    with mock.patch.object(cifar_cli, "train"):
        cifar_cli.main([
            "--synthetic", "--moe-experts", "8", "--embed-dim", "768",
            "--heads", "12", "--depth", "12", "--out", str(tmp_path),
        ])
    assert os.environ["DDM_TPU_ATTN_BWD_BI"] == "4"


def test_sweep_toy_smoke(tmp_path, monkeypatch):
    """The sweep driver runs a tiny grid end-to-end and writes sweep.json
    with the reference-protocol fields per cell."""
    import sweep_toy

    monkeypatch.setattr(sys, "argv", [
        "sweep_toy.py", "--m-values", "2", "3", "--epochs", "6",
        "--batch", "16", "--steps", "2", "--steps-per-scan", "3",
        "--out", str(tmp_path),
    ])
    sweep_toy.main()
    with open(tmp_path / "sweep.json") as f:
        rows = json.load(f)
    assert [r["m"] for r in rows] == [2, 3]
    for r in rows:
        assert np.isfinite(r["mmd2_rbf_sigma1"])
        assert r["steps_per_sec"] > 0
