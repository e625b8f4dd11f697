"""CLI contract tests (argparse validation, config precedence) — no compute."""

import argparse

import pytest

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


def test_shipped_configs_parse_against_cifar_cli():
    """Every shipped CIFAR yaml must be consumable by the CLI parser."""
    import os

    import yaml

    for name in ("cifar10_dit.yaml", "cifar10_dit_b.yaml"):
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
