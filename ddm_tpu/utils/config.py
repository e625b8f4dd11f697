"""Config plumbing: argparse + optional YAML with fill-only-defaults merge.

Re-implementation of the reference's config system
(``/root/reference/run_example.py:19-57``, ``train_cifar10_dit.py:50-78``):

  * YAML values fill ONLY arguments still equal to their argparse default
    (CLI-explicit > YAML > default). Known side effect faithfully kept: an
    explicit CLI flag equal to the default is indistinguishable from unset.
  * Unknown YAML keys raise ``ValueError`` naming the key and file.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict

__all__ = ["load_yaml_config", "apply_config"]


def load_yaml_config(path: str) -> Dict[str, Any]:
    """Load a YAML mapping; empty file -> {}; non-mapping -> ValueError."""
    try:
        import yaml
    except ImportError as exc:  # pragma: no cover - defensive import guard
        raise RuntimeError(
            "Loading a --config YAML needs the pyyaml package; "
            "install it or drop the flag."
        ) from exc

    with open(path, "r", encoding="utf-8") as f:
        data = yaml.safe_load(f)
    if data is None:
        return {}
    if not isinstance(data, dict):
        raise ValueError(
            f"Config {path} must be a YAML mapping of parameter names to values."
        )
    return data


def apply_config(parser: argparse.ArgumentParser, args: argparse.Namespace) -> None:
    """Merge ``args.config`` (YAML) into ``args`` with fill-only-defaults."""
    if getattr(args, "config", None) is None:
        return

    config_data = load_yaml_config(args.config)
    for key, value in config_data.items():
        if not hasattr(args, key):
            raise ValueError(f"Unknown config key '{key}' in {args.config}")
        default = parser.get_default(key)
        current = getattr(args, key)
        if current == default:
            setattr(args, key, value)
