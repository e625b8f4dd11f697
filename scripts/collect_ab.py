"""Merge the per-arm eval metrics of scripts/ab_quality.sh into ONE JSON.

Reads ``<out>/<arm>/eval_metrics.json`` (the trainer's eval artifact:
``{"epoch": [...], "fid": [...], "mmd": [...]}`` — FID present only when
the Inception tower had weights), takes each metric's FINAL value, and
writes ``<out>/ab_quality.json``::

    {"arms": {arm: {metric: value}}, "delta_vs_base": {arm: {metric: d}}}

Usage: python scripts/collect_ab.py <out_dir> [arm ...]
"""

from __future__ import annotations

import json
import os
import sys

ARMS = ("base", "fast_gelu", "fid_bf16", "churn0", "moe_top1", "moe_top2")


def collect(out_dir: str, arms=ARMS) -> dict:
    result: dict = {"arms": {}, "delta_vs_base": {}}
    for arm in arms:
        path = os.path.join(out_dir, arm, "eval_metrics.json")
        if not os.path.exists(path):
            result["arms"][arm] = None  # arm skipped/failed: visible, not fatal
            continue
        with open(path, encoding="utf-8") as f:
            hist = json.load(f)
        result["arms"][arm] = {
            k: float(v[-1]) for k, v in hist.items() if k != "epoch" and v
        }
    base = result["arms"].get("base") or {}
    for arm, metrics in result["arms"].items():
        if arm == "base" or not metrics:
            continue
        result["delta_vs_base"][arm] = {
            k: metrics[k] - base[k] for k in metrics if k in base
        }
    return result


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    out_dir = argv[0]
    arms = tuple(argv[1:]) or ARMS
    result = collect(out_dir, arms)
    path = os.path.join(out_dir, "ab_quality.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(result, f, indent=2, sort_keys=True)
    for arm, metrics in result["arms"].items():
        print(f"[ab] {arm}: {metrics}")
    print(f"[ab] wrote {path}")


if __name__ == "__main__":
    main()
