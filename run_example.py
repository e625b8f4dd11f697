"""Toy 2-D GMM entry point (paper Section 6.1): train, sample, evaluate.

TPU-native re-implementation of the reference's ``run_example.py``: the CLI
surface (flag names, defaults, YAML fill-only-defaults merge, unknown-key
rejection), the artifact set (``gen.png``, ``ref.png``, ``metrics.json``
with ``mmd2_rbf_sigma1`` plus the full per-step training history) and the
final print are parity contracts. Everything else is JAX-shaped: explicit
PRNG keys, a TrainState instead of a mutable module, a jitted
``lax.scan`` sampler, and a sampling-throughput block in the metrics
payload. ``--device cpu`` forces the CPU backend (useful for CI and
air-gapped smoke runs); any other value leaves placement to the JAX
runtime (TPU when present).
"""

import argparse
import json
import os
import time
from typing import Any

import jax

from ddm_tpu import (
    TrainConfig,
    rbf_mmd2,
    sample_dddm,
    sample_gmm,
    save_scatter,
    train_dddm,
)
from ddm_tpu.utils.config import apply_config

# Flag table: (name, kwargs). The first block is the reference CLI surface
# verbatim (names and defaults are the parity contract, except --device
# whose default is this framework's accelerator); the second block is
# ddm_tpu-specific additions.
_REFERENCE_FLAGS = (
    ("--config", dict(type=str, default=None, help="Optional YAML config")),
    ("--epochs", dict(type=int, default=10000)),
    ("--batch", dict(type=int, default=512)),
    ("--beta", dict(type=float, default=0.1)),
    ("--lam", dict(type=float, default=1.0)),
    ("--m", dict(type=int, default=8)),
    ("--w-bias", dict(type=float, default=0.0, dest="w_bias")),
    ("--lr", dict(type=float, default=2e-3)),
    ("--steps", dict(type=int, default=20)),
    ("--device", dict(type=str, default="tpu")),
    ("--seed", dict(type=int, default=0)),
    ("--out", dict(type=str, default="./out")),
    ("--wandb", dict(action="store_true", dest="use_wandb")),
    ("--wandb-project", dict(type=str, default="dddm")),
    ("--wandb-name", dict(type=str, default=None)),
)
_DDM_TPU_FLAGS = (
    ("--steps-per-scan", dict(
        type=int, default=100,
        help="training steps fused per lax.scan program")),
    ("--eps-churn", dict(
        type=float, default=1.0, dest="eps_churn",
        help="sampler churn (reference hardcodes 1.0 on the toy path; 0.0 "
             "gives the deterministic bridge and markedly better toy MMD)")),
    ("--debug-nans", dict(
        action="store_true",
        help="enable jax_debug_nans (numerics debugging; slow)")),
)

# TrainConfig fields fed straight from same-named argparse results.
_CFG_FIELDS = ("beta", "lam", "m", "w_bias", "lr", "epochs", "batch",
               "device", "seed", "use_wandb", "wandb_project",
               "steps_per_scan")


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    for name, kw in _REFERENCE_FLAGS + _DDM_TPU_FLAGS:
        p.add_argument(name, **kw)
    return p


def _serialize_history(history: dict) -> dict:
    """History lists hold numpy scalars; coerce to plain ints/floats for JSON."""
    return {
        key: [int(v) for v in values] if key == "step"
        else [float(v) for v in values]
        for key, values in history.items()
    }


def main(argv=None) -> None:
    parser = _build_parser()
    args = parser.parse_args(argv)
    apply_config(parser, args)  # YAML fills only still-default values
    if args.device == "cpu":
        # force the CPU backend before the first device query (see the
        # same handling in train_cifar10_dit.main)
        jax.config.update("jax_platforms", "cpu")
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    import ddm_tpu

    ddm_tpu.disable_cache_if_cpu_backend()

    cfg = TrainConfig(
        wandb_run_name=args.wandb_name,
        **{f: getattr(args, f) for f in _CFG_FIELDS},
    )
    os.makedirs(args.out, exist_ok=True)

    # Train (jitted scan-fused loop), then evaluate exactly like the
    # reference protocol: 4096 generated vs 4096 fresh GMM samples,
    # unbiased RBF MMD^2 at sigma=1.
    state, history = train_dddm(cfg, outdir=args.out, return_history=True)

    kgen, kref = jax.random.split(jax.random.PRNGKey(cfg.seed + 1))
    t0 = time.perf_counter()
    xgen = sample_dddm(state.apply_fn, state.params, kgen, n_samples=4096,
                       steps=args.steps, eps_churn=args.eps_churn)
    xgen.block_until_ready()
    sample_secs = time.perf_counter() - t0
    xref = sample_gmm(kref, 4096)
    mmd2 = float(rbf_mmd2(xgen, xref, sigma=1.0))

    for points, fname in ((xgen, "gen.png"), (xref, "ref.png")):
        save_scatter(points, os.path.join(args.out, fname))

    payload: dict[str, Any] = {
        "mmd2_rbf_sigma1": mmd2,
        "sampling": {
            "samples_per_sec": 4096 / sample_secs,
            "steps": args.steps,
        },
        "training": _serialize_history(history),
    }
    with open(os.path.join(args.out, "metrics.json"), "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=2)
    print(f"MMD^2 (rbf σ=1) = {mmd2:.4f}")
    print(f"Saved samples and metrics in {args.out}")


if __name__ == "__main__":
    main()
