"""Minimal example to train & sample on 2D GMM, matching Section 6.1.

TPU-native re-implementation of ``/root/reference/run_example.py``: identical
CLI surface (flags, YAML fill-only-defaults merge, unknown-key rejection),
identical artifacts (``gen.png``, ``ref.png``, ``metrics.json`` with
``mmd2_rbf_sigma1`` plus the full per-step training history), identical final
print. The ``--device`` flag is recorded for parity but placement is decided
by the JAX runtime (TPU when present).
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


def _serialize_history(history: dict) -> dict:
    """History lists hold numpy scalars; coerce to plain ints/floats for JSON."""
    return {
        key: [int(v) for v in values] if key == "step"
        else [float(v) for v in values]
        for key, values in history.items()
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default=None, help="Optional YAML config")
    p.add_argument("--epochs", type=int, default=10000)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--beta", type=float, default=0.1)
    p.add_argument("--lam", type=float, default=1.0)
    p.add_argument("--m", type=int, default=8)
    p.add_argument("--w-bias", type=float, default=0.0, dest="w_bias")
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--device", type=str, default="tpu")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="./out")
    p.add_argument("--wandb", action="store_true", dest="use_wandb")
    p.add_argument("--wandb-project", type=str, default="dddm")
    p.add_argument("--wandb-name", type=str, default=None)
    # ddm_tpu additions:
    p.add_argument("--steps-per-scan", type=int, default=100,
                   help="training steps fused per lax.scan program")
    p.add_argument("--eps-churn", type=float, default=1.0, dest="eps_churn",
                   help="sampler churn (reference hardcodes 1.0 on the toy "
                        "path; 0.0 gives the deterministic bridge and "
                        "markedly better toy MMD)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (numerics debugging; slow)")
    args = p.parse_args(argv)
    apply_config(p, args)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    import ddm_tpu

    ddm_tpu.disable_cache_if_cpu_backend()

    cfg = TrainConfig(
        beta=args.beta,
        lam=args.lam,
        m=args.m,
        w_bias=args.w_bias,
        lr=args.lr,
        epochs=args.epochs,
        batch=args.batch,
        device=args.device,
        seed=args.seed,
        use_wandb=args.use_wandb,
        wandb_project=args.wandb_project,
        wandb_run_name=args.wandb_name,
        steps_per_scan=args.steps_per_scan,
    )
    os.makedirs(args.out, exist_ok=True)

    state, history = train_dddm(cfg, outdir=args.out, return_history=True)

    eval_key = jax.random.PRNGKey(cfg.seed + 1)
    kgen, kref = jax.random.split(eval_key)
    t0 = time.perf_counter()
    xgen = sample_dddm(state.apply_fn, state.params, kgen, n_samples=4096,
                       steps=args.steps, eps_churn=args.eps_churn)
    xgen.block_until_ready()
    sample_secs = time.perf_counter() - t0
    xref = sample_gmm(kref, 4096)
    mmd2 = float(rbf_mmd2(xgen, xref, sigma=1.0))

    save_scatter(xgen, os.path.join(args.out, "gen.png"))
    save_scatter(xref, os.path.join(args.out, "ref.png"))

    payload: dict[str, Any] = {"mmd2_rbf_sigma1": mmd2}
    payload["sampling"] = {
        "samples_per_sec": 4096 / sample_secs,
        "steps": args.steps,
    }
    payload["training"] = _serialize_history(history)

    with open(os.path.join(args.out, "metrics.json"), "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=2)
    print(f"MMD^2 (rbf σ=1) = {mmd2:.4f}")
    print(f"Saved samples and metrics in {args.out}")


if __name__ == "__main__":
    main()
