"""Sample images from a trained DDDM DiT checkpoint (inference-only CLI).

The reference has no standalone inference surface — sampling only happens
inside ``train_cifar10_dit.py``'s trainer (``/root/reference/
train_cifar10_dit.py:239-256,318-341``). This CLI is the serving-side
capability addition: load a checkpoint (epoch or final, full-TrainState or
params-only payload), rebuild the model from the run config embedded in
the checkpoint, run the 20-step reverse sampler (paper Algorithm 2), and
write a PNG grid and/or an NPZ of raw samples.

The sampler math, churn semantics, and clamping match the trainer's eval
path exactly (``train_cifar10_dit.evaluate``).

Usage:
    python generate.py --ckpt out/model_final.ckpt --n 64 --out samples.png
    python generate.py --ckpt out/ --npz samples.npz   # dir -> latest epoch
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import ddm_tpu  # noqa: F401  (configures the compilation cache)
import jax
import numpy as np

from ddm_tpu.models.factory import (
    MODEL_DEFAULTS,
    SAMPLER_DEFAULTS,
    build_model,
)
from ddm_tpu.sampling import sample_dddm_batched
from ddm_tpu.utils import checkpoint as ckpt_lib
from ddm_tpu.utils.plotting import save_image_grid


def _resolve_ckpt(path: str) -> str:
    if os.path.isdir(path):
        final = os.path.join(path, "model_final.ckpt")
        if os.path.exists(final):
            return final
        latest = ckpt_lib.latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no .ckpt files under {path}")
        return latest
    return path


def main(argv: Optional[list] = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, required=True,
                   help="checkpoint file, or a training output dir "
                        "(model_final.ckpt, else the latest epoch ckpt)")
    p.add_argument("--config", type=str, default=None,
                   help="config.json overlaid on the ckpt-embedded config "
                        "(keys you specify win; unspecified keys keep the "
                        "run's values)")
    p.add_argument("--n", type=int, default=64, help="number of samples")
    p.add_argument("--batch", type=int, default=256,
                   help="sampler chunk size (one compile, bounded HBM)")
    p.add_argument("--steps", type=int, default=None,
                   help="reverse steps (default: the run's sample_steps)")
    p.add_argument("--eps-churn", type=float, default=None,
                   help="bridge churn (default: the run's eps_churn)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="samples.png",
                   help="PNG grid path ('' disables)")
    p.add_argument("--npz", type=str, default=None,
                   help="also save raw samples ([-1,1] NHWC float32) as NPZ")
    p.add_argument("--fast-gelu", action="store_true",
                   help="sigmoid-GELU approximation (DDM_TPU_FAST_GELU=1): "
                        "+17%% sampler throughput at a documented numerics "
                        "deviation from the checkpoint's training activation")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel sampling degree over the device mesh "
                        "(0 = all visible devices; 1 = single-device). "
                        "Samples are i.i.d. so batch inference scales with "
                        "zero collectives — the serving path for pods")
    p.add_argument("--ema", action="store_true",
                   help="sample from the checkpoint's EMA parameter average "
                        "(requires a run trained with --ema-decay; errors "
                        "loudly when the checkpoint carries none)")
    args = p.parse_args(argv)
    if args.fast_gelu:
        os.environ["DDM_TPU_FAST_GELU"] = "1"

    path = _resolve_ckpt(args.ckpt)
    params, config = ckpt_lib.load_params(path, ema=args.ema)
    if args.config:
        # Overlay semantics: a partial override file changes only the keys
        # it names; everything else keeps the checkpointed run's values
        # (a wholesale replace used to silently reset unspecified keys to
        # DiT-S defaults).
        with open(args.config, "r", encoding="utf-8") as f:
            config = {**config, **json.load(f)}
    cfg = {**SAMPLER_DEFAULTS, **{k: v for k, v in config.items()
                                  if v is not None}}

    model = build_model(cfg)  # missing model keys fall back in the factory
    steps = args.steps if args.steps is not None else int(cfg["sample_steps"])
    churn = (args.eps_churn if args.eps_churn is not None
             else float(cfg["eps_churn"]))
    size = int(cfg.get("image_size", MODEL_DEFAULTS["image_size"]))

    if args.n < 1:
        raise SystemExit("--n must be positive")
    dp = args.dp if args.dp > 0 else jax.local_device_count()
    if dp > 1:
        # Serving path: shard each chunk's i.i.d. draws over the data mesh
        # (zero collectives; params broadcast once). Chunks are padded up
        # to a multiple of dp and trimmed, mirroring sample_dddm_batched's
        # one-compile contract.
        from ddm_tpu.parallel import make_mesh
        from ddm_tpu.sampling import sample_dddm_sharded

        mesh = make_mesh(dp=dp, tp=1, devices=jax.local_devices()[:dp])
        chunk = min(args.batch, args.n)
        chunk = -(-chunk // dp) * dp
        key = jax.random.PRNGKey(args.seed)
        parts, produced = [], 0
        while produced < args.n:
            key, sub = jax.random.split(key)
            x = sample_dddm_sharded(
                model.apply, params, sub, chunk, mesh=mesh, steps=steps,
                eps_churn=churn, data_shape=(size, size, 3),
            )
            take = min(chunk, args.n - produced)
            parts.append(np.asarray(jax.device_get(x))[:take])
            produced += take
        samples = np.concatenate(parts, axis=0)
    else:
        samples = sample_dddm_batched(
            model.apply, params, jax.random.PRNGKey(args.seed), args.n,
            steps=steps, eps_churn=churn, data_shape=(size, size, 3),
            chunk_size=min(args.batch, args.n),
        )
    samples = np.clip(np.asarray(samples), -1.0, 1.0)

    if args.out:
        nrow = 1
        while nrow * nrow < args.n:
            nrow += 1
        save_image_grid((samples + 1.0) / 2.0, args.out, nrow=nrow)
        print(f"Saved {args.n} samples to {args.out} "
              f"({steps} steps, eps_churn={churn})")
    if args.npz:
        np.savez(args.npz, samples=samples.astype(np.float32))
        print(f"Saved raw samples to {args.npz}")


if __name__ == "__main__":
    main()
