"""Headline benchmark: CIFAR-10 DiT-S/4 DDDM training throughput.

Measures steady-state training images/sec/chip for the paper workload
(global batch 256, m = 8 denoiser queries, DiT-S/4, bf16 compute, on-device
augmentation, clipped AdamW) — the exact configuration of
``configs/cifar10_dit.yaml`` — on whatever devices are visible (the driver
runs this on one real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

``vs_baseline``: the reference publishes no numbers (BASELINE.md) and does
not even instrument throughput, so the baseline is an analytic estimate of
the reference stack (PyTorch eager, fp32/tf32, single A100) on the same
workload, documented here so it can be audited:

  * DiT-S/4 forward ~= 1.9 GFLOPs per 64-token image (qkv 56.6M + attn 6.3M
    + proj 18.9M + mlp 151M per block, x8 blocks, + embeddings).
  * train step ~= 3x forward (fwd + bwd) x m=8 queries ~= 45.6 GFLOPs per
    data image.
  * eager PyTorch on 64-token sequences reaches ~20% of A100's 312 TFLOPs
    bf16/tf32 peak at this size (generous for eager at seq len 64) ->
    ~62 TFLOPs -> ~1370 images/sec.

So vs_baseline = measured_imgs_per_sec_per_chip / 1370.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

BASELINE_IMGS_PER_SEC_A100_EAGER = 1370.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--m", type=int, default=8)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--attention", type=str, default="auto",
                   choices=["auto", "xla", "flash"])
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--steps-per-scan", type=int, default=1,
                   help="optimizer steps fused per compiled program "
                        "(async dispatch already pipelines at this step "
                        "size; >1 helps only for much smaller models)")
    # model scale (defaults = DiT-S/4 paper config; see configs/cifar10_dit_b.yaml
    # for the scaled-depth/width benchmark configuration)
    p.add_argument("--embed-dim", type=int, default=384)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--heads", type=int, default=6)
    p.add_argument("--patch-size", type=int, default=4)
    p.add_argument("--remat", action="store_true",
                   help="checkpoint each block (needed for DiT-B+ at batch 256)")
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "sample"],
                   help="train: images/sec/chip of the training step; "
                        "sample: samples/sec of the 20-step reverse sampler")
    args = p.parse_args()

    from ddm_tpu.data.augment import augment_cifar10
    from ddm_tpu.models.dit import DDDMDiT
    from ddm_tpu.parallel import (
        DIT_TP_RULES,
        REPLICATED_RULES,
        make_mesh,
        make_sharded_train_step,
        place_train_state,
        shard_batch,
    )
    from ddm_tpu.training import TrainState

    n_chips = jax.local_device_count()
    mesh = make_mesh(tp=args.tp)
    rules = DIT_TP_RULES if args.tp > 1 else REPLICATED_RULES

    model = DDDMDiT(
        img_size=32, patch_size=args.patch_size, embed_dim=args.embed_dim,
        depth=args.depth, num_heads=args.heads, time_embed_dim=256,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        data_format="NHWC", attention_impl=args.attention,
        fused_mlp=args.tp == 1, remat=args.remat,
    )
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(key, dummy, jnp.zeros((1,)), dummy)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(1e-4, weight_decay=0.01))
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    state, shardings = place_train_state(state, mesh, rules)

    if args.mode == "sample":
        from ddm_tpu.sampling import sample_dddm

        skey = jax.random.PRNGKey(1)
        B = args.batch
        def draw(k):
            return sample_dddm(model.apply, state.params, k, n_samples=B,
                               steps=20, eps_churn=0.0,
                               data_shape=(32, 32, 3))
        x = draw(skey)
        float(x.ravel()[0])  # hard sync past compile
        t0 = time.perf_counter()
        n = max(args.steps // 3, 3)
        for i in range(n):
            x = draw(jax.random.fold_in(skey, i))
        float(x.ravel()[0])
        dt = time.perf_counter() - t0
        sps = n * B / dt
        # analytic baseline analogous to the training one: 20 denoiser
        # forwards/sample ~= 38 GFLOPs; eager A100 @ ~20% peak -> ~1630/s
        print(json.dumps({
            "metric": "cifar10_dit_sample_samples_per_sec_per_chip",
            "value": round(sps / n_chips, 2),
            "unit": "samples/sec/chip",
            "vs_baseline": round(sps / n_chips / 1630.0, 3),
            "chips": n_chips, "batch": B, "sampler_steps": 20,
            "model": f"dim{args.embed_dim}-d{args.depth}-h{args.heads}-p{args.patch_size}",
        }))
        return

    K = max(args.steps_per_scan, 1)
    step = make_sharded_train_step(
        model.apply, mesh, shardings, m=args.m, beta=0.1, lam=1.0, w_bias=0.0,
        preprocess=lambda k, b: augment_cifar10(k, b),
        steps_per_scan=K,
    )

    shape = (args.batch, 32, 32, 3) if K == 1 else (K, args.batch, 32, 32, 3)
    batch = shard_batch(
        np.random.default_rng(0).integers(0, 256, size=shape, dtype=np.uint8),
        mesh,
    )

    def last_loss(metrics):
        v = metrics["loss"]
        return float(v if K == 1 else v[-1])

    for i in range(max(args.warmup // K, 1)):
        state, metrics = step(state, jax.random.fold_in(key, i), batch)
    # sync via a value fetch: through remote-TPU relays (axon),
    # block_until_ready can return before execution completes, but a
    # device->host scalar transfer cannot
    last_loss(metrics)

    n_calls = max(args.steps // K, 1)
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, metrics = step(state, jax.random.fold_in(key, 1000 + i), batch)
    final_loss = last_loss(metrics)
    dt = time.perf_counter() - t0

    total_steps = n_calls * K
    imgs_per_sec = total_steps * args.batch / dt
    per_chip = imgs_per_sec / n_chips
    print(json.dumps({
        "metric": "cifar10_dit_train_images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_IMGS_PER_SEC_A100_EAGER, 3),
        "total_images_per_sec": round(imgs_per_sec, 2),
        "chips": n_chips,
        "batch": args.batch,
        "m": args.m,
        "dtype": args.dtype,
        "step_ms": round(1000 * dt / total_steps, 2),
        "steps_per_scan": K,
        "model": f"dim{args.embed_dim}-d{args.depth}-h{args.heads}-p{args.patch_size}",
        "loss": final_loss,
    }))


if __name__ == "__main__":
    main()
