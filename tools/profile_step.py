"""Profile the production CIFAR DiT train step and print per-kernel times.

Runs a few steady-state steps under ``jax.profiler.trace`` and aggregates
device-side op durations from the emitted Chrome-trace JSON, so kernel-level
claims in ROADMAP/PARITY are reproducible from one command.

Usage:
    python tools/profile_step.py [--embed-dim 384 --depth 8 --heads 6]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build_step(args):
    from ddm_tpu.data.augment import augment_cifar10
    from ddm_tpu.models.dit import DDDMDiT, patchify_images
    from ddm_tpu.parallel import (
        REPLICATED_RULES, make_mesh, make_sharded_train_step,
        place_train_state, shard_batch,
    )
    from ddm_tpu.training import TrainState

    mesh = make_mesh(tp=1)
    model = DDDMDiT(
        img_size=args.image_size, patch_size=args.patch_size, embed_dim=args.embed_dim,
        depth=args.depth, num_heads=args.heads, time_embed_dim=256,
        dtype=jnp.bfloat16, data_format="NHWC", attention_impl="auto",
        fused_mlp=True, remat=args.remat,
        moe_experts=args.moe_experts, moe_group_size=args.moe_group_size,
    )
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32)
    params = model.init(key, dummy, jnp.zeros((1,)), dummy)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(1e-4, weight_decay=0.01))
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    state, shardings = place_train_state(state, mesh, REPLICATED_RULES)
    from ddm_tpu.models.factory import make_tokens_apply

    step = make_sharded_train_step(
        make_tokens_apply(model),
        mesh, shardings, m=args.m, beta=0.1, lam=1.0, w_bias=0.0,
        preprocess=lambda k, b: augment_cifar10(k, b),
        target_transform=lambda x0: patchify_images(x0, args.patch_size),
    )
    I = args.image_size
    batch = shard_batch(
        np.random.default_rng(0).integers(
            0, 256, size=(args.batch, I, I, 3), dtype=np.uint8),
        mesh,
    )
    return step, state, batch, key


def aggregate_trace(logdir: str, steps: int):
    files = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not files:
        print("no trace files found under", logdir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-side complete events: pid whose name mentions TPU / device
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        agg[name][0] += dur
        agg[name][1] += 1
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"\ntrace: {path}\ndevice total {total:.2f} ms over {steps} steps "
          f"({total/steps:.2f} ms/step)\n")
    print(f"{'ms/step':>9}  {'calls':>6}  name")
    shown = 0
    for name, (dur, cnt) in rows:
        if name == "jit_step" or name.split("(")[0].isdigit():
            continue  # whole-program span / stream grouping rows
        print(f"{dur/steps:9.3f}  {cnt//steps:6d}  {name[:110]}")
        shown += 1
        if shown >= 60:
            break


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--embed-dim", type=int, default=384)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--patch-size", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=32)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--moe-experts", type=int, default=0)
    ap.add_argument("--moe-group-size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--logdir", type=str, default="/tmp/ddm_profile")
    args = ap.parse_args()

    step, state, batch, key = build_step(args)
    for i in range(3):
        state, metrics = step(state, jax.random.fold_in(key, i), batch)
    float(metrics["loss"])

    jax.profiler.start_trace(args.logdir)
    for i in range(args.steps):
        state, metrics = step(state, jax.random.fold_in(key, 100 + i), batch)
    float(metrics["loss"])
    jax.profiler.stop_trace()
    aggregate_trace(args.logdir, args.steps)


if __name__ == "__main__":
    main()
