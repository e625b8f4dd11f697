"""Train a DiT-backed Distributional Diffusion Model on CIFAR-10 (TPU-native).

Re-implementation of ``/root/reference/train_cifar10_dit.py`` with the same
CLI surface (flags, YAML fill-only-defaults merge, validation), training
semantics (AdamW + global-norm grad clipping, the shared
``distributional_training_step``, per-step/per-epoch/eval histories), and
artifacts (epoch checkpoints + ``model_final``, ``config.json``,
``samples.png`` grid, three JSON+PNG dynamics pairs, W&B namespaces
``train/ epoch/ eval/ plots/``).

TPU-first architecture (differences are performance-bearing, not
behavioural):
  * ONE compiled XLA program per step: uint8 batch -> on-device reflect-pad
    crop/flip augmentation -> [-1,1] normalize -> m-expanded DiT
    forward/backward -> clipped AdamW update, with the TrainState donated.
  * bfloat16 compute (fp32 params/reductions) by default: ``--dtype``.
  * data parallelism over all local devices via a ``jax.sharding.Mesh``;
    optional tensor parallelism with ``--tp N`` (Megatron-style shardings,
    XLA inserts the collectives). The reference is single-device only.
  * metrics stay on device during the epoch and flush once per epoch
    (the reference's per-step ``float()`` pulls sync the accelerator every
    step — SURVEY flags this as a throughput killer).
  * ``--resume`` restores the full TrainState (params + opt state + step),
    an addition the reference lacks (it never loads its own checkpoints).

Evaluation reproduces the reference protocol: FID from Inception-v3 pool3
statistics (real stats from the *test* loader, computed once and cached),
pixel-space MMD on flattened pixels, both on samples from the 20-step
``lax.scan`` sampler.
"""

from collections import defaultdict
import argparse
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ddm_tpu.data.augment import augment_cifar10, normalize_images
from ddm_tpu.data.cifar10 import CIFAR10DataConfig, build_cifar10_dataloaders
from ddm_tpu.metrics import (
    compute_activation_statistics,
    compute_image_mmd,
    frechet_distance,
)
from ddm_tpu.models.dit import DDDMDiT
from ddm_tpu.models.factory import MODEL_DEFAULTS, SAMPLER_DEFAULTS, build_model
from ddm_tpu.parallel import (
    DIT_TP_RULES,
    REPLICATED_RULES,
    make_mesh,
    make_sharded_train_step,
    place_train_state,
    shard_batch,
)
from ddm_tpu.sampling import sample_dddm_batched
from ddm_tpu.training import TrainState
from ddm_tpu.utils import checkpoint as ckpt_lib
from ddm_tpu.utils.config import apply_config
from ddm_tpu.utils.plotting import plot_training_curves, save_image_grid
from ddm_tpu.utils.profiling import trace


def _serialize_history(history: Dict[str, list]) -> dict:
    result: dict = {}
    for key, values in history.items():
        if key in {"step", "epoch"}:
            result[key] = [int(v) for v in values]
        else:
            result[key] = [float(v) for v in values]
    return result


def maybe_init_wandb(args: argparse.Namespace):
    # Only process 0 owns the W&B run: per-host duplicates would log the
    # same (replicated) metrics N times and collide on the run name.
    if not getattr(args, "wandb", False) or jax.process_index() != 0:
        return None, None
    try:
        import wandb  # pragma: no cover - optional dependency
    except ImportError as exc:  # pragma: no cover - defensive import guard
        raise RuntimeError(
            "Weights & Biases is not installed but `--wandb` was provided."
        ) from exc
    run = wandb.init(project=args.wandb_project, name=args.wandb_name,
                     config=vars(args))
    return run, wandb


# build_model lives in ddm_tpu.models.factory (one source of truth shared
# with generate.py and library users); imported above.


def train(args: argparse.Namespace) -> None:
    # All host-side artifacts (checkpoints, JSON/PNG, W&B) are written by
    # process 0 only: on a pod with a shared output directory, concurrent
    # writers would race on the same .tmp files and duplicate W&B runs.
    # Compute (training, sampling, eval) still runs on every process —
    # multi-process JAX requires all processes to execute the same program
    # on globally-sharded arrays.
    is_main = jax.process_index() == 0
    if is_main:
        os.makedirs(args.out, exist_ok=True)
    root_key = jax.random.PRNGKey(args.seed)

    data_config = CIFAR10DataConfig(
        data_dir=args.data_dir,
        batch_size=args.batch,
        num_workers=args.workers,
        image_size=args.image_size,
        augment=not args.no_augment,
        download=True,
        synthetic=args.synthetic,
        seed=args.seed,
    )
    train_loader, eval_loader = build_cifar10_dataloaders(data_config)
    channels, image_size = 3, args.image_size

    model = build_model(args)
    init_key, root_key = jax.random.split(root_key)
    dummy = jnp.zeros((1, image_size, image_size, channels), jnp.float32)
    params = model.init(init_key, dummy, jnp.zeros((1,)), dummy)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"DDDMDiT: {n_params / 1e6:.2f}M params, "
          f"{jax.local_device_count()} device(s)", flush=True)

    if args.pp > 1:
        from ddm_tpu.parallel import make_pipe_mesh, to_pipeline_params

        mesh = make_pipe_mesh(pp=args.pp, tp=args.tp)
        state_params = to_pipeline_params(params, args.pp)
    else:
        mesh = make_mesh(tp=args.tp)
        state_params = params

    tx_parts = []
    if args.grad_clip is not None and args.grad_clip > 0:
        # Inside the shard_map step, sharded param layouts see only LOCAL
        # gradient slices; a plain optax global-norm clip would compute a
        # different (wrong) norm on every shard and scale updates
        # inconsistently. Each layout gets the axis-aware clipper.
        if args.fsdp:
            from ddm_tpu.parallel import (clip_by_global_norm_fsdp,
                                          fsdp_tree_shardings)
            tx_parts.append(clip_by_global_norm_fsdp(
                args.grad_clip, fsdp_tree_shardings(params, mesh)))
        elif args.pp > 1:
            from ddm_tpu.parallel import (MODEL_AXIS, PIPE_AXIS,
                                          pipeline_tree_shardings)
            from ddm_tpu.parallel.fsdp import clip_by_global_norm_sharded
            axes = (PIPE_AXIS, MODEL_AXIS) if args.tp > 1 else PIPE_AXIS
            tx_parts.append(clip_by_global_norm_sharded(
                args.grad_clip, pipeline_tree_shardings(state_params, mesh),
                axes))
        elif args.tp > 1:
            from ddm_tpu.parallel import MODEL_AXIS, tree_shardings
            from ddm_tpu.parallel.fsdp import clip_by_global_norm_sharded
            tx_parts.append(clip_by_global_norm_sharded(
                args.grad_clip, tree_shardings(params, mesh, DIT_TP_RULES),
                MODEL_AXIS))
        else:
            tx_parts.append(optax.clip_by_global_norm(args.grad_clip))
    # Learning-rate schedule (capability addition: the reference trains at
    # a constant lr, /root/reference/train_cifar10_dit.py:128-130 — the
    # default here stays faithful to that). The schedule is a pure
    # function of the optimizer step, so it lives inside the compiled
    # step and survives --resume (state.step is checkpointed).
    # Flag units are BATCHES (micro-steps). Under --grad-accum N the optax
    # MultiSteps wrapper advances the inner schedule count only on every
    # N-th micro-step (one count per OPTIMIZER update), so the batch-unit
    # flags convert to inner units here — without the division a cosine
    # run would end at ~cos(pi/(2N)) of its decay instead of --lr-min.
    accum = max(args.grad_accum, 1)
    steps_per_epoch_sched = len(train_loader)
    lr: Any = args.lr
    total_steps = args.epochs * steps_per_epoch_sched // accum
    warmup = args.warmup_steps // accum
    if args.lr_schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=args.lr,
            warmup_steps=warmup,
            decay_steps=max(total_steps, warmup + 1),
            end_value=args.lr_min,
        )
    elif args.lr_schedule == "linear":
        lr = optax.join_schedules(
            [optax.linear_schedule(0.0, args.lr, warmup),
             optax.linear_schedule(
                 args.lr, args.lr_min,
                 max(total_steps - warmup, 1))],
            [warmup],
        )
    elif warmup > 0:
        lr = optax.join_schedules(
            [optax.linear_schedule(0.0, args.lr, warmup),
             optax.constant_schedule(args.lr)],
            [warmup],
        )
    lr_at = ((lambda step: lr(step // accum)) if callable(lr)
             else (lambda step: args.lr))
    tx_parts.append(optax.adamw(lr, weight_decay=args.weight_decay))
    tx = optax.chain(*tx_parts)
    if args.grad_accum > 1:
        # accumulate raw gradients for N micro-steps on-device and apply
        # the full chain (clip + AdamW) to their mean every N-th call:
        # effective batch = --batch * N without the activation memory.
        # state.step counts micro-steps (the lr schedule sees them too).
        tx = optax.MultiSteps(tx, every_k_schedule=args.grad_accum)
    state = TrainState.create(
        apply_fn=model.apply, params=state_params, tx=tx,
        # EMA rides in the TrainState so it shards, checkpoints, and
        # resumes with everything else; fp32 copy of the initial params
        ema_params=(jax.tree.map(jnp.copy, state_params)
                    if args.ema_decay > 0 else None),
    )

    start_epoch = 1
    if args.resume:
        latest = ckpt_lib.latest_checkpoint(args.out)
        if latest is not None:
            state, saved_cfg = ckpt_lib.restore_train_state(latest, state)
            start_epoch = int(saved_cfg.get("epoch", 0)) + 1
            print(f"Resumed from {latest} at epoch {start_epoch}", flush=True)

    if args.fsdp:
        from ddm_tpu.parallel import fsdp_tree_shardings

        state, state_shardings = place_train_state(
            state, mesh, shardings=fsdp_tree_shardings(state, mesh))
    elif args.pp > 1:
        from ddm_tpu.parallel import pipeline_tree_shardings

        state, state_shardings = place_train_state(
            state, mesh, shardings=pipeline_tree_shardings(state, mesh))
    else:
        rules = DIT_TP_RULES if args.tp > 1 else REPLICATED_RULES
        state, state_shardings = place_train_state(state, mesh, rules)

    def canonical_state(s: TrainState) -> TrainState:
        """State with params in the canonical DiT tree for sampling/eval.

        Pipeline layout stores params as {'embed', 'stages'} with the
        stage stack sharded over ``pipe``; sampling and eval run the plain
        full model, so gather the stages and re-pack to ``block_i``
        subtrees (the EMA tree rides along identically). No-op for every
        other layout. When EMA is on, sampling/eval consume the EMA
        average (standard diffusion practice) — ``params`` is swapped for
        ``ema_params`` here, which only eval-side consumers see.
        """
        if args.pp > 1:
            from ddm_tpu.parallel import from_pipeline_params, replicate_tree

            def repack(tree):
                gathered = replicate_tree(tree)
                if jax.process_count() > 1:
                    gathered = jax.tree.map(
                        lambda a: jnp.asarray(a.addressable_data(0))
                        if isinstance(a, jax.Array) and not a.is_fully_addressable
                        else a,
                        gathered,
                    )
                return from_pipeline_params(gathered)

            s = s.replace(
                params=repack(s.params),
                ema_params=None if s.ema_params is None
                else repack(s.ema_params),
            )
        if s.ema_params is not None:
            s = s.replace(params=s.ema_params)
        return s

    if args.dry_eval:
        # Rehearse the FULL evaluation protocol end-to-end with zero
        # training (VERDICT r1 item 8): real Inception statistics from the
        # test loader, eval_samples drawn from the (untrained) model,
        # FID + pixel MMD — so the first networked run with real data and
        # weights is a config change, not a debugging session.
        from ddm_tpu.models.inception import InceptionEmbedding

        fid_embedder = InceptionEmbedding(
            dtype=jnp.bfloat16 if args.fid_bf16 else jnp.float32)
        print(f"[dry-eval] inception pretrained={fid_embedder.pretrained} "
              f"fid_samples={args.fid_samples} eval_samples={args.eval_samples}",
              flush=True)
        fid_stats = compute_activation_statistics(
            eval_loader, fid_embedder, max_items=args.fid_samples,
            batch_size=args.eval_batch, multihost=jax.process_count() > 1,
        )
        root_key, eval_key = jax.random.split(root_key)
        metrics = evaluate(model, canonical_state(state), args, eval_loader,
                           fid_embedder, fid_stats, eval_key)
        summary = " ".join(f"{k}={v:.6f}" for k, v in sorted(metrics.items()))
        print(f"[dry-eval] {summary}", flush=True)
        if is_main:
            with open(os.path.join(args.out, "eval_metrics.json"), "w",
                      encoding="utf-8") as f:
                json.dump({"epoch": [0],
                           **{k: [float(v)] for k, v in metrics.items()}},
                          f, indent=2)
        return

    augment = not args.no_augment

    def preprocess(key: jax.Array, batch: jnp.ndarray) -> jnp.ndarray:
        if augment:
            return augment_cifar10(key, batch)
        return normalize_images(batch)

    # tp > 1: the step body runs the LOCAL-shard model instance under
    # shard_map (Pallas kernels on per-shard heads/hidden); sampling and
    # eval below keep using the full instance. The training loss runs in
    # token space (DDDMDiT.tokens + patchified targets — permutation-
    # invariant energy score, skips unpatchify in fwd+bwd).
    from ddm_tpu.models.dit import patchify_images

    if args.pp > 1:
        from ddm_tpu.parallel import make_pipelined_apply

        # GPipe-staged block stack (ddm_tpu.parallel.pipeline): emits
        # tokens like the tp/plain paths, so the same target_transform
        # applies. With --tp the stage blocks run the Megatron layout on
        # local weight shards (collectives over 'model', orthogonal to the
        # 'pipe' rotation); with --sp their residual stream stays
        # token-sharded between stages.
        pp_model = build_model(args, tp_axis="model") if args.tp > 1 else model
        step_apply = make_pipelined_apply(
            pp_model, n_stages=args.pp, n_microbatches=args.pp_microbatches,
            moe_aux_weight=args.moe_aux_weight)
    else:
        from ddm_tpu.models.factory import make_tokens_apply

        step_model = build_model(args, tp_axis="model") if args.tp > 1 else model
        step_apply = make_tokens_apply(step_model, args.moe_aux_weight)

    step_fn = make_sharded_train_step(
        step_apply, mesh, state_shardings,
        m=args.m, beta=args.beta, lam=args.lam, w_bias=args.w_bias,
        preprocess=preprocess,
        dp_shard_map=True if (args.tp > 1 or args.fsdp or args.pp > 1) else None,
        target_transform=lambda x0: patchify_images(x0, args.patch_size),
        fsdp=args.fsdp,
        ema_decay=args.ema_decay,
        ema_every=max(args.grad_accum, 1),
    )

    global_step = int(state.step)
    fid_embedder = None
    fid_stats = None
    fid_failed = False

    wandb_run, wandb_module = maybe_init_wandb(args)

    train_history: Dict[str, list] = {"step": []}
    epoch_history: Dict[str, list] = {"epoch": []}
    eval_history: Dict[str, list] = {"epoch": []}
    steps_per_epoch = len(train_loader)

    from tqdm.auto import tqdm

    with trace(args.profile_dir):
        for epoch in range(start_epoch, args.epochs + 1):
            epoch_t0 = time.perf_counter()
            pending = []  # on-device per-step metrics for the current window
            epoch_sums: Dict[str, float] = defaultdict(float)
            num_batches = 0

            def flush_pending(progress=None):
                # One bounded device sync per log window: history and W&B
                # stay live at --log-every cadence (the reference logs
                # train/* every step; per-step float() pulls would sync the
                # accelerator every step — SURVEY flags this).
                nonlocal pending, num_batches
                if not pending:
                    return
                flushed = jax.device_get(pending)
                base = global_step - len(flushed)
                for i, mstep in enumerate(flushed):
                    train_history["step"].append(base + i + 1)
                    for k, v in mstep.items():
                        train_history.setdefault(k, []).append(float(v))
                        epoch_sums[k] += float(v)
                    if wandb_run is not None:
                        wandb_run.log(
                            {"train/epoch": epoch,
                             # optax evaluates the schedule at the PRE-update
                             # count (completed steps) for this step's update,
                             # so log lr_at(base + i), not the post-update
                             # step the metrics are keyed by.
                             "train/lr": float(lr_at(base + i)),
                             **{f"train/{k}": float(v) for k, v in mstep.items()}},
                            step=base + i + 1,
                        )
                num_batches += len(flushed)
                pending = []
                if progress is not None:
                    last = flushed[-1]
                    progress.set_postfix(
                        {
                            "loss": f"{float(last['loss']):.4f}",
                            "conf": f"{float(last['confidence']):.4f}",
                            "inter": f"{float(last['interaction']):.4f}",
                            "w~": f"{float(last['weight']):.3f}",
                        },
                        refresh=False,
                    )

            if hasattr(train_loader, "set_epoch"):
                # stateless (seed, epoch) shuffle: --resume reproduces the
                # data order of an uninterrupted run
                train_loader.set_epoch(epoch)
            progress = tqdm(
                train_loader,
                desc=f"Epoch {epoch}/{args.epochs}",
                unit="batch",
                dynamic_ncols=True,
                total=steps_per_epoch,
            )
            for batch_idx, (images, _) in enumerate(progress):
                root_key, step_key = jax.random.split(root_key)
                state, metrics = step_fn(state, step_key, shard_batch(images, mesh))
                global_step += 1
                pending.append(metrics)
                if (batch_idx + 1) % max(args.log_every, 1) == 0:
                    flush_pending(progress)
            flush_pending()

            num_batches = max(num_batches, 1)
            epoch_avg = {k: epoch_sums[k] / num_batches for k in epoch_sums}
            img_per_sec = num_batches * args.batch / (time.perf_counter() - epoch_t0)
            n_chips = max(jax.local_device_count(), 1)
            if is_main:
                summary = " ".join(f"{k}={epoch_avg[k]:.4f}" for k in sorted(epoch_avg))
                print(
                    f"[epoch {epoch:03d}] {summary} "
                    f"({img_per_sec:.0f} img/s, {img_per_sec / n_chips:.0f} img/s/chip)",
                    flush=True,
                )

            epoch_history["epoch"].append(epoch)
            for key, value in epoch_avg.items():
                epoch_history.setdefault(key, []).append(value)
            epoch_history.setdefault("images_per_sec", []).append(img_per_sec)

            if wandb_run is not None:
                wandb_run.log(
                    {f"epoch/{k}": v for k, v in epoch_avg.items()}
                    | {"epoch/images_per_sec": img_per_sec},
                    step=epoch,
                )

            if is_main and (epoch % args.ckpt_every == 0 or epoch == args.epochs):
                ckpt_lib.save_train_state(
                    os.path.join(args.out, f"model_epoch{epoch:03d}.ckpt"),
                    state, config=vars(args) | {"epoch": epoch},
                )

            if args.eval_every > 0 and epoch % args.eval_every == 0:
                if fid_embedder is None and not fid_failed:
                    try:
                        from ddm_tpu.models.inception import InceptionEmbedding

                        fid_embedder = InceptionEmbedding(
                            dtype=jnp.bfloat16 if args.fid_bf16
                            else jnp.float32)
                    except Exception as exc:  # noqa: BLE001
                        fid_failed = True
                        print(f"[eval] FID disabled: {exc}", flush=True)
                if fid_embedder is not None and fid_stats is None:
                    fid_stats = compute_activation_statistics(
                        eval_loader, fid_embedder, max_items=args.fid_samples,
                        batch_size=args.eval_batch,
                        multihost=jax.process_count() > 1,
                    )
                # split first so the eval sampler's internal key chain can
                # never collide with subsequent training-step keys
                root_key, eval_key = jax.random.split(root_key)
                metrics = evaluate(model, canonical_state(state), args,
                                   eval_loader, fid_embedder, fid_stats,
                                   eval_key)
                if is_main:
                    fid_str = (f"FID={metrics['fid']:.3f} " if "fid" in metrics else "")
                    print(f"[epoch {epoch:03d}] {fid_str}MMD={metrics['mmd']:.6f}",
                          flush=True)
                eval_history["epoch"].append(epoch)
                for key, value in metrics.items():
                    eval_history.setdefault(key, []).append(float(value))
                if wandb_run is not None:
                    wandb_run.log({f"eval/{k}": v for k, v in metrics.items()},
                                  step=epoch)

    if is_main:
        ckpt_lib.save_train_state(
            os.path.join(args.out, "model_final.ckpt"),
            state, config=vars(args) | {"epoch": args.epochs},
        )
        with open(os.path.join(args.out, "config.json"), "w") as f:
            json.dump(vars(args), f, indent=2)

    if args.sample_batch > 0:
        sample_key = jax.random.fold_in(root_key, 999)
        sample_params = canonical_state(state).params
        if args.fsdp:
            from ddm_tpu.parallel import replicate_tree

            sample_params = replicate_tree(sample_params)
        samples = sample_dddm_batched(
            model.apply, sample_params, sample_key, args.sample_batch,
            steps=args.sample_steps, eps_churn=args.eps_churn,
            data_shape=(image_size, image_size, channels),
        )
        samples = np.clip(np.asarray(samples), -1.0, 1.0)
        if is_main:
            grid_rows = int(args.sample_batch**0.5)
            if grid_rows * grid_rows < args.sample_batch:
                grid_rows += 1
            save_image_grid((samples + 1.0) / 2.0,
                            os.path.join(args.out, "samples.png"), nrow=grid_rows)
            print(f"Saved samples and checkpoints to {args.out}", flush=True)

    # Persist and plot training dynamics (three JSON+PNG pairs, as reference).
    artifact_specs = (
        ("train", train_history, "step", "CIFAR-10 training dynamics", "Step"),
        ("epoch", epoch_history, "epoch", "CIFAR-10 epoch averages", "Epoch"),
        ("eval", eval_history, "epoch", "CIFAR-10 evaluation metrics", "Epoch"),
    ) if is_main else ()
    for name, hist, xkey, title, xlabel in artifact_specs:
        if name == "eval" and len(eval_history["epoch"]) == 0:
            continue
        with open(os.path.join(args.out, f"{name}_metrics.json"), "w",
                  encoding="utf-8") as f:
            json.dump(_serialize_history(hist), f, indent=2)
        try:
            plot_path = plot_training_curves(
                hist, os.path.join(args.out, f"{name}_dynamics.png"),
                title=title, xlabel=xlabel, x_key=xkey,
            )
        except ValueError:
            plot_path = None
        else:
            if wandb_run is not None and wandb_module is not None:
                wandb_run.log(
                    {f"plots/{name}_dynamics": wandb_module.Image(plot_path)},
                    step=global_step,
                )

    if wandb_run is not None:
        wandb_run.finish()


def evaluate(
    model: DDDMDiT,
    state: TrainState,
    args: argparse.Namespace,
    eval_loader,
    embedder,
    real_stats,
    key: jax.Array,
) -> Dict[str, float]:
    """Sample -> clamp -> FID (vs cached real stats) + pixel MMD.

    Reference parity: ``train_cifar10_dit.py:318-358``.

    Multi-host: each process samples ``eval_samples / process_count``
    images with a process-decorrelated key and embeds its own share; the
    FID statistics and MMD kernel run on ``process_allgather``-ed global
    feature/pixel sets, so every process reports identical metrics.
    TP-sharded params are first all-gathered to fully-replicated arrays
    (``ddm_tpu.parallel.replicate_tree`` — one ICI all-gather per sharded
    leaf, every process participates) so local sampling sees full weights.
    """
    pc = jax.process_count()
    multihost = pc > 1
    n_local = max(args.eval_samples // pc, 1)
    if multihost:
        key = jax.random.fold_in(key, jax.process_index())

    def local_replicated(tree):
        # per-process view of global params so local jit sampling never
        # touches non-addressable shards: all-gather TP/FSDP-sharded leaves
        # to replicated (collective; no-op for already-replicated DP
        # params), then take each leaf's local copy
        from ddm_tpu.parallel import replicate_tree

        tree = replicate_tree(tree)
        if not multihost:
            return tree
        return jax.tree.map(
            lambda a: jnp.asarray(a.addressable_data(0))
            if isinstance(a, jax.Array) and not a.is_fully_addressable else a,
            tree,
        )

    samples = sample_dddm_batched(
        model.apply, local_replicated(state.params), key, n_local,
        steps=args.sample_steps, eps_churn=args.eps_churn,
        data_shape=(args.image_size, args.image_size, 3),
        chunk_size=min(args.eval_batch * 8, n_local),
    )
    samples = np.clip(np.asarray(samples), -1.0, 1.0)
    fake_batches = [samples[i:i + args.eval_batch]
                    for i in range(0, samples.shape[0], args.eval_batch)]

    out: Dict[str, float] = {}
    if embedder is not None and real_stats is not None:
        mu_r, sigma_r = real_stats
        mu_f, sigma_f = compute_activation_statistics(
            fake_batches, embedder, max_items=args.fid_samples,
            batch_size=args.eval_batch, multihost=multihost,
        )
        out["fid"] = float(frechet_distance(mu_r, sigma_r, mu_f, sigma_f))
    out["mmd"] = float(compute_image_mmd(
        fake_batches, eval_loader, sigma=args.mmd_sigma,
        max_items=args.mmd_samples, multihost=multihost,
    ))
    return out


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, default=None, help="Optional YAML config")
    parser.add_argument("--data-dir", type=str, default="./data")
    parser.add_argument("--out", type=str, default="./cifar10_dit_out")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--lr-schedule", type=str, dest="lr_schedule",
                        default="constant",
                        choices=["constant", "cosine", "linear"],
                        help="learning-rate schedule over the full run "
                             "(constant = reference behaviour); cosine/"
                             "linear decay from --lr to --lr-min after "
                             "--warmup-steps of linear warmup")
    parser.add_argument("--warmup-steps", type=int, dest="warmup_steps",
                        default=0,
                        help="linear lr warmup steps from 0 to --lr "
                             "(composes with every --lr-schedule)")
    parser.add_argument("--lr-min", type=float, dest="lr_min", default=0.0,
                        help="final lr for the cosine/linear schedules")
    parser.add_argument("--grad-accum", type=int, dest="grad_accum",
                        default=1,
                        help="accumulate gradients over N micro-steps and "
                             "apply the optimizer to their mean every N-th "
                             "(effective batch = batch * N); 1 = off")
    parser.add_argument("--ema-decay", type=float, dest="ema_decay",
                        default=0.0,
                        help="exponential moving average of the parameters "
                             "at this decay (e.g. 0.9999); sampling and "
                             "eval then use the EMA weights, checkpoints "
                             "carry both (generate.py --ema selects them); "
                             "0 = off (reference behaviour)")
    parser.add_argument("--weight-decay", type=float, default=0.01)
    parser.add_argument("--beta", type=float, default=0.1)
    parser.add_argument("--lam", type=float, default=1.0)
    parser.add_argument("--m", type=int, default=8)
    parser.add_argument("--w-bias", type=float, default=0.0, dest="w_bias")
    parser.add_argument("--grad-clip", type=float, default=1.0)
    parser.add_argument("--ckpt-every", type=int, default=1)
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument("--seed", type=int, default=0)
    # Model-construction flags: defaults come from the factory's
    # MODEL_DEFAULTS so the CLI and ddm_tpu.build_model cannot drift
    # (pinned by tests/test_cli.py::test_cli_model_defaults_match_factory).
    parser.add_argument("--image-size", type=int,
                        default=MODEL_DEFAULTS["image_size"])
    parser.add_argument("--patch-size", type=int,
                        default=MODEL_DEFAULTS["patch_size"])
    parser.add_argument("--embed-dim", type=int,
                        default=MODEL_DEFAULTS["embed_dim"])
    parser.add_argument("--depth", type=int, default=MODEL_DEFAULTS["depth"])
    parser.add_argument("--heads", type=int, default=MODEL_DEFAULTS["heads"])
    parser.add_argument("--time-embed", type=int,
                        default=MODEL_DEFAULTS["time_embed"])
    parser.add_argument("--mlp-ratio", type=float,
                        default=MODEL_DEFAULTS["mlp_ratio"])
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--sample-batch", type=int, default=64)
    parser.add_argument("--sample-steps", type=int,
                        default=SAMPLER_DEFAULTS["sample_steps"])
    parser.add_argument("--eps-churn", type=float,
                        default=SAMPLER_DEFAULTS["eps_churn"])
    parser.add_argument("--no-augment", action="store_true", help="Disable data augmentation")
    parser.add_argument("--eval-every", type=int, default=0, help="Evaluate every N epochs (0 disables)")
    parser.add_argument("--eval-batch", type=int, default=256, help="Batch size for evaluation loaders")
    parser.add_argument("--eval-samples", type=int, default=1024, help="Number of samples to draw for evaluation")
    parser.add_argument("--fid-samples", type=int, default=10000, help="Number of real/fake images for FID")
    parser.add_argument("--mmd-samples", type=int, default=2048, help="Number of images used for MMD")
    parser.add_argument("--mmd-sigma", type=float, default=1.0, help="RBF kernel bandwidth for MMD")
    parser.add_argument("--wandb", action="store_true", help="Log training to Weights & Biases")
    parser.add_argument("--wandb-project", type=str, default="dddm")
    parser.add_argument("--wandb-name", type=str, default=None)
    # ddm_tpu additions:
    parser.add_argument("--dtype", type=str, default=MODEL_DEFAULTS["dtype"],
                        choices=["float32", "bfloat16"], help="compute dtype")
    parser.add_argument("--tp", type=int, default=MODEL_DEFAULTS["tp"],
                        help="tensor-parallel degree over the 'model' mesh axis")
    parser.add_argument("--sp", action="store_true",
                        help="Megatron sequence parallelism on top of --tp: "
                             "the residual stream between DiT blocks is "
                             "token-sharded over the model axis (LN on local "
                             "tokens, all-gather before the column-parallel "
                             "matmuls, token reduce-scatter after the "
                             "row-parallel ones). Same comm volume as plain "
                             "TP; block activations and LN compute scale "
                             "1/tp. Requires --tp > 1 and token count "
                             "divisible by tp")
    parser.add_argument("--attention", type=str,
                        default=MODEL_DEFAULTS["attention"],
                        choices=["auto", "xla", "flash"], help="attention impl")
    parser.add_argument("--synthetic", action="store_true",
                        help="use synthetic CIFAR-shaped data (air-gapped smoke runs)")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint in --out")
    parser.add_argument("--dry-eval", action="store_true", dest="dry_eval",
                        help="run the full FID/MMD evaluation protocol once "
                             "with no training (rehearses the 50k-FID path; "
                             "combine with --synthetic when air-gapped)")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="write a jax.profiler trace here")
    parser.add_argument("--log-every", type=int, default=50,
                        help="progress-bar metric refresh cadence in batches "
                             "(each refresh costs one device sync)")
    parser.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans (numerics debugging; slow)")
    parser.add_argument("--remat", action="store_true",
                        help="checkpoint each DiT block: trades ~30% extra "
                             "FLOPs for activation memory (not needed for "
                             "DiT-B at batch 256; use for larger widths/"
                             "batches — measured 394 vs 352 img/s/chip "
                             "no-remat vs remat at DiT-B/4)")
    parser.add_argument("--moe-experts", type=int, dest="moe_experts",
                        default=MODEL_DEFAULTS["moe_experts"],
                        help="Mixture-of-Experts width scaling: > 1 replaces "
                             "every block's dense MLP with this many "
                             "top-1-routed expert FFNs (Switch-style, "
                             "capacity-bounded static dispatch). With --tp "
                             "the experts shard over the model axis (expert "
                             "parallelism: E/tp experts' weights + Adam "
                             "moments per shard, one psum per block). Must "
                             "be divisible by --tp; excludes --sp and "
                             "--mlp-persist")
    parser.add_argument("--moe-capacity", type=float, dest="moe_capacity",
                        default=MODEL_DEFAULTS["moe_capacity"],
                        help="per-expert token capacity factor: capacity = "
                             "ceil(group/experts * factor); over-capacity "
                             "tokens pass through the residual untouched")
    parser.add_argument("--moe-group-size", type=int, dest="moe_group_size",
                        default=MODEL_DEFAULTS["moe_group_size"],
                        help="MoE routing group size (GShard-style): the "
                             "dispatch einsums cost O(rows * group) FLOPs, "
                             "so 0 (one group, exact) is QUADRATIC in rows "
                             "- only for tiny debugging shapes; capacity "
                             "applies per group (256 measured fastest of "
                             "{256,512,1024}); ragged row counts pad to "
                             "the group boundary")
    parser.add_argument("--fid-bf16", action="store_true", dest="fid_bf16",
                        help="run the Inception FID tower in bfloat16 "
                             "(~3x embedder throughput; measured max pool3 "
                             "feature delta ~5e-5 vs the fp32 reference "
                             "numerics on the bench weights - see "
                             "PARITY.md eval-path section). Default fp32 "
                             "= reference numerics")
    parser.add_argument("--moe-topk", type=int, dest="moe_topk",
                        default=MODEL_DEFAULTS["moe_topk"],
                        help="routed experts per token: 1 = Switch top-1, "
                             "2 = GShard top-2 (renormalised gates, "
                             "second choices queue after first choices; "
                             "expert FFN FLOPs scale with topk)")
    parser.add_argument("--moe-aux-weight", type=float,
                        dest="moe_aux_weight", default=0.01,
                        help="weight of the Switch load-balance auxiliary "
                             "loss (mean over MoE blocks, added to the "
                             "energy loss and logged as moe_aux); 0 "
                             "disables it - the router then trains only "
                             "through gate scaling and routing can "
                             "collapse onto few experts")
    parser.add_argument("--mlp-persist", type=int,
                        default=MODEL_DEFAULTS["mlp_persist"],
                        help="hybrid persist-residuals MLP backward: the "
                             "first N blocks save their MLP residuals in HBM "
                             "(no forward recompute in the backward, measured "
                             "~0.43 GiB/block at DiT-B; persisting all 12 "
                             "blocks = +5%% img/s at batch 256) — only "
                             "effective at widths where the in-VMEM backward "
                             "kernel gates off; incompatible with --remat")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-3 sharding of params + Adam moments over "
                             "the data axis (ddm_tpu.parallel.fsdp): weights "
                             "all-gather just in time inside the step and "
                             "gradients reduce-scatter via the gather's VJP. "
                             "Cuts replicated fp32 state from 12 to 12/N "
                             "bytes/param; requires --tp 1")
    parser.add_argument("--pp", type=int, default=1,
                        help="pipeline-parallel stages over the 'pipe' mesh "
                             "axis (ddm_tpu.parallel.pipeline): the DiT "
                             "block stack is staged GPipe-style, each device "
                             "holding depth/N blocks' weights + Adam "
                             "moments; microbatches rotate between stages "
                             "via ppermute. Composes with --tp/--sp (3-D "
                             "data x pipe x model mesh) but not --fsdp; "
                             "--depth must be divisible by N")
    parser.add_argument("--pp-microbatches", type=int, default=4,
                        dest="pp_microbatches",
                        help="microbatches per pipeline step; the bubble "
                             "fraction is (pp-1)/(M+pp-1), so raise M to "
                             "amortise it. Must divide the per-shard row "
                             "count (batch/dp * m)")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() for TPU pod "
                             "slices (also implied by JAX_COORDINATOR_ADDRESS)")
    parser.add_argument("--fast-gelu", action="store_true",
                        help="sigmoid-GELU approximation (DDM_TPU_FAST_GELU=1)"
                             ": +10.5%% train throughput at a documented "
                             "numerics deviation from the reference's exact-"
                             "erf GELU (loss delta 1.4e-5 after 30 steps)")
    return parser


def main(argv: Optional[list] = None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    apply_config(parser, args)
    attn_bi_defaulted = False
    if args.fast_gelu:
        os.environ["DDM_TPU_FAST_GELU"] = "1"

    if args.device == "cpu":
        # Honour the flag for real (it was parity-recorded only): force
        # the CPU backend before the first device query. This works even
        # under platform-pinning sitecustomizes that ignore JAX_PLATFORMS
        # (config update beats the pin as long as no device has been
        # touched yet) — lets CI exercise the shell entry points
        # end-to-end without a TPU.
        jax.config.update("jax_platforms", "cpu")

    if args.multihost or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    import ddm_tpu

    ddm_tpu.disable_cache_if_cpu_backend()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.m < 2:
        parser.error("m must be >= 2 for the generalized energy score")
    if args.grad_accum < 1:
        parser.error("--grad-accum must be >= 1")
    if args.warmup_steps < 0:
        parser.error("--warmup-steps must be >= 0")
    if not 0.0 <= args.ema_decay < 1.0:
        parser.error("--ema-decay must be in [0, 1)")
    if args.tp > 1:
        hidden = int(args.embed_dim * args.mlp_ratio)
        if args.embed_dim % args.tp or args.heads % args.tp or hidden % args.tp:
            parser.error("--tp must divide --embed-dim, --heads, and the MLP "
                         "hidden size")
    if args.sp:
        if args.tp <= 1:
            parser.error("--sp (sequence parallelism) rides the model axis: "
                         "it requires --tp > 1")
        n_tokens = (args.image_size // args.patch_size) ** 2
        if n_tokens % args.tp:
            parser.error(f"--sp needs the token count ({n_tokens}) divisible "
                         f"by --tp ({args.tp})")
    if args.moe_experts > 1:
        if args.moe_experts % args.tp:
            parser.error("--moe-experts must be divisible by --tp "
                         "(expert parallelism shards E/tp experts per "
                         "model shard)")
        if args.mlp_persist:
            parser.error("--mlp-persist applies to the dense MLP half, "
                         "which --moe-experts replaces")
        if args.moe_topk not in (1, 2):
            parser.error("--moe-topk must be 1 or 2")
        if args.embed_dim >= 768 and "DDM_TPU_ATTN_BWD_BI" not in os.environ:
            # The MoE program's layouts push the attention split-backward
            # 373 KB over Mosaic's 16 MB scoped-vmem limit at D>=768
            # (measured; the dense program compiles fine). Default the
            # documented escape hatch so the config works out of the box.
            # Restored after the run (see the finally below): main() is
            # called programmatically in tests, and a leaked value would
            # silently cap LATER dense runs in the same process.
            attn_bi_defaulted = True
            os.environ["DDM_TPU_ATTN_BWD_BI"] = "2"
            print("[moe] DDM_TPU_ATTN_BWD_BI=2 (attention split-backward "
                  "image block capped: MoE layouts at this width exceed "
                  "scoped VMEM at bi=4; export the var to override)",
                  flush=True)
    if args.fsdp and args.tp > 1:
        parser.error("--fsdp composes with data parallelism only: the "
                     "shape-based FSDP placement conflicts with the Megatron "
                     "TP rule table (use one or the other)")
    if args.pp > 1:
        if args.fsdp:
            parser.error("--pp does not compose with --fsdp (the staged "
                         "stack is already model-sharded over 'pipe'; use "
                         "--pp with --tp/--sp and data parallelism)")
        if args.depth % args.pp:
            parser.error("--pp must divide --depth (equal-depth stages)")
        if args.pp_microbatches < 1:
            parser.error("--pp-microbatches must be >= 1")
        if args.mlp_persist:
            parser.error("--mlp-persist does not compose with --pp: the "
                         "per-block-index hybrid cannot map onto the "
                         "single shared block a stacked stage scan runs "
                         "(use --remat for PP memory relief)")
        multihost = args.multihost or "JAX_COORDINATOR_ADDRESS" in os.environ
        if not multihost:
            # single-process: the final mesh shape is known now, so fail
            # fast like the --tp/--sp divisibility checks (multi-host runs
            # see only local devices here; make_pipe_mesh revalidates)
            n_dev = jax.device_count()
            if n_dev % (args.pp * args.tp):
                parser.error(f"--pp {args.pp} x --tp {args.tp} must divide "
                             f"the device count ({n_dev})")
            dp = n_dev // (args.pp * args.tp)
            if args.batch % dp:
                parser.error(f"--batch {args.batch} must divide over "
                             f"{dp} data shards")
            rows = (args.batch // dp) * args.m
            if rows % args.pp_microbatches:
                parser.error(f"--pp-microbatches {args.pp_microbatches} "
                             f"must divide the per-shard row count "
                             f"(batch/dp * m = {rows})")
    if args.eval_every > 0 and args.eval_samples <= 0:
        parser.error("--eval-samples must be positive when evaluation is enabled")
    if args.eval_batch <= 0:
        parser.error("--eval-batch must be positive")

    try:
        train(args)
    finally:
        if attn_bi_defaulted:
            os.environ.pop("DDM_TPU_ATTN_BWD_BI", None)


if __name__ == "__main__":
    main()
