"""DDDM training core: loss step, jitted update, and the toy training loop.

TPU-native re-implementation of ``/root/reference/dddm/training.py``:

  * :func:`distributional_training_step` — the heart of the method (reference
    ``training.py:32-93``), shared verbatim between the toy and CIFAR paths:
    forward marginals (eq. (2)), the m-way denoiser query expansion, and the
    conditional generalized energy score (eqs. (12)-(14)) with the batch-mean
    logistic weight applied *outside* the per-sample terms
    (``training.py:84-85`` — per-sample weights are intentionally NOT
    applied per-sample; parity requires the same).
  * :func:`make_train_step` — compiles loss + grad + optimizer update into a
    single donated XLA program.
  * :func:`train_dddm` — the toy GMM training loop (``training.py:96-199``),
    re-architected TPU-first: data generation (``sample_gmm``), the m-expanded
    forward/backward, and the Adam update all fuse into ONE compiled program,
    and multiple steps are driven by ``lax.scan`` chunks so Python dispatch
    overhead amortises to ~zero. Metrics stream back per step with identical
    keys/history schema ({loss, confidence, interaction, weight} — reference
    ``training.py:87-92``) and the same artifacts (checkpoint,
    ``training_metrics.json``, ``training_dynamics.png``, optional W&B with
    the ``train/*`` / ``plots/*`` namespaces).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from .data.gmm import sample_gmm
from .models.mlp import DDDMMLP
from .ops.energy import fused_energy_terms
from .ops.losses import sigmoid_weight
from .ops.schedules import forward_marginal_sample
from .utils import checkpoint as ckpt_lib
from .utils.plotting import plot_training_curves

__all__ = [
    "TrainConfig",
    "TrainState",
    "distributional_training_step",
    "make_loss_fn",
    "make_train_step",
    "train_dddm",
]

ApplyFn = Callable[..., jnp.ndarray]
MetricDict = Dict[str, jnp.ndarray]


class TrainState(train_state.TrainState):
    """Flax train state (params + optax state + step counter), optionally
    carrying an exponential moving average of the parameters.

    ``ema_params`` (capability addition; the reference has no EMA) is
    ``None`` when EMA is off — every step builder, sharding rule, and
    checkpoint path then behaves exactly as before (``None`` is an empty
    pytree). When present it is a tree congruent with ``params`` and is
    sharded/checkpointed alongside them; eval and sampling prefer it
    (the standard diffusion-model practice, e.g. DiT/ADM).
    """

    ema_params: Any = None


def update_ema(state: TrainState, decay: float) -> TrainState:
    """One EMA step: ``ema += (1 - decay) * (params - ema)`` (fp32 leaves).

    Pure tree math — runs inside the compiled training step under any
    sharding (EMA leaves shard identically to their parameters, so no
    collectives are needed).
    """
    new_ema = jax.tree.map(
        lambda e, p: e + (1.0 - decay) * (p.astype(e.dtype) - e),
        state.ema_params, state.params,
    )
    return state.replace(ema_params=new_ema)


@dataclass
class TrainConfig:
    """Toy training configuration (reference ``training.py:16-29``).

    ``device`` is kept for CLI parity but on JAX the placement is decided by
    the runtime (TPU when present); it is recorded, not enforced.
    """

    beta: float = 0.1
    lam: float = 1.0
    m: int = 8
    w_bias: float = 0.0
    lr: float = 2e-3
    epochs: int = 2000
    batch: int = 512
    device: str = "tpu"
    seed: int = 0
    use_wandb: bool = False
    wandb_project: str = "dddm"
    wandb_run_name: Optional[str] = None
    # TPU-specific knobs (additions over the reference, documented as such):
    steps_per_scan: int = 100  # steps fused into one lax.scan program
    log_every: int = 100  # console/progress cadence (history is still per-step)


def distributional_training_step(
    apply_fn: ApplyFn,
    params: Any,
    key: jax.Array,
    x0: jnp.ndarray,
    *,
    m: int,
    beta: float,
    lam: float,
    w_bias: float,
    t: Optional[jnp.ndarray] = None,
    target_transform: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, MetricDict]:
    """Generalized energy training loss (paper eqs. (12)-(14)); pure & jittable.

    Per batch element: sample ``t ~ U[0,1]`` and ``eps ~ N(0,I)``, form
    ``x_t``; draw ``m`` independent latents ``xi``; run ONE batched denoiser
    call on ``B*m`` rows; combine confinement and interaction energy terms
    weighted by the batch-mean logistic ``w(t)``.

    Reference parity: ``/root/reference/dddm/training.py:32-93``. Returns the
    loss plus a metrics dict of on-device scalars (no host sync — callers
    decide when to flush).

    ``apply_fn`` may return ``(x0hat, aux)`` instead of a bare ``x0hat``:
    ``aux`` is an already-weighted auxiliary scalar loss (e.g. the Switch
    load-balance loss from :func:`ddm_tpu.models.moe.make_moe_aux_apply`)
    added to the energy loss and reported under the ``moe_aux`` metric key.
    The reference has no auxiliary losses, so the metric-key contract
    {loss, confidence, interaction, weight} is unchanged when apply_fn
    returns a bare array.
    """
    if m < 2:
        raise ValueError("m must be >= 2 to form interaction pairs")

    batch = x0.shape[0]
    kt, keps, kxi = jax.random.split(key, 3)

    if t is None:
        t = jax.random.uniform(kt, (batch,), dtype=x0.dtype)
    eps = jax.random.normal(keps, x0.shape, dtype=x0.dtype)
    xt = forward_marginal_sample(x0, t, eps)

    xi = jax.random.normal(kxi, (batch, m) + x0.shape[1:], dtype=x0.dtype)
    # m-expansion: broadcast x_t across the m axis then flatten to B*m rows
    # feeding a single batched forward (reference training.py:70-74).
    xt_rep = jnp.broadcast_to(xt[:, None], (batch, m) + xt.shape[1:]).reshape(
        (batch * m,) + xt.shape[1:]
    )
    xi_flat = xi.reshape((batch * m,) + x0.shape[1:])
    t_rep = jnp.repeat(t, m)

    out = apply_fn(params, xt_rep, t_rep, xi_flat)
    x0hat, aux = out if isinstance(out, tuple) else (out, None)
    x0hat = x0hat.reshape(batch, m, -1)

    # The energy terms reduce over the flattened data axis, which is
    # permutation-invariant — so apply_fn may emit any fixed permutation of
    # the data (e.g. DDDMDiT.tokens, skipping unpatchify) as long as
    # target_transform applies the SAME permutation to x0.
    x0_target = x0 if target_transform is None else target_transform(x0)

    # fused Pallas kernel on TPU for image-sized D, jnp reference otherwise
    conf, inter = fused_energy_terms(
        x0hat, x0_target.reshape(batch, -1).astype(jnp.float32), beta
    )
    weight = jnp.mean(sigmoid_weight(t.astype(jnp.float32), bias=w_bias))
    loss = weight * (conf - (lam / (2.0 * (m - 1))) * inter)

    metrics: MetricDict = {
        "loss": loss,
        "confidence": conf,
        "interaction": inter,
        "weight": weight,
    }
    if aux is not None:
        loss = loss + aux
        metrics["loss"] = loss
        metrics["moe_aux"] = aux
    return loss, metrics


def make_loss_fn(
    apply_fn: ApplyFn, *, m: int, beta: float, lam: float, w_bias: float,
    target_transform: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> Callable[[Any, jax.Array, jnp.ndarray], Tuple[jnp.ndarray, MetricDict]]:
    """Bind hyperparameters into a ``(params, key, x0) -> (loss, metrics)`` fn."""

    def loss_fn(params: Any, key: jax.Array, x0: jnp.ndarray):
        return distributional_training_step(
            apply_fn, params, key, x0, m=m, beta=beta, lam=lam, w_bias=w_bias,
            target_transform=target_transform,
        )

    return loss_fn


def make_train_step(
    apply_fn: ApplyFn,
    *,
    m: int,
    beta: float,
    lam: float,
    w_bias: float,
    axis_name: Optional[str] = None,
    jit: bool = True,
    ema_decay: Optional[float] = None,
):
    """Build a ``(state, key, x0) -> (state, metrics)`` update.

    Loss, gradients, and the optax update compile into one XLA program; the
    incoming state buffers are donated so parameters update in place in HBM.
    When ``axis_name`` is given, gradients and metrics are ``pmean``-reduced
    across that mesh axis (used by ``shard_map``-style data parallelism;
    under ``jit`` + ``NamedSharding`` XLA inserts the collectives itself and
    ``axis_name`` should stay ``None``). States carrying ``ema_params``
    get an :func:`update_ema` step at ``ema_decay`` fused in.
    """
    loss_fn = make_loss_fn(apply_fn, m=m, beta=beta, lam=lam, w_bias=w_bias)

    def step(state: TrainState, key: jax.Array, x0: jnp.ndarray):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, key, x0
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.tree.map(lambda v: jax.lax.pmean(v, axis_name), metrics)
        new_state = state.apply_gradients(grads=grads)
        if state.ema_params is not None:
            if ema_decay is None:
                raise ValueError(
                    "state carries ema_params but make_train_step was built "
                    "without ema_decay; pass the decay explicitly (the CLI "
                    "default is 0.9999)"
                )
            new_state = update_ema(new_state, ema_decay)
        return new_state, metrics

    if jit:
        step = jax.jit(step, donate_argnums=(0,))
    return step


def _make_scanned_toy_step(apply_fn: ApplyFn, cfg: TrainConfig):
    """Fuse a chunk of full steps (GMM data gen + fwd/bwd + Adam) into one
    compiled program via ``lax.scan``; returns stacked per-step metrics so
    history stays per-step as in the reference. The returned callable
    compiles once per distinct chunk length (two programs for a typical run:
    the main chunk and the final ragged one)."""

    loss_fn = make_loss_fn(
        apply_fn, m=cfg.m, beta=cfg.beta, lam=cfg.lam, w_bias=cfg.w_bias
    )

    def one_step(state: TrainState, key: jax.Array):
        kdata, kstep = jax.random.split(key)
        x0 = sample_gmm(kdata, cfg.batch)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, kstep, x0
        )
        return state.apply_gradients(grads=grads), metrics

    scan_steps = jax.jit(
        lambda s, k: jax.lax.scan(one_step, s, k), donate_argnums=(0,)
    )
    return scan_steps


def train_dddm(
    config: TrainConfig,
    outdir: str = "./out",
    *,
    return_history: bool = False,
):
    """Train the toy distributional diffusion model (reference parity loop).

    Returns the final :class:`TrainState` (or ``(state, history)``). The
    state's ``apply_fn``/``params`` plug directly into
    :func:`ddm_tpu.sampling.sample_dddm` — the same library-call contract the
    reference exposes (``run_example.py:96-99``).
    """
    os.makedirs(outdir, exist_ok=True)
    root_key = jax.random.PRNGKey(config.seed)

    model = DDDMMLP()
    init_key, root_key = jax.random.split(root_key)
    dummy = jnp.zeros((1, 2), jnp.float32)
    params = model.init(init_key, dummy, jnp.zeros((1,)), dummy)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(config.lr)
    )

    wandb_run = None
    wandb_module = None
    if config.use_wandb:
        try:
            import wandb  # pragma: no cover - optional dependency
        except ImportError as exc:  # pragma: no cover - defensive import guard
            raise RuntimeError(
                "Weights & Biases is not installed but `use_wandb` was set to True."
            ) from exc
        wandb_run = wandb.init(
            project=config.wandb_project,
            name=config.wandb_run_name,
            config=asdict(config),
        )
        wandb_module = wandb

    scan_steps = _make_scanned_toy_step(model.apply, config)

    from tqdm.auto import tqdm

    total = config.epochs
    chunk = max(1, min(config.steps_per_scan, total))
    history: Dict[str, list] = {"step": []}
    done = 0
    progress = tqdm(total=total, desc="Training", unit="step", dynamic_ncols=True)
    while done < total:
        n = min(chunk, total - done)
        root_key, sub = jax.random.split(root_key)
        keys = jax.random.split(sub, n)
        state, metrics = scan_steps(state, keys)
        metrics = jax.device_get(metrics)
        for i in range(n):
            history["step"].append(done + i + 1)
            for k, v in metrics.items():
                history.setdefault(k, []).append(float(v[i]))
        done += n
        if wandb_run is not None:
            for i in range(n):
                wandb_run.log(
                    {f"train/{k}": history[k][done - n + i] for k in metrics},
                    step=done - n + i + 1,
                )
        progress.update(n)
        progress.set_postfix(
            {
                "loss": f"{history['loss'][-1]:.4f}",
                "conf": f"{history['confidence'][-1]:.4f}",
                "inter": f"{history['interaction'][-1]:.4f}",
                "w~": f"{history['weight'][-1]:.3f}",
            },
            refresh=False,
        )
    progress.close()

    ckpt_lib.save_checkpoint(
        os.path.join(outdir, "model.ckpt"), state.params, config=asdict(config)
    )

    metrics_path = os.path.join(outdir, "training_metrics.json")
    with open(metrics_path, "w", encoding="utf-8") as f:
        json_history: Dict[str, list] = {}
        for key, values in history.items():
            if key == "step":
                json_history[key] = [int(v) for v in values]
            else:
                json_history[key] = [float(v) for v in values]
        json.dump(json_history, f, indent=2)

    plot_path = os.path.join(outdir, "training_dynamics.png")
    try:
        plot_training_curves(
            history,
            plot_path,
            title="Toy DDDM training dynamics",
            xlabel="Step",
            x_key="step",
        )
    except ValueError:
        pass
    else:
        if wandb_run is not None and wandb_module is not None:
            wandb_run.log(
                {"plots/training_dynamics": wandb_module.Image(plot_path)},
                step=config.epochs,
            )

    if wandb_run is not None:
        wandb_run.finish()
    if return_history:
        return state, history
    return state
