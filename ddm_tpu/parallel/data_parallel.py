"""Sharded training-step factory: DP over the batch, optional TP over params.

The TPU-native equivalent of the distributed trainer the reference never had
(SURVEY §5.8): one jitted step whose inputs carry ``NamedSharding``s — the
global batch split over the ``data`` mesh axis, parameters replicated (pure
DP) or sharded by the Megatron-style rules in
:mod:`ddm_tpu.parallel.sharding` (DP+TP). Gradient allreduce, TP activation
psums, and any resharding are inserted by XLA's SPMD partitioner; there are
no explicit collectives in this file, by design.

The step donates the incoming TrainState, so parameters and optimizer
moments update in place in HBM.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..training import TrainState, make_loss_fn, update_ema
from .fsdp import combine_fsdp_grads, gather_tree
from .mesh import DATA_AXIS
from .sharding import REPLICATED_RULES, train_state_shardings

__all__ = ["make_sharded_train_step", "place_train_state"]

PreprocessFn = Callable[[jax.Array, jnp.ndarray], jnp.ndarray]


def place_train_state(
    state: TrainState, mesh: Mesh,
    rules: Sequence[Tuple[str, P]] = REPLICATED_RULES,
    *, shardings: Any = None,
) -> Tuple[TrainState, Any]:
    """Place a host-built TrainState onto the mesh per the rule table.

    Returns ``(placed_state, state_shardings)``; the shardings tree is what
    the jitted step uses for its donated input/output. Pass a prebuilt
    ``shardings`` tree to bypass the path rules (the FSDP placement is
    shape-based — see :func:`ddm_tpu.parallel.fsdp.fsdp_tree_shardings`).
    """
    if shardings is None:
        shardings = train_state_shardings(state, mesh, rules)
    placed = jax.tree.map(
        lambda x, s: jax.device_put(x, s), state, shardings,
        is_leaf=lambda x: x is None,
    )
    return placed, shardings


def make_sharded_train_step(
    apply_fn: Callable[..., jnp.ndarray],
    mesh: Mesh,
    state_shardings: Any,
    *,
    m: int,
    beta: float,
    lam: float,
    w_bias: float,
    preprocess: Optional[PreprocessFn] = None,
    dp_shard_map: Optional[bool] = None,
    steps_per_scan: int = 1,
    target_transform: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    fsdp: bool = False,
    ema_decay: Optional[float] = None,
    ema_every: int = 1,
):
    """Build a jitted ``(state, key, batch) -> (state, metrics)`` step.

    Args:
        apply_fn: denoiser apply fn (framework contract).
        mesh: the device mesh (axes ``data`` / ``model``).
        state_shardings: shardings tree from :func:`place_train_state`.
        m/beta/lam/w_bias: energy-score hyperparameters.
        preprocess: optional on-device ``(key, raw_batch) -> x0`` hook (e.g.
            uint8 -> augment -> normalize); runs inside the compiled step so
            augmentation fuses with the forward pass.
        dp_shard_map: express the parallelism via ``shard_map`` (per-shard
            SPMD bodies with an explicit gradient ``pmean``) instead of
            jit-level shardings. REQUIRED for the Pallas-fused model on
            multi-chip meshes: XLA's SPMD partitioner cannot split a
            ``pallas_call``, so under jit-sharding it would gather the
            global batch onto every chip; under ``shard_map`` each kernel
            sees only its local shard. Defaults to True exactly when the
            mesh is pure data parallelism (no ``model`` axis extent).

            With a ``model`` axis present, pass ``dp_shard_map=True`` AND an
            ``apply_fn`` built for LOCAL weight shards (a DDDMDiT with
            ``tp=N, tp_axis='model'``): the model's Megatron f/g operators
            (``ddm_tpu.parallel.tp``) own every model-axis collective and
            keep gradients of replicated params correct per shard, so this
            step only ``pmean``s gradients over the data axis. This is the
            path that keeps the Pallas kernels active under tensor
            parallelism (head-sharded attention, partial fused MLP).
        steps_per_scan: fuse K optimizer steps into one compiled program via
            ``lax.scan``; the returned callable then takes a stacked batch
            ``(K, B, ...)`` (batch axis sharded over ``data``) and returns
            stacked per-step metrics ``(K,)``. Amortises per-dispatch
            overhead (measured ~5 ms through remote-TPU relays).
        fsdp: ZeRO-3 parameter/optimizer sharding over the data axis (see
            :mod:`ddm_tpu.parallel.fsdp`). Requires ``dp_shard_map`` and a
            ``state_shardings`` tree built with
            :func:`~ddm_tpu.parallel.fsdp.fsdp_tree_shardings` (pass it to
            :func:`place_train_state` via ``shardings=``). Inside the step,
            each shard all-gathers the weights just in time for the
            forward; autodiff turns that gather into the gradient
            reduce-scatter, and the optimizer updates 1/N-sized local
            leaves. If the ``tx`` clips by global norm it must use
            :func:`~ddm_tpu.parallel.fsdp.clip_by_global_norm_fsdp` — the
            plain optax clipper would see only local norms.

    The raw batch is expected sharded over ``data`` on its leading axis; the
    returned metrics are fully-reduced replicated scalars.
    """
    loss_fn = make_loss_fn(apply_fn, m=m, beta=beta, lam=lam, w_bias=w_bias,
                           target_transform=target_transform)
    batch_spec = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    if dp_shard_map is None:
        dp_shard_map = mesh.shape.get("model", 1) == 1
    if fsdp and not dp_shard_map:
        raise ValueError(
            "fsdp=True requires the shard_map step (dp_shard_map=True): "
            "the just-in-time weight gather is a per-shard program"
        )
    param_shardings = state_shardings.params if fsdp else None
    dp_degree = mesh.shape[DATA_AXIS]

    def step(state: TrainState, key: jax.Array, batch: jnp.ndarray):
        if dp_shard_map:
            # decorrelate per-shard noise: every shard sees the same key
            # (replicated), so fold in the shard index
            key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        if preprocess is not None:
            kpre, key = jax.random.split(key)
            x0 = preprocess(kpre, batch)
        else:
            x0 = batch
        if fsdp:
            # Differentiate w.r.t. the LOCAL parameter shards through the
            # gather: the all_gather's VJP is a psum_scatter, so sharded
            # leaves come back as this shard's slice of the cross-shard
            # gradient SUM (ZeRO's reduce-scatter for free).
            def local_loss(local_params, k, x):
                full = gather_tree(local_params, param_shardings)
                return loss_fn(full, k, x)

            (_, metrics), grads = jax.value_and_grad(
                local_loss, has_aux=True)(state.params, key, x0)
            grads = combine_fsdp_grads(grads, param_shardings, dp_degree)
            metrics = jax.tree.map(
                lambda v: jax.lax.pmean(v, DATA_AXIS), metrics)
        else:
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, key, x0
            )
            if dp_shard_map:
                grads = jax.lax.pmean(grads, DATA_AXIS)
                metrics = jax.tree.map(
                    lambda v: jax.lax.pmean(v, DATA_AXIS), metrics)
        new_state = state.apply_gradients(grads=grads)
        if state.ema_params is not None:
            if ema_decay is None:
                raise ValueError(
                    "state carries ema_params but make_sharded_train_step "
                    "was built without ema_decay; pass the decay explicitly "
                    "(the CLI default is 0.9999)"
                )
            # EMA leaves shard identically to their params (same tree, same
            # path rules), so this is collective-free under every layout.
            cand = update_ema(new_state, ema_decay)
            if ema_every > 1:
                # gradient accumulation: MultiSteps freezes params for
                # N-1 of every N micro-steps; blending on those would
                # shorten the averaging horizon to decay^N per real
                # update. Blend only on the emitting micro-step.
                emit = (new_state.step % ema_every) == 0
                new_state = new_state.replace(ema_params=jax.tree.map(
                    lambda n, o: jnp.where(emit, n, o),
                    cand.ema_params, new_state.ema_params,
                ))
            else:
                new_state = cand
        return new_state, metrics

    if steps_per_scan > 1:
        inner = step

        def step(state: TrainState, key: jax.Array, batches: jnp.ndarray):
            keys = jax.random.split(key, steps_per_scan)

            def body(s, inp):
                k, b = inp
                return inner(s, k, b)

            return jax.lax.scan(body, state, (keys, batches))

        batch_spec = NamedSharding(mesh, P(None, DATA_AXIS))

    if dp_shard_map:
        shard_map = jax.shard_map

        state_specs = jax.tree.map(lambda s: s.spec, state_shardings)
        batch_pspec = P(None, DATA_AXIS) if steps_per_scan > 1 else P(DATA_AXIS)
        body = shard_map(
            step,
            mesh=mesh,
            in_specs=(state_specs, P(), batch_pspec),
            out_specs=(state_specs, P()),
            check_vma=False,
        )
        return jax.jit(
            body,
            in_shardings=(state_shardings, repl, batch_spec),
            out_shardings=(state_shardings, repl),
            donate_argnums=(0,),
        )

    return jax.jit(
        step,
        in_shardings=(state_shardings, repl, batch_spec),
        out_shardings=(state_shardings, repl),
        donate_argnums=(0,),
    )
