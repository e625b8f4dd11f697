"""Pipeline parallelism: the DiT block stack staged over a ``pipe`` mesh axis.

The reference has no parallelism of any kind (SURVEY §2, parallelism
statement); like :mod:`ddm_tpu.parallel.tp` and ``fsdp``, this module is a
capability addition for scaled DiT depth — models whose block stack does not
fit (or is not wanted) on a single chip. The design is TPU-native GPipe:

  * The ``depth`` DiT blocks are re-packed into a **stacked** parameter tree
    of shape ``(S, L, ...)`` per leaf (``S`` pipeline stages × ``L = depth/S``
    blocks per stage) and sharded ``P('pipe')`` over the mesh — each device
    holds only its own stage's weights and Adam moments (1/S of the stack).
  * One jitted ``lax.scan`` drives ``M + S - 1`` pipeline ticks over ``M``
    microbatches. Every tick runs this stage's ``L`` blocks on the activation
    in flight and rotates it to the next stage with a single
    ``lax.ppermute`` over the ``pipe`` axis (nearest-neighbour ICI traffic).
  * The backward pass is pure autodiff: the transpose of ``ppermute`` is the
    reverse rotation, so the cotangents pipeline backwards through the same
    schedule (an all-forward-then-all-backward GPipe; bubble fraction
    ``(S-1)/(M+S-1)``, amortised by raising ``M``).
  * The embedding (patchify/time/pos) and head (final-norm/unembed) weights
    stay replicated over ``pipe``; every device computes them redundantly
    (they are <2% of DiT FLOPs). Gradient correctness at the two
    replicated↔staged boundaries reuses the Megatron f/g operators from
    :mod:`ddm_tpu.parallel.tp`: the embedding output enters the pipeline
    through ``tp_region_enter`` (identity forward, psum backward — only
    stage 0 consumes it, so the psum rebuilds the full cotangent on every
    device and replicated embed grads stay replicated), and the collected
    last-stage outputs leave through ``tp_region_exit`` (psum forward to
    broadcast them — every other stage's buffer is zeros — identity
    backward, because the loss downstream is replicated over ``pipe``).

Composes with data parallelism on a 2-D ``(data, pipe)`` mesh: the batch is
sharded over ``data``; gradients are ``pmean``-ed over ``data`` only (the
f/g operators own every ``pipe`` collective).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS
from .sharding import DIT_TP_RULES, spec_for_path
from .tp import sp_region_exit, tp_region_enter, tp_region_exit

__all__ = [
    "PIPE_AXIS",
    "make_pipe_mesh",
    "split_block_params",
    "merge_block_params",
    "to_pipeline_params",
    "from_pipeline_params",
    "pipeline_tree_shardings",
    "make_pipelined_apply",
]

PIPE_AXIS = "pipe"


def make_pipe_mesh(
    pp: int,
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, pipe)`` mesh, or ``(data, pipe, model)`` at tp > 1.

    ``model`` is trailing (fastest-varying) so the per-block Megatron
    collectives ride nearest-neighbour ICI links; ``pipe`` is next, so
    consecutive stages stay adjacent for the per-tick activation rotation.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        if n % (pp * tp) != 0:
            raise ValueError(f"{n} devices not divisible by pp*tp={pp * tp}")
        dp = n // (pp * tp)
    if dp * pp * tp != n:
        raise ValueError(f"dp*pp*tp = {dp * pp * tp} != {n} devices")
    if tp > 1:
        arr = np.asarray(devices).reshape(dp, pp, tp)
        return Mesh(arr, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(dp, pp)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def _block_keys(params: Dict[str, Any]) -> list:
    keys = sorted(
        (k for k in params if k.startswith("block_")),
        key=lambda k: int(k.split("_")[1]),
    )
    if not keys:
        raise ValueError("param tree has no block_* subtrees")
    return keys


def split_block_params(variables: Dict[str, Any]) -> Tuple[Dict[str, Any], Any]:
    """Split a canonical DiT variable tree into (non-block vars, stacked blocks).

    The stacked tree has one leading ``depth`` axis per leaf (``block_0`` …
    ``block_{depth-1}`` stacked in order). The non-block tree keeps the
    canonical ``{'params': {...}}`` layout minus the block subtrees, so it
    remains directly applicable via ``apply(..., method='embed_tokens')``.
    """
    p = dict(variables["params"])
    keys = _block_keys(p)
    blocks = [p.pop(k) for k in keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    nonblock = dict(variables)
    nonblock["params"] = p
    return nonblock, stacked


def merge_block_params(nonblock: Dict[str, Any], stacked: Any) -> Dict[str, Any]:
    """Inverse of :func:`split_block_params` (canonical checkpoint layout)."""
    leaves = jax.tree.leaves(stacked)
    depth = int(leaves[0].shape[0])
    p = dict(nonblock["params"])
    for i in range(depth):
        p[f"block_{i}"] = jax.tree.map(lambda a, i=i: a[i], stacked)
    out = dict(nonblock)
    out["params"] = p
    return out


def to_pipeline_params(variables: Dict[str, Any], n_stages: int) -> Dict[str, Any]:
    """Canonical DiT variables -> pipeline param tree.

    Returns ``{'embed': nonblock_vars, 'stages': stacked}`` where ``stages``
    leaves have shape ``(S, L, ...)`` — stage-major so a ``P('pipe')``
    sharding puts each stage's ``L`` consecutive blocks on one device.
    """
    nonblock, stacked = split_block_params(variables)
    depth = int(jax.tree.leaves(stacked)[0].shape[0])
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    L = depth // n_stages
    stages = jax.tree.map(
        lambda a: a.reshape((n_stages, L) + a.shape[1:]), stacked
    )
    return {"embed": nonblock, "stages": stages}


def from_pipeline_params(pipe_params: Dict[str, Any]) -> Dict[str, Any]:
    """Pipeline param tree -> canonical DiT variables (checkpoints, eval).

    Leaves keep their array type: replicated ``jax.Array``s stay on device
    (the per-eval canonicalisation must not round-trip the model through
    host memory), numpy stays numpy (the checkpoint-load path).
    """
    stages = pipe_params["stages"]
    s, l = jax.tree.leaves(stages)[0].shape[:2]
    stacked = jax.tree.map(
        lambda a: a.reshape((s * l,) + a.shape[2:]), stages
    )
    return merge_block_params(pipe_params["embed"], stacked)


def pipeline_tree_shardings(tree: Any, mesh: Mesh) -> Any:
    """Shardings for a pipeline TrainState: ``stages`` leaves ``P('pipe')``
    on their leading (stage) axis, everything else replicated.

    When the mesh carries a ``model`` axis (PP x TP composition), the
    Megatron rule table additionally shards the stage weights' column/row
    dims — a stacked qkv kernel ``(S, L, D, 3D)`` becomes
    ``P('pipe', None, None, 'model')``.

    Works for the whole TrainState because Adam's moments mirror the param
    tree (same ``stages``/``embed`` key structure).
    """
    tp = mesh.shape.get(MODEL_AXIS, 1)

    def leaf_sharding(path, leaf):
        in_stages = any(
            getattr(p, "key", None) == "stages" for p in path
        )
        ndim = getattr(leaf, "ndim", 0)
        if in_stages and ndim >= 1:
            if tp > 1:
                parts = [
                    str(getattr(p, "key", getattr(p, "name", p)))
                    for p in path
                ]
                inner = spec_for_path("/".join(parts), DIT_TP_RULES)
                if len(inner) + 2 <= ndim:
                    return NamedSharding(mesh, P(PIPE_AXIS, None, *inner))
            return NamedSharding(mesh, P(PIPE_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def make_pipelined_apply(model, n_stages: int, n_microbatches: int,
                         moe_aux_weight: float = 0.0):
    """Build the pipelined denoiser apply fn (shard_map body).

    Returns ``apply(pipe_params, xt, t, xi) -> fp32 tokens`` with the
    framework denoiser contract, meant to run INSIDE a ``shard_map`` over a
    ``(data, pipe)`` mesh (e.g. via
    :func:`ddm_tpu.parallel.make_sharded_train_step` with
    ``dp_shard_map=True``). ``pipe_params`` is the tree from
    :func:`to_pipeline_params`; under ``shard_map`` its ``stages`` leaves
    arrive as the local ``(1, L, ...)`` stage slice.

    ``moe_aux_weight > 0`` (with an MoE model) switches the return to the
    tuple form ``(tokens, aux)`` that
    :func:`ddm_tpu.training.distributional_training_step` adds to the
    energy loss: each stage runs its blocks with ``mutable=['losses']`` so
    the per-block Switch load-balance terms survive the staged scan,
    accumulates them over its own valid pipeline ticks only (warmup/drain
    ticks route zero/stale activations), and the per-stage sums are
    combined across ``pipe`` by a psum-forward/identity-backward exit.
    Convention: the per-layer aux is the mean over microbatches of the
    per-microbatch group statistic — one more level of averaging on top of
    the routing groups the non-PP path already uses.

    The per-shard row count (``B*m`` after the training step's m-expansion)
    must be divisible by ``n_microbatches``.

    Composes with the model's own tensor/sequence parallelism: ``model.tp``
    / ``model.tp_axis`` put the Megatron layout inside each stage's blocks
    (collectives over ``model``, orthogonal to the ``pipe`` rotation), and
    ``model.sequence_parallel`` token-shards the rotating activations —
    the SP enter (f + slice) runs once after the embed, the blocks keep
    the residual stream token-sharded through every stage, and
    :func:`~ddm_tpu.parallel.tp.sp_region_exit` re-gathers before the head.
    """
    from flax import linen as nn

    from ddm_tpu.models.dit import DiTBlock

    # Honour the model's remat setting: PP targets exactly the deep/wide
    # regime where block rematerialisation matters, and the staged scan
    # otherwise saves every tick's activations. (mlp_persist is rejected
    # at the CLI: the per-block-index hybrid doesn't map onto the single
    # shared block module a stacked scan runs.)
    block_cls = nn.remat(DiTBlock) if model.remat else DiTBlock
    block = block_cls(
        model.embed_dim,
        model.num_heads,
        model.mlp_ratio,
        dtype=model.dtype,
        attention_impl=model.attention_impl,
        fused_mlp=model.fused_mlp,
        tp=model.tp,
        tp_axis=model.tp_axis,
        sequence_parallel=model.sequence_parallel,
        moe_experts=model.moe_experts,
        moe_capacity=model.moe_capacity,
        moe_group_size=model.moe_group_size,
        moe_topk=model.moe_topk,
    )
    S = n_stages
    M = n_microbatches
    perm = [(i, (i + 1) % S) for i in range(S)]
    sp = model.sequence_parallel and model.tp_axis is not None
    with_aux = moe_aux_weight > 0.0 and getattr(model, "moe_experts", 0) > 0

    def apply(pipe_params, xt, t, xi):
        h = model.apply(pipe_params["embed"], xt, t, xi,
                        method="embed_tokens")
        if sp:
            # enter the token-sharded region once, before microbatching:
            # f-wrap (psum over model backward) then slice this model
            # shard's token block — same operators as DDDMDiT.tokens
            nl = h.shape[1] // model.tp
            h = tp_region_enter(h, model.tp_axis)
            si = jax.lax.axis_index(model.tp_axis)
            h = jax.lax.dynamic_slice_in_dim(h, si * nl, nl, 1)
        B, N, D = h.shape
        if B % M:
            raise ValueError(
                f"per-shard rows {B} not divisible by {M} microbatches"
            )
        mb = B // M
        # f operator: h is replicated over pipe but consumed (via the
        # stage-0 select below) by only one member; the backward psum
        # rebuilds the full dL/dh on every device so the replicated embed
        # params get full, identical gradients per shard.
        hm = tp_region_enter(h.reshape(M, mb, N, D), PIPE_AXIS)

        stage_local = jax.tree.map(lambda a: a[0], pipe_params["stages"])
        s_idx = jax.lax.axis_index(PIPE_AXIS)

        def run_stage(x):
            def body(xc, bp):
                if with_aux:
                    yb, mut = block.apply({"params": bp}, xc,
                                          mutable=["losses"])
                    terms = jax.tree.leaves(dict(mut).get("losses", {}))
                    a = (sum(terms) if terms
                         else jnp.zeros((), jnp.float32))
                    return yb, a
                return block.apply({"params": bp}, xc), jnp.zeros(
                    (), jnp.float32)

            y, auxes = jax.lax.scan(body, x, stage_local)
            return y, jnp.sum(auxes)

        def tick(carry, tt):
            st, out, acc = carry
            ridx = jnp.clip(tt, 0, M - 1)
            inp = jax.lax.dynamic_index_in_dim(hm, ridx, 0, keepdims=False)
            x = jnp.where(s_idx == 0, inp, st)
            y, a = run_stage(x)
            if with_aux:
                # a stage holds REAL data only on its own M in-flight ticks
                # (microbatch ridx entered stage s at tick s); warmup runs
                # on rotated zeros and drain on stale carries — their aux
                # (and its gradients) must not leak into the loss
                live = (tt >= s_idx) & (tt - s_idx <= M - 1)
                acc = acc + jnp.where(live, a, 0.0)
            widx = tt - (S - 1)
            wc = jnp.clip(widx, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(out, wc, 0, keepdims=False)
            valid = (s_idx == S - 1) & (widx >= 0)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(valid, y, cur), wc, 0
            )
            if S > 1:
                st = jax.lax.ppermute(y, PIPE_AXIS, perm)
            else:
                st = y
            return (st, out, acc), None

        carry0 = (
            jnp.zeros((mb, N, D), h.dtype),
            jnp.zeros((M, mb, N, D), h.dtype),
            jnp.zeros((), jnp.float32),
        )
        (_, out, aux_acc), _ = jax.lax.scan(
            tick, carry0, jnp.arange(M + S - 1))
        # g operator: every stage but the last holds zeros, so the psum is a
        # broadcast of the last stage's outputs; the identity backward is
        # correct because the downstream loss is replicated over pipe.
        mask = (s_idx == S - 1).astype(out.dtype)
        out = tp_region_exit(out * mask, PIPE_AXIS)
        out = out.reshape(B, N, D)
        if sp:
            out = sp_region_exit(out, model.tp_axis, 1)
        head = model.apply(
            pipe_params["embed"], out, method="head_tokens"
        )
        if with_aux:
            # total over the depth = S*L layers: psum the per-stage sums
            # (identity backward — each stage's contribution has gradient
            # 1 into the total, and the downstream loss is replicated over
            # pipe), then apply the Switch convention (mean over layers)
            # and the microbatch mean
            total = tp_region_exit(aux_acc, PIPE_AXIS)
            n_layers = S * jax.tree.leaves(pipe_params["stages"])[0].shape[1]
            aux = (moe_aux_weight / (n_layers * M)) * total
            return head, aux
        return head

    return apply
