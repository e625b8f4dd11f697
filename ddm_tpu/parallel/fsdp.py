"""ZeRO-3-style fully-sharded data parallelism over the ``data`` axis.

The reference implements no parallelism of any kind (SURVEY §2); like the
rest of :mod:`ddm_tpu.parallel` this is a TPU-native capability addition.
Pure DP replicates parameters and both Adam moments on every chip — at
DiT-L/4 that is ~3 GB of fp32 state per chip that grows linearly with
model width while contributing nothing to throughput. FSDP shards it:

  * every large TrainState leaf (params, Adam ``mu``/``nu``) lives
    SHARDED over the ``data`` mesh axis — one shape-based
    ``PartitionSpec`` per leaf, chosen by :func:`fsdp_spec` (first axis
    divisible by the data-parallel degree; small leaves stay replicated);
  * inside the ``shard_map`` training step each local shard is
    all-gathered just in time for the forward (:func:`gather_tree`), so
    the Pallas kernels still see full weight matrices;
  * autodiff transposes each ``all_gather`` into a ``psum_scatter``, so
    the backward delivers exactly this shard's slice of the summed
    gradient — ZeRO's gather/reduce-scatter pair with no hand-written
    collectives;
  * the optimizer update then runs on 1/N-sized local arrays.

Gradient clipping needs one extra care: the global grad norm is a sum
over *distinct* rows for sharded leaves but over *identical* copies for
replicated ones. :func:`clip_by_global_norm_fsdp` is the drop-in
``optax.clip_by_global_norm`` replacement that psums the two kinds
correctly (its update must run inside the data-axis ``shard_map``, which
is where ``make_sharded_train_step`` places it).

Memory accounting (what sharding buys): with Adam, fp32 params + mu + nu
are 12 bytes/param replicated; FSDP drops that to 12/N bytes/param plus
one transient gathered copy of the weights during the step.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

__all__ = [
    "fsdp_spec",
    "fsdp_tree_shardings",
    "gather_tree",
    "clip_by_global_norm_fsdp",
    "clip_by_global_norm_sharded",
]

# Leaves smaller than this stay replicated: gathering a (384,) bias costs
# a collective dispatch per step and saves ~1.5 KB/chip. 16 KiB of fp32 =
# 4096 elements — biases and LayerNorm vectors stay put, every weight
# matrix of the flagship models shards.
_MIN_SHARD_ELEMS = 4096


def fsdp_spec(shape: Tuple[int, ...], dp: int,
              min_size: int = _MIN_SHARD_ELEMS) -> P:
    """Shape-based FSDP PartitionSpec: the first axis divisible by ``dp``
    is sharded over the data axis; too-small or indivisible leaves stay
    replicated. Works for any leaf — optimizer moments mirror their
    parameter's shape, so the same function shards params, ``mu`` and
    ``nu`` identically without path rules."""
    size = 1
    for d in shape:
        size *= d
    if size < min_size or dp <= 1:
        return P()
    for k, d in enumerate(shape):
        if d % dp == 0 and d >= dp:
            return P(*([None] * k), DATA_AXIS)
    return P()


def fsdp_tree_shardings(tree: Any, mesh: Mesh,
                        min_size: int = _MIN_SHARD_ELEMS) -> Any:
    """Map every leaf of ``tree`` (params or a whole TrainState) to its
    FSDP ``NamedSharding`` by shape. Scalars and small leaves replicate."""
    dp = mesh.shape[DATA_AXIS]

    def leaf(x):
        shape = tuple(getattr(x, "shape", ()) or ())
        return NamedSharding(mesh, fsdp_spec(shape, dp, min_size))

    return jax.tree.map(leaf, tree)


def _shard_dim(spec: P) -> Optional[int]:
    for k, s in enumerate(spec):
        if s == DATA_AXIS:
            return k
    return None


def gather_tree(tree: Any, shardings: Any) -> Any:
    """All-gather every data-sharded leaf back to full size (inside a
    data-axis ``shard_map``). The VJP of each gather is a
    ``psum_scatter``, which is exactly ZeRO's gradient reduce-scatter."""

    def leaf(x, sh):
        k = _shard_dim(sh.spec)
        if k is None:
            return x
        return jax.lax.all_gather(x, DATA_AXIS, axis=k, tiled=True)

    return jax.tree.map(leaf, tree, shardings)


def combine_fsdp_grads(grads: Any, shardings: Any, dp: int) -> Any:
    """Turn per-shard backward outputs into the mean-loss gradient.

    Sharded leaves already went through the gather's ``psum_scatter`` —
    they hold this shard's slice of the SUM over shards, so dividing by
    ``dp`` yields the global-mean gradient slice. Replicated leaves hold
    only this shard's contribution and need the usual ``pmean``."""

    def leaf(g, sh):
        if _shard_dim(sh.spec) is None:
            return jax.lax.pmean(g, DATA_AXIS)
        return g / dp

    return jax.tree.map(leaf, grads, shardings)


def clip_by_global_norm_sharded(max_norm: float, param_shardings: Any,
                                axis="data"):
    """``optax.clip_by_global_norm`` for gradients sharded over mesh axes.

    Must run inside the ``shard_map`` step (it psums over ``axis`` — a
    single axis name or a sequence of them). Per axis ``a`` of size ``N_a``:
    a leaf whose PartitionSpec names ``a`` holds a *disjoint slice* of the
    true gradient along it (local squared sums add up to the total); a leaf
    that does NOT name ``a`` is *identical* on all ``N_a`` shards of that
    axis (a psum would count it ``N_a`` times, so its squared sum is
    pre-divided by ``N_a``). The true global squared norm is therefore::

        psum_axes( sum |g_local|^2 / prod_{a not sharding g} N_a )

    This covers every sharded-gradient layout in the framework — ZeRO-3
    FSDP (``axis='data'``; leaves sharded by :func:`fsdp_tree_shardings`),
    Megatron tensor parallelism (``axis='model'``; attention/MLP weight
    grads are local column/row slices), pipeline parallelism
    (``axis='pipe'``; the stacked ``stages`` grads are local stage slices),
    and their composition (``axis=('pipe', 'model')``; stage weight grads
    are sharded over both, stage norms/biases over pipe only, embed/head
    over neither). Gradients over any *other* mesh axis must already be
    reduced (the step pmeans over ``data`` before the optimizer runs).
    Semantics match ``optax.clip_by_global_norm``: updates are scaled by
    ``max_norm / norm`` only when ``norm`` exceeds ``max_norm``.
    """
    axes = (axis,) if isinstance(axis, str) else tuple(axis)

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        sizes = {a: jax.lax.psum(1.0, a) for a in axes}

        def names_axis(spec: P, a: str) -> bool:
            return any(
                s == a or (isinstance(s, tuple) and a in s)
                for s in spec if s is not None
            )

        def leaf_sq(g, sh):
            s = jnp.sum(jnp.square(g.astype(jnp.float32)))
            for a in axes:
                if not names_axis(sh.spec, a):
                    s = s / sizes[a]
            return s

        sq = jax.tree.reduce(
            jnp.add, jax.tree.map(leaf_sq, updates, param_shardings)
        )
        g_norm = jnp.sqrt(jax.lax.psum(sq, axes))
        scale = jnp.where(g_norm < max_norm, 1.0, max_norm / g_norm)
        return jax.tree.map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def clip_by_global_norm_fsdp(max_norm: float, param_shardings: Any):
    """FSDP grad clipping: :func:`clip_by_global_norm_sharded` over ``data``."""
    return clip_by_global_norm_sharded(max_norm, param_shardings, DATA_AXIS)
