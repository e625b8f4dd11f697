"""Device-mesh construction and placement helpers.

The reference has no distributed layer at all (SURVEY §2, parallelism
statement: no torch.distributed / NCCL / process groups anywhere); this
module is the TPU-native capability addition mandated by the north star:
parallelism is expressed as a ``jax.sharding.Mesh`` plus ``NamedSharding``
annotations, and XLA's SPMD partitioner inserts the ICI collectives
(allreduce for data-parallel gradients, allgather/reduce-scatter around
tensor-parallel matmuls). There is no custom transport layer to write —
XLA's collective lowering IS the backend (SURVEY §5.8).

Axis convention (framework-wide):
  * ``"data"``  — data parallelism; the global batch is sharded over it.
  * ``"model"`` — tensor parallelism; attention heads and MLP hidden units
    are sharded over it (see ``ddm_tpu.parallel.sharding``).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "replicated",
    "batch_sharding",
    "shard_batch",
    "replicate_tree",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ``(data, model)`` mesh over the available devices.

    Args:
        dp: data-parallel degree; defaults to ``n_devices // tp``.
        tp: tensor-parallel degree (1 = pure data parallelism).
        devices: explicit device list (defaults to ``jax.devices()``).

    The device order is left as given so on real TPU slices the trailing
    (fastest-varying) ``model`` axis maps to nearest-neighbour ICI links,
    which carry the latency-sensitive tensor-parallel collectives.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        if n % tp != 0:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp * tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding on ``mesh``."""
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


@functools.lru_cache(maxsize=None)
def _replicate_fn(out_sh: NamedSharding):
    """One jitted identity per replicated out-sharding.

    jax.jit caches by function identity, so building a fresh
    ``jit(lambda x: x)`` per leaf per call would retrace/recompile one
    program for every leaf on every ``evaluate()``; caching on the
    (hashable) NamedSharding makes repeated evals hit the jit cache —
    one compile per (mesh, shape-family) for the whole session.
    """
    return jax.jit(lambda x: x, out_shardings=out_sh)


def replicate_tree(tree):
    """All-gather every sharded leaf of ``tree`` to a fully-replicated array.

    Used before host-local sampling when params are tensor-parallel-sharded
    (Megatron layout): each leaf that is not already fully replicated is
    passed through a cached jitted identity with a replicated
    ``out_sharding`` on its own mesh, which lowers to one XLA all-gather
    over ICI. Leaves that are already replicated (or are not
    ``jax.Array``/``NamedSharding``) pass through untouched. Collective:
    every process of the mesh must call this at the same point (it is a
    global program), exactly like the train step itself.
    """

    def rep(a):
        if not isinstance(a, jax.Array):
            return a
        sh = getattr(a, "sharding", None)
        if not isinstance(sh, NamedSharding) or sh.is_fully_replicated:
            return a
        return _replicate_fn(NamedSharding(sh.mesh, P()))(a)

    return jax.tree.map(rep, tree)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on the mesh, sharded over the data axis.

    Single-process: ``batch`` is the global batch, placed with a
    ``device_put``. Multi-process (pods): ``batch`` is this process's LOCAL
    slice (see ``ArrayLoader``'s process sharding) and the global array is
    assembled with ``jax.make_array_from_process_local_data``.
    """
    import numpy as np

    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh, np.ndim(batch)), np.asarray(batch)
        )
    import jax.numpy as jnp

    arr = jnp.asarray(batch)
    return jax.device_put(arr, batch_sharding(mesh, arr.ndim))
