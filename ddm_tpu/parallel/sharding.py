"""Parameter/partition-spec rules for data- and tensor-parallel training.

Specs are derived from *path rules*: regexes over the flattened pytree path
of each leaf. Because optax optimizer states (Adam's ``mu``/``nu``) mirror
the parameter tree, the same rules shard params, gradients, and optimizer
moments consistently — one rule table covers the whole TrainState.

Tensor-parallel layout for the DiT backbone (Megatron-style, expressed as
shardings instead of explicit collectives — XLA inserts the allreduces):

  * attention ``qkv``:  column-parallel — fused feature axis sharded over
    ``model``. The qkv layout is ``[q | k | v]`` lane blocks (chosen for the
    fused attention kernel), so a tp split lands mid-block; XLA's SPMD
    partitioner resolves this with an all-gather before the attention body.
    Numerically exact always; for collective-free attention at tp > 1,
    future work can split qkv into three column-parallel projections.
  * attention ``proj``: row-parallel — input axis sharded; XLA allreduces
    the partial outputs (one psum per block).
  * MLP ``ff_in``: column-parallel; ``ff_out``: row-parallel (second psum).
  * Everything else (embeddings, LayerNorms, biases of row-parallel layers,
    the toy MLP) stays replicated.

The reference implements no parallelism of any kind (SURVEY §2); this module
is the capability addition mandated by BASELINE.json's multi-chip config.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = [
    "DIT_TP_RULES",
    "REPLICATED_RULES",
    "spec_for_path",
    "tree_shardings",
    "train_state_shardings",
]

# (path regex, PartitionSpec) — first match wins; no match -> replicated.
# Two attention layouts coexist: the fused [q|k|v] projection (tp=1 model
# tree, used by the jit-SPMD path) and the separate column-parallel q/k/v
# projections the tp>1 model tree uses (shard_map path — whole heads per
# shard, no mid-block all-gather; see models/dit._TPAttention).
DIT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r"attn/qkv/kernel", P(None, MODEL_AXIS)),
    (r"attn/qkv/bias", P(MODEL_AXIS)),
    (r"attn/(q|k|v)/kernel", P(None, MODEL_AXIS)),
    (r"attn/(q|k|v)/bias", P(MODEL_AXIS)),
    (r"attn/proj/kernel", P(MODEL_AXIS, None)),
    (r"attn/proj/bias", P()),
    (r"ff_in/kernel", P(None, MODEL_AXIS)),
    (r"ff_in/bias", P(MODEL_AXIS)),
    (r"ff_out/kernel", P(MODEL_AXIS, None)),
    (r"ff_out/bias", P()),
    # MoE expert parallelism: the leading (num_experts) dim of every
    # expert weight shards over the model axis (E/tp experts per shard,
    # ddm_tpu.models.moe); the router stays replicated (falls through).
    (r"moe/experts_in$", P(MODEL_AXIS)),
    (r"moe/experts_in_bias$", P(MODEL_AXIS)),
    (r"moe/experts_out$", P(MODEL_AXIS)),
    (r"moe/experts_out_bias$", P(MODEL_AXIS)),
)

# Pure data parallelism: every param replicated.
REPLICATED_RULES: Tuple[Tuple[str, P], ...] = ()


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path_str: str, rules: Sequence[Tuple[str, P]]) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path_str):
            return spec
    return P()


def tree_shardings(tree: Any, mesh: Mesh, rules: Sequence[Tuple[str, P]]) -> Any:
    """Map every leaf of ``tree`` to a NamedSharding chosen by path rules.

    Scalars and rank-0 leaves are always replicated (a PartitionSpec longer
    than the rank would be invalid).
    """

    def leaf_sharding(path, leaf):
        spec = spec_for_path(_path_str(path), rules)
        ndim = getattr(leaf, "ndim", 0)
        if len(spec) > ndim:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def train_state_shardings(state: Any, mesh: Mesh,
                          rules: Sequence[Tuple[str, P]] = DIT_TP_RULES) -> Any:
    """Shardings for a whole TrainState (params + opt moments + counters).

    Works because Adam's ``mu``/``nu`` subtrees carry the same param-path
    suffixes as ``params`` itself, so one rule table shards them alike;
    step counters and any rank-0 leaves fall through to replicated.
    """
    return tree_shardings(state, mesh, rules)
