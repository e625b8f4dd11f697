"""Mesh/sharding layer: data- and tensor-parallel training over TPU ICI."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch,
)
from .sharding import (
    DIT_TP_RULES,
    REPLICATED_RULES,
    spec_for_path,
    train_state_shardings,
    tree_shardings,
)
from .data_parallel import make_sharded_train_step, place_train_state
from .pipeline import (
    PIPE_AXIS,
    from_pipeline_params,
    make_pipe_mesh,
    make_pipelined_apply,
    pipeline_tree_shardings,
    to_pipeline_params,
)
from .fsdp import (
    clip_by_global_norm_fsdp,
    clip_by_global_norm_sharded,
    fsdp_spec,
    fsdp_tree_shardings,
    gather_tree,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "replicated",
    "batch_sharding",
    "shard_batch",
    "replicate_tree",
    "DIT_TP_RULES",
    "REPLICATED_RULES",
    "spec_for_path",
    "tree_shardings",
    "train_state_shardings",
    "make_sharded_train_step",
    "place_train_state",
    "fsdp_spec",
    "fsdp_tree_shardings",
    "gather_tree",
    "clip_by_global_norm_fsdp",
    "clip_by_global_norm_sharded",
    "PIPE_AXIS",
    "make_pipe_mesh",
    "to_pipeline_params",
    "from_pipeline_params",
    "pipeline_tree_shardings",
    "make_pipelined_apply",
    "ici",
]

from . import ici  # noqa: E402  (analytic ICI roofline + HLO footprint)
