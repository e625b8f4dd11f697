"""Checkpoint save/load/resume for DDDM train states.

The reference only *saves* checkpoints — ``torch.save({"model": state_dict,
"config": dict})`` at ``/root/reference/dddm/training.py:168`` and
``train_cifar10_dit.py:32-37`` — with no load/resume path anywhere (verified:
no ``torch.load`` in the repo) and no optimizer state. This module keeps the
same payload concept ({model params, config}) with the same artifact naming
scheme (``model.ckpt`` / ``model_epoch{E:03d}.ckpt`` / ``model_final.ckpt``)
and adds what production TPU training needs (a documented improvement over
the reference, per SURVEY §5.4):

  * full :class:`~ddm_tpu.training.TrainState` checkpoints (params +
    optimizer state + step counter) for exact resume,
  * :func:`load_checkpoint` / :func:`restore_train_state` /
    :func:`latest_checkpoint` for ``--resume``.

Format: msgpack via ``flax.serialization`` (framework-neutral bytes; no
pickle execution risk), with the config embedded as JSON.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "load_params",
    "save_train_state",
    "restore_train_state",
    "latest_checkpoint",
]

_MAGIC = b"DDMTPU1\n"


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: jax.device_get(x), tree)


def save_checkpoint(path: str, params: Any, config: Optional[Dict] = None) -> str:
    """Write ``{"params": ..., "config": ...}`` (reference payload parity)."""
    payload = {
        "params": serialization.to_state_dict(_to_host(params)),
        "config_json": json.dumps(config or {}, default=str),
    }
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(data)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Tuple[Any, Dict]:
    """Load params + config saved by :func:`save_checkpoint`."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a ddm_tpu checkpoint")
        payload = serialization.msgpack_restore(f.read())
    return payload["params"], json.loads(payload["config_json"])


def save_train_state(path: str, state: Any, config: Optional[Dict] = None) -> str:
    """Full-state checkpoint (params + opt state + step) for exact resume."""
    payload = {
        "step": int(state.step),
        "params": serialization.to_state_dict(_to_host(state.params)),
        # to_state_dict flattens optax's (named)tuple states into nested
        # dicts, which is what msgpack can carry
        "opt_state": serialization.to_state_dict(_to_host(state.opt_state)),
        "config_json": json.dumps(config or {}, default=str),
    }
    ema = getattr(state, "ema_params", None)
    if ema is not None:
        payload["ema_params"] = serialization.to_state_dict(_to_host(ema))
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(data)
    os.replace(tmp, path)
    return path


def load_params(path: str, ema: bool = False) -> Tuple[Any, Dict]:
    """Load just (params state-dict, config) from ANY ddm_tpu checkpoint —
    both the params-only :func:`save_checkpoint` payload and the full
    :func:`save_train_state` payload carry a ``params`` entry. Used by
    inference-only consumers (``generate.py``) that have no TrainState
    template to restore into; the returned nested plain dict is directly
    consumable by ``model.apply``. ``ema=True`` selects the EMA parameter
    average instead (raises when the checkpoint carries none).

    Pipeline-parallel runs (``--pp``) checkpoint their TrainState in the
    staged ``{'embed', 'stages'}`` layout (the optimizer state mirrors it,
    which is what exact resume needs); inference consumers want the
    canonical ``block_i`` tree, so that layout is detected and re-packed
    here — any ``.ckpt`` loads into the plain model regardless of the
    parallelism that trained it.
    """
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a ddm_tpu checkpoint")
        payload = serialization.msgpack_restore(f.read())
    if ema and "ema_params" not in payload:
        raise ValueError(
            f"{path} carries no EMA parameters (trained without --ema-decay)"
        )
    params = payload["ema_params"] if ema else payload["params"]
    if isinstance(params, dict) and set(params.keys()) == {"embed", "stages"}:
        from ddm_tpu.parallel.pipeline import from_pipeline_params

        params = from_pipeline_params(params)
    return params, json.loads(payload["config_json"])


def restore_train_state(path: str, state: Any) -> Tuple[Any, Dict]:
    """Restore into an already-constructed TrainState template.

    The template (built from the same model/optimizer) provides the pytree
    structure; leaves are replaced by the stored values.
    """
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a ddm_tpu checkpoint")
        payload = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(state.params, payload["params"])
    opt_state = serialization.from_state_dict(state.opt_state, payload["opt_state"])
    new_state = state.replace(
        step=payload["step"], params=params, opt_state=opt_state
    )
    if getattr(state, "ema_params", None) is not None:
        if "ema_params" in payload:
            new_state = new_state.replace(ema_params=serialization.from_state_dict(
                state.ema_params, payload["ema_params"]))
        else:
            # resuming an EMA run from a pre-EMA checkpoint: restart the
            # average from the restored params (the standard cold-start)
            new_state = new_state.replace(
                ema_params=jax.tree.map(lambda p: p, params))
    return new_state, json.loads(payload["config_json"])


def latest_checkpoint(outdir: str, pattern: str = r"model_epoch(\d+)\.ckpt") -> Optional[str]:
    """Find the newest epoch checkpoint in ``outdir`` (None when absent)."""
    best: Tuple[int, Optional[str]] = (-1, None)
    if not os.path.isdir(outdir):
        return None
    rx = re.compile(pattern)
    for name in os.listdir(outdir):
        mobj = rx.fullmatch(name)
        if mobj and int(mobj.group(1)) > best[0]:
            best = (int(mobj.group(1)), os.path.join(outdir, name))
    return best[1]
