"""Convert reference (PyTorch) checkpoints into ddm_tpu param trees.

The reference saves ``torch.save({"model": state_dict, "config": ...})``
(``/root/reference/dddm/training.py:168``, ``train_cifar10_dit.py:32-37``)
and its CLI arg names (embed_dim / depth / heads / time_embed / ...) are the
same names :mod:`ddm_tpu.models.factory` consumes — so a converted
checkpoint drops straight into ``generate.py`` / ``--resume``-style loading.
This module is the migration path for existing reference users: their
trained ``model.pt`` / ``model_final.pt`` files run under this framework
without retraining.

Weight-layout mapping (validated against a functional torch oracle in
``tests/test_convert.py``, forward parity ~1e-5):

  * ``nn.Linear`` stores ``(out, in)``; flax ``Dense`` kernels are
    ``(in, out)`` -> transpose.
  * The patch embed is a ``Conv2d(k=stride=p)`` over NCHW input; ours is a
    ``Dense`` over :func:`~ddm_tpu.models.dit.patchify_images` tokens whose
    feature order is ``(ph, pw, c)`` (channel fastest). The conv weight
    ``(D, C, p, p)`` therefore permutes to ``(ph, pw, c) x D``.
  * The fused qkv Linear's output rows are ordered ``(3, H, Dh)`` (the
    reference reshapes to ``(B, N, 3, H, Dh)``); our fused qkv Dense emits
    ``[q | k | v]`` lane blocks with heads contiguous inside each — the
    SAME order, so qkv converts by plain transpose.
  * The unembed Linear's output features are ordered ``(c, ph, pw)`` (the
    reference views ``(B, h, h, C, p, p)``); our unembed emits ``(ph, pw,
    c)`` for the inverse patchify -> permute rows.
  * ``nn.LayerNorm`` weight/bias -> flax scale/bias. (torch LN uses
    eps=1e-5 vs flax's 1e-6 — a ~1e-6 relative activation difference,
    far below training noise; we keep each framework's native eps.)

Nothing here imports torch: the converters take a mapping of numpy arrays
(call :func:`state_dict_to_numpy` on a loaded torch state_dict first, or
use :func:`load_reference_checkpoint` which lazy-imports torch only to
deserialize the ``.pt`` file).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

__all__ = [
    "state_dict_to_numpy",
    "dit_params_from_reference",
    "mlp_params_from_reference",
    "load_reference_checkpoint",
]


def state_dict_to_numpy(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Torch (or any tensor-like) state_dict -> plain fp32 numpy mapping."""
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v, dtype=np.float32)
    return out


def _dense(sd: Mapping[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}


def _ln(sd: Mapping[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def dit_params_from_reference(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference ``DDDMDiT`` state_dict -> ddm_tpu ``DDDMDiT`` variables.

    Produces the canonical (tp=1, fused-qkv) param tree; shapes are taken
    from the state_dict itself so any reference model size converts.
    """
    sd = state_dict_to_numpy(sd)

    w = sd["patch_embed.proj.weight"]  # (D, C, p, p)
    d, c_in, p, _ = w.shape
    patch_proj = {
        # conv taps (c, ph, pw) -> our token feature order (ph, pw, c)
        "kernel": w.transpose(2, 3, 1, 0).reshape(p * p * c_in, d),
        "bias": sd["patch_embed.proj.bias"],
    }

    wu = sd["unembed.proj.weight"]  # (C_out*p*p, D) with rows (c, ph, pw)
    c_out = wu.shape[0] // (p * p)
    unembed = {
        "kernel": wu.reshape(c_out, p, p, d).transpose(3, 1, 2, 0).reshape(
            d, p * p * c_out
        ),
        "bias": sd["unembed.proj.bias"].reshape(c_out, p, p)
        .transpose(1, 2, 0).reshape(-1),
    }

    params: Dict[str, Any] = {
        "patch_proj": patch_proj,
        "pos_embed": sd["pos_embed"],
        "time_mlp_0": _dense(sd, "time_mlp.0"),
        "time_mlp_1": _dense(sd, "time_mlp.2"),
        "final_norm": _ln(sd, "norm"),
        "unembed": unembed,
    }

    depth = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    for i in range(depth):
        b = f"blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": {
                "qkv": _dense(sd, f"{b}.attn.qkv"),
                "proj": _dense(sd, f"{b}.attn.proj"),
            },
            "norm2": _ln(sd, f"{b}.norm2"),
            "ff_in": _dense(sd, f"{b}.ff.net.0"),
            "ff_out": _dense(sd, f"{b}.ff.net.2"),
        }
    return {"params": params}


def mlp_params_from_reference(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference ``DDDMMLP`` state_dict -> ddm_tpu ``DDDMMLP`` variables.

    The reference's fixed Fourier frequencies (``tfeat.freq``) are
    recomputed, not stored, on our side; they are asserted equal here so a
    checkpoint with customised frequencies fails loudly instead of
    sampling from the wrong time parameterisation.
    """
    sd = state_dict_to_numpy(sd)
    freq = sd.get("tfeat.freq")
    if freq is not None:
        n = freq.shape[0]
        want = np.linspace(1.0, float(n), n, dtype=np.float32)
        if not np.allclose(freq, want, rtol=1e-6, atol=1e-6):
            raise ValueError(
                "checkpoint's tfeat.freq differs from linspace(1, n, n); "
                "ddm_tpu's DDDMMLP recomputes the reference frequencies "
                "and cannot represent custom ones"
            )
    params = {
        f"Dense_{i}": _dense(sd, f"net.{2 * i}") for i in range(5)
    }
    return {"params": params}


def load_reference_checkpoint(
    path: str, allow_pickle: bool = False
) -> Tuple[Dict[str, Any], Dict]:
    """Load a reference ``.pt`` checkpoint -> ``(variables, config)``.

    Accepts both reference payload shapes — ``{"model": state_dict,
    "config": dict-or-dataclass}`` and a bare state_dict — and detects the
    architecture from the keys (``patch_embed.*`` -> DiT, ``net.*`` ->
    toy MLP). The config comes back as a plain dict whose keys already
    match :mod:`ddm_tpu.models.factory` expectations.

    Deserialisation is ``weights_only=True`` by default (tensors + plain
    containers only — covers the CIFAR path, whose config is
    ``vars(args)``). The toy path embeds a ``TrainConfig`` *object*, which
    needs full pickle; that executes arbitrary code from the file, so it
    requires an explicit ``allow_pickle=True`` opt-in for checkpoints you
    trust.
    """
    import torch  # lazy: only the .pt deserialisation needs it

    try:
        payload = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:  # noqa: BLE001 - torch raises various pickle errors
        if not allow_pickle:
            raise ValueError(
                f"{path} needs full pickle deserialisation (e.g. the toy "
                "path's embedded TrainConfig object). Pickle executes "
                "arbitrary code from the file - pass allow_pickle=True "
                "(CLI: --allow-pickle) ONLY for checkpoints you trust."
            ) from e
        payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model" in payload:
        sd, config = payload["model"], payload.get("config", {})
    else:
        sd, config = payload, {}
    if not isinstance(config, dict):  # toy path stores a TrainConfig-like
        config = {
            k: v for k, v in vars(config).items() if not k.startswith("_")
        }
    keys = list(sd.keys())
    if any(k.startswith("patch_embed.") for k in keys):
        return dit_params_from_reference(sd), dict(config)
    if any(k.startswith("net.") for k in keys):
        return mlp_params_from_reference(sd), dict(config)
    raise ValueError(
        f"unrecognised reference state_dict (keys like {keys[:3]}); "
        "expected DDDMDiT (patch_embed.*) or DDDMMLP (net.*)"
    )
