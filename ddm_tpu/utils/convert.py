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

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

__all__ = [
    "state_dict_to_numpy",
    "dit_params_from_reference",
    "mlp_params_from_reference",
    "load_reference_checkpoint",
    "reference_state_dict_from_dit",
    "reference_state_dict_from_mlp",
    "save_reference_checkpoint",
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


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def reference_state_dict_from_dit(
    variables: Mapping[str, Any],
    patch_size: int,
    in_channels: int = 6,
    out_channels: int = 3,
) -> Dict[str, np.ndarray]:
    """ddm_tpu ``DDDMDiT`` variables -> reference state_dict (numpy).

    Exact inverse of :func:`dit_params_from_reference` (round-trip is
    bitwise; tested), so runs trained here can be evaluated or resumed
    under the reference implementation. ``patch_size``/channel counts are
    explicit because the flattened ``(p*p*C, D)`` patch kernel does not
    determine ``p`` and ``C`` by shape alone. The canonical tp>1 tree's
    separate column-parallel q/k/v projections are re-fused into the
    reference's single qkv Linear (identical ``(3, H, Dh)`` row order).
    """
    p = variables["params"]
    ps, ci, co = patch_size, in_channels, out_channels
    d = _np(p["patch_proj"]["kernel"]).shape[-1]

    sd: Dict[str, np.ndarray] = {
        # our token feature order (ph, pw, c) -> conv taps (c, ph, pw)
        "patch_embed.proj.weight": _np(p["patch_proj"]["kernel"])
        .reshape(ps, ps, ci, d).transpose(3, 2, 0, 1),
        "patch_embed.proj.bias": _np(p["patch_proj"]["bias"]),
        "pos_embed": _np(p["pos_embed"]),
        "time_mlp.0.weight": _np(p["time_mlp_0"]["kernel"]).T,
        "time_mlp.0.bias": _np(p["time_mlp_0"]["bias"]),
        "time_mlp.2.weight": _np(p["time_mlp_1"]["kernel"]).T,
        "time_mlp.2.bias": _np(p["time_mlp_1"]["bias"]),
        "norm.weight": _np(p["final_norm"]["scale"]),
        "norm.bias": _np(p["final_norm"]["bias"]),
        "unembed.proj.weight": _np(p["unembed"]["kernel"])
        .reshape(d, ps, ps, co).transpose(3, 1, 2, 0).reshape(co * ps * ps, d),
        "unembed.proj.bias": _np(p["unembed"]["bias"])
        .reshape(ps, ps, co).transpose(2, 0, 1).reshape(-1),
    }

    i = 0
    while f"block_{i}" in p:
        b, rb = p[f"block_{i}"], f"blocks.{i}"
        attn = b["attn"]
        if "qkv" in attn:
            wqkv = _np(attn["qkv"]["kernel"]).T
            bqkv = _np(attn["qkv"]["bias"])
        else:  # tp>1 canonical tree: separate column-parallel q/k/v
            wqkv = np.concatenate(
                [_np(attn[k]["kernel"]).T for k in ("q", "k", "v")], axis=0
            )
            bqkv = np.concatenate(
                [_np(attn[k]["bias"]) for k in ("q", "k", "v")], axis=0
            )
        sd.update({
            f"{rb}.norm1.weight": _np(b["norm1"]["scale"]),
            f"{rb}.norm1.bias": _np(b["norm1"]["bias"]),
            f"{rb}.attn.qkv.weight": wqkv,
            f"{rb}.attn.qkv.bias": bqkv,
            f"{rb}.attn.proj.weight": _np(attn["proj"]["kernel"]).T,
            f"{rb}.attn.proj.bias": _np(attn["proj"]["bias"]),
            f"{rb}.norm2.weight": _np(b["norm2"]["scale"]),
            f"{rb}.norm2.bias": _np(b["norm2"]["bias"]),
            f"{rb}.ff.net.0.weight": _np(b["ff_in"]["kernel"]).T,
            f"{rb}.ff.net.0.bias": _np(b["ff_in"]["bias"]),
            f"{rb}.ff.net.2.weight": _np(b["ff_out"]["kernel"]).T,
            f"{rb}.ff.net.2.bias": _np(b["ff_out"]["bias"]),
        })
        i += 1
    return sd


def reference_state_dict_from_mlp(
    variables: Mapping[str, Any], time_dim: int = 32
) -> Dict[str, np.ndarray]:
    """ddm_tpu ``DDDMMLP`` variables -> reference state_dict (numpy)."""
    p = variables["params"]
    n = time_dim // 2
    sd: Dict[str, np.ndarray] = {
        "tfeat.freq": np.linspace(1.0, float(n), n, dtype=np.float32)
    }
    for i in range(5):
        sd[f"net.{2 * i}.weight"] = _np(p[f"Dense_{i}"]["kernel"]).T
        sd[f"net.{2 * i}.bias"] = _np(p[f"Dense_{i}"]["bias"])
    return sd


def save_reference_checkpoint(
    path: str, variables: Mapping[str, Any], config: Optional[Dict] = None
) -> str:
    """Write a reference-format ``torch.save({"model", "config"})`` .pt.

    Architecture is detected from the param tree; DiT needs ``patch_size``
    (and non-RGB runs ``in/out_channels``) present in ``config`` — the
    train CLI's saved config always carries them.
    """
    import torch  # lazy

    config = dict(config or {})
    p = variables["params"]
    if "patch_proj" in p:
        sd = reference_state_dict_from_dit(
            variables,
            patch_size=int(config.get("patch_size", 4)),
            in_channels=int(config.get("in_channels", 6)),
            out_channels=int(config.get("out_channels", 3)),
        )
    else:
        sd = reference_state_dict_from_mlp(
            variables, time_dim=int(config.get("time_embed", 32))
        )
    payload = {
        "model": {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in sd.items()},
        "config": config,
    }
    torch.save(payload, path)
    return path
