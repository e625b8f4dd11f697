"""Inception-v3 pool3 feature extractor in Flax (for FID).

Re-implementation of the reference's ``InceptionEmbedding``
(``/root/reference/dddm/metrics.py:23-48``): torchvision's ``inception_v3``
with ``transform_input=False, aux_logits(frozen eval) -> fc=Identity``,
returning the 2048-d pool3 activations, with the exact input protocol —
clamp to [-1, 1], map to [0, 1], bilinear-resize to 299x299
(``align_corners=False``; jax.image half-pixel semantics match), then
ImageNet-normalize.

Architecture mirrors torchvision's graph module-for-module with IDENTICAL
module names (``Conv2d_1a_3x3`` ... ``Mixed_7c``), so converting a torch
``state_dict`` is a mechanical key rewrite: see
:func:`convert_torch_inception_state_dict`. BatchNorm runs in inference
mode from stored running statistics (eps = 0.001, matching torchvision).

Fidelity anchors (``tests/test_inception_fidelity.py``): the tower, the
converter, and the full input protocol are pinned against a torch oracle
with torchvision-identical state_dict keys — committed golden pool3
vectors + intermediate taps (max |err| < 2e-3 fp32), live torch
cross-checks, and bilinear-resize parity with
``F.interpolate(align_corners=False)`` (hence ``antialias=False`` below).

Weights: this environment is air-gapped, so IMAGENET1K_V1 weights cannot be
downloaded here. :class:`InceptionEmbedding` looks for a torch checkpoint at
``$DDM_TPU_INCEPTION_WEIGHTS`` or ``~/.cache/ddm_tpu/inception_v3.pth``
(a plain ``torch.save``d state_dict); without one it falls back to
deterministic random initialisation with a loud warning — the FID *pipeline*
stays fully functional (a random-feature Frechet distance is still a valid
two-sample statistic for relative comparisons within a run) but values are
not comparable to torchvision-FID numbers.

NHWC layout throughout (TPU-preferred); the callable accepts NCHW or NHWC.
"""

from __future__ import annotations

import os
import warnings
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "InceptionV3",
    "InceptionEmbedding",
    "convert_torch_inception_state_dict",
    "preprocess_for_inception",
]

_BN_EPS = 1e-3
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class BasicConv2d(nn.Module):
    """Conv(bias=False) + inference BatchNorm(eps=1e-3) + ReLU."""

    out_channels: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.out_channels,
            self.kernel,
            strides=self.stride,
            padding=(
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1]),
            ),
            use_bias=False,
            dtype=self.dtype,
            # fp32 mode must mean fp32 numerics on TPU too: the MXU's
            # default precision lowers fp32 convs to bf16 passes (measured
            # 0.038 max pool3 error vs the torch goldens); HIGHEST restores
            # <2e-3. Irrelevant under explicit bfloat16 compute.
            precision=(
                jax.lax.Precision.HIGHEST
                if self.dtype == jnp.float32
                else None
            ),
            name="conv",
        )(x)
        c = self.out_channels
        scale = self.param("bn_scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bn_bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("bn_mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("bn_var", nn.initializers.ones, (c,), jnp.float32)
        inv = jax.lax.rsqrt(var + _BN_EPS) * scale
        x = x.astype(jnp.float32) * inv + (bias - mean * inv)
        return nn.relu(x).astype(self.dtype)


def _avg_pool_3x3_same(x: jnp.ndarray) -> jnp.ndarray:
    """torch avg_pool2d(3, stride=1, padding=1): divisor counts padding."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    ) / 9.0


def _max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=d, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_same(x)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), stride=(2, 2), dtype=d, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=(2, 2), dtype=d, name="branch3x3dbl_3")(bd)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_same(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=(2, 2), dtype=d, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=(2, 2), dtype=d, name="branch7x7x3_4")(b7)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _avg_pool_3x3_same(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Feature tower (no fc): NHWC [B, 299, 299, 3] -> [B, 2048] pool3."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        x = BasicConv2d(32, (3, 3), stride=(2, 2), dtype=d, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=d, name="Conv2d_2b_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x)
        x = InceptionB(dtype=d, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x)
        x = InceptionD(dtype=d, name="Mixed_7a")(x)
        x = InceptionE(dtype=d, name="Mixed_7b")(x)
        x = InceptionE(dtype=d, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # global avg pool


def preprocess_for_inception(images: jnp.ndarray, resize: bool = True) -> jnp.ndarray:
    """Reference input protocol (``metrics.py:40-48``), NHWC output.

    clamp [-1,1] -> [0,1] -> bilinear 299x299 (half-pixel centers ==
    torch ``align_corners=False``) -> ImageNet-normalize.
    """
    if images.ndim != 4:
        raise ValueError("Expecting images of shape [B, 3, H, W] or [B, H, W, 3]")
    if images.shape[1] == 3 and images.shape[-1] != 3:
        images = images.transpose(0, 2, 3, 1)
    if images.shape[-1] != 3:
        raise ValueError("Expecting 3-channel images")
    x = jnp.clip(images.astype(jnp.float32), -1.0, 1.0)
    x = (x + 1.0) / 2.0
    if resize:
        B = x.shape[0]
        # antialias=False matches torch F.interpolate exactly in BOTH
        # directions (torch never antialiases here); with the default
        # antialias=True, jax would low-pass when downscaling >299 inputs.
        x = jax.image.resize(x, (B, 299, 299, 3), method="bilinear",
                             antialias=False)
    mean = jnp.asarray(_IMAGENET_MEAN)
    std = jnp.asarray(_IMAGENET_STD)
    return (x - mean) / std


def _default_weight_paths():
    env = os.environ.get("DDM_TPU_INCEPTION_WEIGHTS")
    cands = [env] if env else []
    cands.append(os.path.expanduser("~/.cache/ddm_tpu/inception_v3.pth"))
    return [c for c in cands if c]


def convert_torch_inception_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a torchvision ``inception_v3`` state_dict into Flax params.

    Handles the key scheme ``<Module>.<branch>.conv.weight`` /
    ``...bn.{weight,bias,running_mean,running_var}``; ``AuxLogits.*`` and
    ``fc.*`` are ignored (the embedder has no classifier head, matching the
    reference's ``fc = Identity``). Conv weights transpose
    (out, in, kh, kw) -> (kh, kw, in, out).
    """

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params: Dict[str, Any] = {}
    for key, val in sd.items():
        if key.startswith(("AuxLogits", "fc.")):
            continue
        parts = key.split(".")
        # e.g. ["Mixed_5b", "branch1x1", "conv", "weight"]
        #      ["Conv2d_1a_3x3", "bn", "running_mean"]
        *scope, leaf_owner, leaf = parts
        node = params
        for s in scope:
            node = node.setdefault(s, {})
        arr = to_np(val)
        if leaf_owner == "conv" and leaf == "weight":
            node.setdefault("conv", {})["kernel"] = arr.transpose(2, 3, 1, 0)
        elif leaf_owner == "bn":
            name = {
                "weight": "bn_scale",
                "bias": "bn_bias",
                "running_mean": "bn_mean",
                "running_var": "bn_var",
            }.get(leaf)
            if name is not None:
                node[name] = arr
        elif leaf == "num_batches_tracked" or leaf_owner == "num_batches_tracked":
            continue
    return {"params": params}


class InceptionEmbedding:
    """Callable ``images in [-1,1] -> (B, 2048) pool3 features`` (jitted).

    Reference parity: ``/root/reference/dddm/metrics.py:23-48``. Accepts
    NCHW or NHWC. Loads converted torchvision weights when available (see
    module docstring); otherwise warns and uses deterministic random
    initialisation.
    """

    def __init__(
        self,
        weights_path: Optional[str] = None,
        resize_input: bool = True,
        dtype: jnp.dtype = jnp.float32,
    ) -> None:
        # float32 default: the reference computes FID features in fp32 and
        # the golden-vector tests pin the tower at fp32 accuracy; pass
        # bfloat16 explicitly to trade ~1e-2 feature error for speed.
        self.model = InceptionV3(dtype=dtype)
        self.resize_input = resize_input
        self.params = None
        self.pretrained = False

        paths = [weights_path] if weights_path else _default_weight_paths()
        for path in paths:
            if path and os.path.exists(path):
                try:
                    import torch

                    sd = torch.load(path, map_location="cpu", weights_only=True)
                    if hasattr(sd, "state_dict"):
                        sd = sd.state_dict()
                    self.params = convert_torch_inception_state_dict(sd)
                    self.pretrained = True
                    break
                except Exception as exc:  # noqa: BLE001
                    warnings.warn(f"Failed to load Inception weights from {path}: {exc}")
        if self.params is None:
            warnings.warn(
                "No Inception-v3 weights found (set DDM_TPU_INCEPTION_WEIGHTS or "
                "place a torchvision state_dict at ~/.cache/ddm_tpu/inception_v3.pth). "
                "Falling back to RANDOM features: FID values will be internally "
                "consistent but NOT comparable to torchvision-FID."
            )
            dummy = jnp.zeros((1, 299, 299, 3), jnp.float32)
            # jit the init: unjitted flax init evaluates hundreds of ops
            # eagerly, which is minutes through remote-TPU relays
            self.params = jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy)

        self._apply = jax.jit(
            partial(self._forward), static_argnames=("resize",)
        )

    def _forward(self, params, images, resize: bool):
        x = preprocess_for_inception(images, resize=resize)
        return self.model.apply(params, x)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        return self._apply(self.params, jnp.asarray(images), resize=self.resize_input)
