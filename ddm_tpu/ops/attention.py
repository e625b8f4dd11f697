"""Fused multi-head attention Pallas kernel for short sequences.

The DiT workload attends over N = 64 patch tokens per image with Dh = 64
head dims — far below the MXU's native 128x128 tile, and XLA's batched-
matmul lowering leaves ~99% of the MXU idle while round-tripping the
(B, H, N, N) float32 score tensor through HBM (measured: attention was HALF
of the DiT train step; see git history). The stock
``jax.experimental.pallas.ops.tpu.flash_attention`` cannot run these shapes
either (its backward assumes >= 128 key blocks), and Mosaic's *batched* 3-D
``dot_general`` lowering is pathologically slow (measured ~40x worse than
XLA). Hence this kernel, engineered around three facts established by
measurement on v5e:

  1. Only strictly 2-D matmuls are fast in Mosaic — never batched dots.
  2. The whole (block of images) x (N tokens) x (all heads) working set fits
     VMEM (16 MB), so scores NEVER touch HBM and no online softmax is
     needed.
  3. Packing ``g`` images into one (g*N, g*N) masked matmul turns 64-wide
     dots into MXU-native >=256-wide dots; the g x FLOP waste is irrelevant
     because attention FLOPs are ~3% of the model.

Layout contract: q, k, v are (B, N, H*Dh) with heads contiguous in the
feature (lane) dimension — exactly the natural reshape of a fused qkv
projection, so the model pays ZERO transposes around the kernel.

The backward pass is a second Pallas kernel (same packing) via
``jax.custom_vjp``: it recomputes P from q, k (cheap at these sizes) and
forms dq, dk, dv with six 2-D matmuls per (head, pack) — the standard
softmax-jacobian identity dS = P * (dP - rowsum(P dP)).

Reference behavioural parity: plain bidirectional softmax attention with
scale = Dh**-0.5 (``/root/reference/dddm/model.py:132-153``); no masking,
no dropout. ``flash_attention`` (the (B, N, H, Dh) wrapper) and
``fused_attention`` fall back to an XLA merged-batch implementation for
configurations the kernel does not support.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_attention", "flash_attention", "attention_reference"]


def _choose_blocks(B: int, N: int, D: int, dtype_bytes: int = 2):
    """Pick (bi images per grid step, g images packed per matmul).

    Constraints: g*N should be >= 256 for MXU efficiency but small enough
    that the (g*N)^2 fp32 score tile stays modest; bi must divide B and be a
    multiple of g; the ~4 * bi*N*D buffers must fit VMEM with double
    buffering.
    """
    g = max(1, min(256 // N, 8))
    while B % g != 0:
        g //= 2
    bi = g
    # grow bi while staying under ~6 MB of block buffers (leaves room for
    # double buffering + scores in 16 MB VMEM)
    while (
        bi * 2 <= 64
        and B % (bi * 2) == 0
        and 4 * (bi * 2) * N * D * dtype_bytes < 6 * 1024 * 1024
    ):
        bi *= 2
    return bi, g


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, H: int, g: int,
                scale: float):
    bi, N, D = q_ref.shape
    Dh = D // H
    P = g * N
    for p in range(bi // g):
        rows = slice(p * g, (p + 1) * g)
        for h in range(H):
            cols = slice(h * Dh, (h + 1) * Dh)
            qh = q_ref[rows, :, cols].reshape(P, Dh)
            kh = k_ref[rows, :, cols].reshape(P, Dh)
            vh = v_ref[rows, :, cols].reshape(P, Dh)
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale + mask_ref[:]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
            o = jnp.dot(probs, vh, preferred_element_type=jnp.float32)
            o_ref[rows, :, cols] = o.reshape(g, N, Dh).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, H: int, g: int, scale: float):
    bi, N, D = q_ref.shape
    Dh = D // H
    P = g * N
    for p in range(bi // g):
        rows = slice(p * g, (p + 1) * g)
        for h in range(H):
            cols = slice(h * Dh, (h + 1) * Dh)
            qh = q_ref[rows, :, cols].reshape(P, Dh)
            kh = k_ref[rows, :, cols].reshape(P, Dh)
            vh = v_ref[rows, :, cols].reshape(P, Dh)
            doh = do_ref[rows, :, cols].reshape(P, Dh).astype(jnp.float32)

            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale + mask_ref[:]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)  # fp32 (P, P)

            pb = probs.astype(q_ref.dtype)
            dv = jax.lax.dot_general(
                pb, doh.astype(q_ref.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # P^T @ dO -> (P, Dh)
            dp = jax.lax.dot_general(
                doh.astype(q_ref.dtype), vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # dO @ V^T -> (P, P)
            ds = probs * (dp - jnp.sum(probs * dp, axis=-1, keepdims=True))
            ds = (ds * scale).astype(q_ref.dtype)
            dq = jnp.dot(ds, kh, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # dS^T @ Q

            dq_ref[rows, :, cols] = dq.reshape(g, N, Dh).astype(dq_ref.dtype)
            dk_ref[rows, :, cols] = dk.reshape(g, N, Dh).astype(dk_ref.dtype)
            dv_ref[rows, :, cols] = dv.reshape(g, N, Dh).astype(dv_ref.dtype)


def _block_mask(g: int, N: int) -> jnp.ndarray:
    """(g*N, g*N) additive mask: 0 on per-image diagonal blocks, -1e30 off."""
    eye = jnp.kron(jnp.eye(g, dtype=jnp.float32), jnp.ones((N, N), jnp.float32))
    return (1.0 - eye) * (-1e30)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_attention(q, k, v, H: int, scale: float):
    return _fused_fwd_call(q, k, v, H, scale)


def _fused_fwd_call(q, k, v, H: int, scale: float):
    B, N, D = q.shape
    bi, g = _choose_blocks(B, N, D)
    mask = _block_mask(g, N)
    spec = pl.BlockSpec((bi, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((g * N, g * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, g=g, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, N, D), q.dtype),
        grid=(B // bi,),
        in_specs=[spec, spec, spec, mspec],
        out_specs=spec,
    )(q, k, v, mask)


def _fused_fwd(q, k, v, H: int, scale: float):
    return _fused_fwd_call(q, k, v, H, scale), (q, k, v)


def _fused_bwd(H: int, scale: float, res, do):
    q, k, v = res
    B, N, D = q.shape
    bi, g = _choose_blocks(B, N, D)
    mask = _block_mask(g, N)
    spec = pl.BlockSpec((bi, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((g * N, g * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((B, N, D), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, g=g, scale=scale),
        out_shape=(shp, shp, shp),
        grid=(B // bi,),
        in_specs=[spec, spec, spec, mspec, spec],
        out_specs=(spec, spec, spec),
    )(q, k, v, mask, do)
    return dq, dk, dv


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


def attention_reference(q, k, v, H: int, scale: Optional[float] = None):
    """XLA merged-batch attention on the same (B, N, H*Dh) layout.

    Used as the numerical oracle in tests and as the fallback when the
    fused kernel does not support a configuration.
    """
    B, N, D = q.shape
    Dh = D // H
    if scale is None:
        scale = Dh**-0.5
    z = lambda a: a.reshape(B, N, H, Dh).transpose(0, 2, 1, 3).reshape(B * H, N, Dh)
    s = jnp.einsum("znd,zmd->znm", z(q), z(k), preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1).astype(q.dtype)
    o = jnp.einsum("znm,zmd->znd", p, z(v))
    return o.reshape(B, H, N, Dh).transpose(0, 2, 1, 3).reshape(B, N, D)


def fused_attention(q, k, v, H: int, scale: Optional[float] = None):
    """Multi-head attention over (B, N, H*Dh) inputs; heads lane-contiguous.

    Dispatches to the Pallas kernel when supported (TPU backend, modest N,
    aligned sizes), else to the XLA fallback. Differentiable either way.
    """
    B, N, D = q.shape
    Dh = D // H
    if scale is None:
        scale = Dh**-0.5
    supported = (
        jax.default_backend() == "tpu"
        and N % 8 == 0
        and N <= 512
        and Dh % 8 == 0
        and D % 128 == 0
        and B % _choose_blocks(B, N, D)[0] == 0
    )
    if not supported:
        return attention_reference(q, k, v, H, scale)
    return _fused_attention(q, k, v, H, scale)


def flash_attention(q, k, v, scale: Optional[float] = None):
    """(B, N, H, Dh) wrapper honouring the DiT model's internal layout."""
    B, N, H, Dh = q.shape
    r = lambda a: a.reshape(B, N, H * Dh)
    out = fused_attention(r(q), r(k), r(v), H, scale)
    return out.reshape(B, N, H, Dh)
