"""Fused generalized energy-score Pallas kernel (north-star item).

Computes the confinement and interaction terms of the conditional
generalized energy score (paper eq. (12)) for image-sized data WITHOUT
materialising the ``(B, m, m, D)`` pairwise-difference tensor the direct
jnp formulation needs (~200 MB for the CIFAR config, several HBM round
trips in fwd+bwd): each grid step streams a block of ``(bb, m, D)``
predictions into VMEM, forms all m + m(m-1)/2 difference rows in registers,
reduces them, and accumulates two scalars across the sequential TPU grid.

Numerical contract matches ``ddm_tpu.ops.losses.generalized_energy_terms``
exactly: direct differences (the Gram expansion provably diverges training
at fractional beta — see losses.py), fp32 accumulation, the reference's
1e-12 stabiliser inside the fractional power, off-diagonal pair mean.

The backward pass is a second kernel via ``jax.custom_vjp`` (recomputes the
per-pair distances; emits dx0hats and dx0 blocks):

    d/dx_i ||x_i - y||^beta-ish term: w = (beta/2) (d2+eps)^(beta/2-1),
    grad = 2 w (x_i - y) — applied with the caller's upstream scalars folded
    into per-term normalisations.

``fused_energy_terms`` falls back to the jnp implementation off-TPU or for
unsupported shapes (e.g. the 2-D toy problem, where fusion is pointless).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_config import interpret_mode, kernels_enabled


def _pallas_call(*args, **kwargs):
    """pallas_call honouring the DDM_TPU_PALLAS_INTERPRET test knob."""
    return pl.pallas_call(*args, interpret=interpret_mode(), **kwargs)

from .losses import generalized_energy_terms as _jnp_energy_terms

__all__ = ["fused_energy_terms"]

_EPS = 1e-12


def _pow_beta(d2: jnp.ndarray, beta: float) -> jnp.ndarray:
    if beta == 2.0:
        return d2
    return jnp.power(d2 + _EPS, beta / 2.0)


def _dpow_beta(d2: jnp.ndarray, beta: float) -> jnp.ndarray:
    """d/d(d2) of the powered distance."""
    if beta == 2.0:
        return jnp.ones_like(d2)
    return (beta / 2.0) * jnp.power(d2 + _EPS, beta / 2.0 - 1.0)


def _choose_bb(B: int, m: int, D: int) -> int:
    """Image-block size: must divide B and satisfy the TPU sublane rule
    (second-to-last block dim divisible by 8, or equal to the full axis —
    the (bb, D) x0 block makes bb the sublane dim)."""
    bb = 8
    while B % bb != 0 and bb > 1:
        bb //= 2
    return max(bb, 1)


def _kernel_supported(B: int, m: int, D: int) -> bool:
    bb = _choose_bb(B, m, D)
    sublane_ok = bb % 8 == 0 or bb == B
    # (bb, m, D) fp32 blocks (input + grads in bwd) must stay modest in VMEM
    vmem_ok = bb * m * D * 4 <= 4 * 1024 * 1024
    # the kernel Python-unrolls all m(m-1)/2 interaction pairs: 28 dot-
    # reduces at m=8 is fine, but m=32 would unroll 496 (BASELINE.json's
    # m-sweep point) — route large m to the jnp path, whose anchor-row-
    # streamed interaction (losses._interaction_mean_chunked) keeps memory
    # O(B*m*D) at image scale instead of materialising (B, m, m, D)
    m_ok = 2 <= m <= 16
    return B % bb == 0 and sublane_ok and vmem_ok and m_ok and D % 128 == 0


def _fwd_kernel(xh_ref, x0_ref, conf_ref, inter_ref, *, m: int, beta: float):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        conf_ref[0, 0] = 0.0
        inter_ref[0, 0] = 0.0

    conf_acc = jnp.float32(0.0)
    inter_acc = jnp.float32(0.0)
    x0 = x0_ref[:].astype(jnp.float32)  # (bb, D)
    for i in range(m):
        diff = xh_ref[:, i, :].astype(jnp.float32) - x0
        d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)  # (bb, 1)
        conf_acc += jnp.sum(_pow_beta(d2, beta))
    for i in range(m):
        xi = xh_ref[:, i, :].astype(jnp.float32)
        for j in range(i + 1, m):
            diff = xi - xh_ref[:, j, :].astype(jnp.float32)
            d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)
            inter_acc += 2.0 * jnp.sum(_pow_beta(d2, beta))  # (i,j) and (j,i)

    conf_ref[0, 0] += conf_acc
    inter_ref[0, 0] += inter_acc


def _bwd_kernel(xh_ref, x0_ref, gc_ref, gi_ref, dxh_ref, dx0_ref,
                *, m: int, beta: float):
    gc = gc_ref[0, 0]  # upstream d/d(conf_sum), pre-normalised by caller
    gi = gi_ref[0, 0]
    x0 = x0_ref[:].astype(jnp.float32)
    dx0 = jnp.zeros_like(x0)
    dxh = [jnp.zeros_like(x0) for _ in range(m)]
    for i in range(m):
        diff = xh_ref[:, i, :].astype(jnp.float32) - x0
        d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)
        g = (2.0 * gc) * _dpow_beta(d2, beta) * diff
        dxh[i] = dxh[i] + g
        dx0 = dx0 - g
    for i in range(m):
        xi = xh_ref[:, i, :].astype(jnp.float32)
        for j in range(i + 1, m):
            diff = xi - xh_ref[:, j, :].astype(jnp.float32)
            d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)
            g = (4.0 * gi) * _dpow_beta(d2, beta) * diff  # 2 pairs x chain 2
            dxh[i] = dxh[i] + g
            dxh[j] = dxh[j] - g
    for i in range(m):
        dxh_ref[:, i, :] = dxh[i].astype(dxh_ref.dtype)
    dx0_ref[:] = dx0.astype(dx0_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused(x0hats, x0, beta: float):
    return _fused_fwd_call(x0hats, x0, beta)


def _fused_fwd_call(x0hats, x0, beta: float):
    B, m, D = x0hats.shape
    bb = _choose_bb(B, m, D)
    conf_sum, inter_sum = _pallas_call(
        functools.partial(_fwd_kernel, m=m, beta=beta),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, m, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
    )(x0hats, x0)
    conf = conf_sum[0, 0] / (B * m)
    inter = inter_sum[0, 0] / (B * m * (m - 1))
    return conf, inter


def _fused_fwd(x0hats, x0, beta: float):
    return _fused_fwd_call(x0hats, x0, beta), (x0hats, x0)


def _fused_bwd(beta: float, res, grads):
    x0hats, x0 = res
    gconf, ginter = grads
    B, m, D = x0hats.shape
    bb = _choose_bb(B, m, D)
    gc = jnp.reshape(gconf / (B * m), (1, 1)).astype(jnp.float32)
    gi = jnp.reshape(ginter / (B * m * (m - 1)), (1, 1)).astype(jnp.float32)
    dxh, dx0 = _pallas_call(
        functools.partial(_bwd_kernel, m=m, beta=beta),
        out_shape=(
            jax.ShapeDtypeStruct((B, m, D), x0hats.dtype),
            jax.ShapeDtypeStruct((B, D), x0.dtype),
        ),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, m, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, m, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )(x0hats, x0, gc, gi)
    return dxh, dx0


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Large-m tier (m > 16): anchor-row streaming INSIDE the kernel.
#
# The unrolled kernel above enumerates all m(m-1)/2 pairs in Python — at the
# m=32 sweep point (BASELINE.json; reference knob `--m`,
# /root/reference/dddm/losses.py:16-24) that is 496 unrolled dot-reduces and
# an unacceptable compile. This tier walks anchors with an in-kernel
# ``fori_loop`` instead: per anchor i, ONE vectorised (m, D) difference
# block against the image's whole VMEM-resident prediction set. Each
# unordered pair is visited twice (once per anchor), exactly like the jnp
# chunked scan (``losses._interaction_mean_chunked``) — but the per-anchor
# (B, m, D) buffer that tier re-reads from HBM every scan step (and
# recomputes in the backward under jax.checkpoint) stays in VMEM here.
#
# Grid is (B,) with one image's (m, D) set per step and all in-kernel math
# strictly 2-D: every broadcast is a lane/sublane pattern the attention and
# MLP kernels already use. (The first cut blocked several images with 3-D
# (bb, m, D) math — Mosaic rejected the keepdims broadcasts with "invalid
# relayout: non-singleton logical dimension is replicated", so 2-D it is.)
#
# The backward exploits a streaming identity: the gradient ROW of anchor i
# is complete after its own pass — dxh_i = 4*gi*sum_j w_ij (x_i - x_j) with
# w = dpow(d2) — because the (j, i) visit of each pair contributes the same
# row it would have added to i. So the backward seeds the output block with
# the confinement gradient and accumulates one (1, D) row per loop step,
# never across anchors.
# ---------------------------------------------------------------------------

_STREAM_M_MAX = 64


def _stream_supported(B: int, m: int, D: int) -> bool:
    # working set: double-buffered (1, m, D) in/out blocks + the fp32 xh/g0
    # values held across the anchor loop + per-anchor temporaries
    return (
        16 < m <= _STREAM_M_MAX
        and D % 128 == 0
        and m % 8 == 0  # (1, m, D) blocks: m is the sublane dim
        and 8 * m * D * 4 <= 14 * 1024 * 1024
    )


def _fwd_kernel_stream(xh_ref, x0_ref, conf_ref, inter_ref, *, m: int,
                       beta: float):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        conf_ref[0, 0] = 0.0
        inter_ref[0, 0] = 0.0

    xh = xh_ref[0].astype(jnp.float32)        # (m, D)
    x0 = x0_ref[0].astype(jnp.float32)        # (1, D)

    diff0 = xh - x0                            # (m, D)
    # keepdims everywhere: Mosaic rejects the lane-replicated 1-D vectors
    # a bare axis=-1 reduce produces ("invalid relayout ... replicated")
    d20 = jnp.sum(diff0 * diff0, axis=-1, keepdims=True)   # (m, 1)
    conf_ref[0, 0] += jnp.sum(_pow_beta(d20, beta))

    col = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    def anchor(i, acc):
        # Mosaic lowers dynamic slicing only through refs (pl.ds), not on
        # register values — re-read the anchor row from the VMEM window
        xi = xh_ref[0, pl.ds(i, 1), :].astype(jnp.float32)   # (1, D)
        diff = xh - xi
        d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)    # (m, 1)
        mask = (col != i).astype(jnp.float32)
        return acc + jnp.sum(_pow_beta(d2, beta) * mask)

    inter_ref[0, 0] += jax.lax.fori_loop(0, m, anchor, jnp.float32(0.0))


def _bwd_kernel_stream(xh_ref, x0_ref, gc_ref, gi_ref, dxh_ref, dx0_ref,
                       *, m: int, beta: float):
    gc = gc_ref[0, 0]
    gi = gi_ref[0, 0]
    xh = xh_ref[0].astype(jnp.float32)        # (m, D)
    x0 = x0_ref[0].astype(jnp.float32)        # (1, D)

    # confinement: all rows at once (no pair structure); seed the output
    # block with it so the anchor loop can accumulate rows in place
    diff0 = xh - x0                            # (m, D)
    d20 = jnp.sum(diff0 * diff0, axis=-1, keepdims=True)
    g0 = (2.0 * gc) * _dpow_beta(d20, beta) * diff0
    dx0_ref[0] = -jnp.sum(g0, axis=0, keepdims=True).astype(dx0_ref.dtype)
    dxh_ref[0] = g0.astype(dxh_ref.dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    def anchor(i, _):
        xi = xh_ref[0, pl.ds(i, 1), :].astype(jnp.float32)    # (1, D)
        diff = xi - xh                                        # x_i - x_j
        d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)     # (m, 1)
        w = _dpow_beta(d2, beta) * (col != i).astype(jnp.float32)
        # 4 = 2 visits per unordered pair x d(d2)/dx_i chain factor 2
        row = (4.0 * gi) * jnp.sum(w * diff, axis=0, keepdims=True)
        dxh_ref[0, pl.ds(i, 1), :] += row.astype(dxh_ref.dtype)
        return 0

    jax.lax.fori_loop(0, m, anchor, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_stream(x0hats, x0, beta: float):
    return _stream_fwd_call(x0hats, x0, beta)


def _stream_fwd_call(x0hats, x0, beta: float):
    B, m, D = x0hats.shape
    conf_sum, inter_sum = _pallas_call(
        functools.partial(_fwd_kernel_stream, m=m, beta=beta),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, m, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
    )(x0hats, x0[:, None, :])
    conf = conf_sum[0, 0] / (B * m)
    inter = inter_sum[0, 0] / (B * m * (m - 1))
    return conf, inter


def _stream_fwd(x0hats, x0, beta: float):
    return _stream_fwd_call(x0hats, x0, beta), (x0hats, x0)


def _stream_bwd(beta: float, res, grads):
    x0hats, x0 = res
    gconf, ginter = grads
    B, m, D = x0hats.shape
    gc = jnp.reshape(gconf / (B * m), (1, 1)).astype(jnp.float32)
    gi = jnp.reshape(ginter / (B * m * (m - 1)), (1, 1)).astype(jnp.float32)
    dxh, dx0 = _pallas_call(
        functools.partial(_bwd_kernel_stream, m=m, beta=beta),
        out_shape=(
            jax.ShapeDtypeStruct((B, m, D), x0hats.dtype),
            jax.ShapeDtypeStruct((B, 1, D), x0.dtype),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, m, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, m, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(x0hats, x0[:, None, :], gc, gi)
    return dxh, dx0[:, 0, :]


_fused_stream.defvjp(_stream_fwd, _stream_bwd)


def fused_energy_terms(
    x0hats: jnp.ndarray, x0: jnp.ndarray, beta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Energy-score terms with the fused kernel when profitable.

    Same contract as :func:`ddm_tpu.ops.losses.generalized_energy_terms`.
    Dispatches on TPU for image-sized D (lane-aligned, block divides B):
    the pair-unrolled kernel at m <= 16, the anchor-streaming kernel past
    it (the reference `--m` knob is unbounded, losses.py:16-24); otherwise
    the jnp reference (which XLA handles fine at toy sizes, and whose
    chunked scan covers shapes neither kernel fits).
    """
    B, m, D = x0hats.shape
    if kernels_enabled() and _kernel_supported(B, m, D):
        return _fused(x0hats.astype(jnp.float32), x0.astype(jnp.float32),
                      beta)
    if kernels_enabled() and _stream_supported(B, m, D):
        return _fused_stream(x0hats.astype(jnp.float32),
                             x0.astype(jnp.float32), beta)
    return _jnp_energy_terms(x0hats, x0, beta)
