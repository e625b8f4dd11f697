"""Experiment: phase-batched softmax in the attention half-block forward.

The production kernel (`ops/attention.py::_mha_packed_fwd`) interleaves per
(pack, head): QK^T matmul -> softmax -> AV matmul. ROOFLINE.md attributes
the ~40% gap to the 197 TF/s bound partly to MXU/VPU serialization between
dependent phases. This experiment restructures each pack into three coarse
phases — all H QK^T matmuls into a stacked fp32 scratch, ONE softmax pass
over the (H*P, P) stack, then all H AV matmuls — so across packs the
scheduler sees pack p+1's MXU phase independent of pack p's VPU phase.

Run: python tools/exp_phase_softmax.py [--dit-b] [--reps 50]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ddm_tpu.ops import attention as A


def _mha_phase_fwd(qkv, o_scratch, scores_scr, mask, *, bi, N, D, H, g,
                   scale, dtype):
    Dh = D // H
    P = g * N
    for p in range(bi // g):
        rows = slice(p * P, (p + 1) * P)
        for h in range(H):
            qh = qkv[rows, slice(h * Dh, (h + 1) * Dh)]
            kh = qkv[rows, slice(D + h * Dh, D + (h + 1) * Dh)]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            scores_scr[slice(h * P, (h + 1) * P), :] = s * scale + mask
        sall = scores_scr[:]
        sall = sall - jnp.max(sall, axis=-1, keepdims=True)
        e = jnp.exp(sall)
        scores_scr[:] = e / jnp.sum(e, axis=-1, keepdims=True)
        for h in range(H):
            vh = qkv[rows, slice(2 * D + h * Dh, 2 * D + (h + 1) * Dh)]
            probs = scores_scr[slice(h * P, (h + 1) * P), :].astype(dtype)
            o = jnp.dot(probs, vh, preferred_element_type=jnp.float32)
            o_scratch[rows, slice(h * Dh, (h + 1) * Dh)] = o.astype(dtype)


def _blk_fwd_kernel_phase(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                          bproj_ref, mask_ref, o_ref, qkv_scr, att_scr,
                          scores_scr, *, H: int, g: int, scale: float):
    bi, N, D = x_ref.shape
    R = bi * N
    xf = x_ref[:].reshape(R, D).astype(jnp.float32)
    y, _, _ = A._ln(xf, s_ref[:], b_ref[:])
    y = y.astype(x_ref.dtype)
    qkv = jnp.dot(y, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkv_scr[:] = qkv.astype(x_ref.dtype)
    _mha_phase_fwd(qkv_scr[:], att_scr, scores_scr, mask_ref[:], bi=bi, N=N,
                   D=D, H=H, g=g, scale=scale, dtype=x_ref.dtype)
    out = jnp.dot(att_scr[:], wproj_ref[:],
                  preferred_element_type=jnp.float32) + bproj_ref[:]
    o_ref[:] = (xf + out).reshape(bi, N, D).astype(o_ref.dtype)


def phase_fwd_call(x, scale_p, bias_p, wqkv, bqkv, wproj, bproj, H):
    B, N, D = x.shape
    bi, g = A._choose_blocks(B, N, D)
    bi = min(bi, 16 if D <= 512 else 4)
    mask = A._block_mask(g, N)
    row3, const = A._blk_specs(B, N, D, bi, g)
    Dh = D // H
    P = g * N
    return A._pallas_call(
        functools.partial(_blk_fwd_kernel_phase, H=H, g=g, scale=Dh**-0.5),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        grid=(B // bi,),
        in_specs=[row3, const((1, D)), const((1, D)), const((D, 3 * D)),
                  const((1, 3 * D)), const((D, D)), const((1, D)),
                  const((P, P))],
        out_specs=row3,
        scratch_shapes=[
            pltpu.VMEM((bi * N, 3 * D), x.dtype),
            pltpu.VMEM((bi * N, D), x.dtype),
            pltpu.VMEM((H * P, P), jnp.float32),
        ],
    )(x, scale_p.reshape(1, D), bias_p.reshape(1, D), wqkv.astype(x.dtype),
      bqkv.reshape(1, 3 * D), wproj.astype(x.dtype), bproj.reshape(1, D), mask)


def _blk_bwd_kernel_phase(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                          bproj_ref, mask_ref, do_ref,
                          dx_ref, ds_ref, db_ref, dwqkv_ref, dbqkv_ref,
                          dwproj_ref, dbproj_ref,
                          qkv_scr, att_scr, dqkv_scr, scores_scr, dp_scr,
                          *, H: int, g: int, scale: float):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[:] = jnp.zeros_like(dbproj_ref)

    bi, N, D = x_ref.shape
    Dh = D // H
    P = g * N
    R = bi * N
    dtype = x_ref.dtype

    # --- recompute forward through qkv ---
    xf = x_ref[:].reshape(R, D).astype(jnp.float32)
    y, xhat, inv = A._ln(xf, s_ref[:], b_ref[:])
    yb = y.astype(dtype)
    qkv = jnp.dot(yb, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkv_scr[:] = qkv.astype(dtype)
    _mha_phase_fwd(qkv_scr[:], att_scr, scores_scr, mask_ref[:], bi=bi, N=N,
                   D=D, H=H, g=g, scale=scale, dtype=dtype)

    # --- proj backward ---
    do = do_ref[:].reshape(R, D).astype(jnp.float32)
    dob = do.astype(dtype)
    dwproj_ref[:] += jax.lax.dot_general(
        att_scr[:], dob, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbproj_ref[:] += jnp.sum(do, axis=0, keepdims=True)
    datt = jax.lax.dot_general(
        dob, wproj_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)

    # --- attention backward, phase-batched per pack ---
    for p in range(bi // g):
        rows = slice(p * P, (p + 1) * P)
        # phase 1: recompute scores for all heads
        for h in range(H):
            qh = qkv_scr[rows, slice(h * Dh, (h + 1) * Dh)]
            kh = qkv_scr[rows, slice(D + h * Dh, D + (h + 1) * Dh)]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            scores_scr[slice(h * P, (h + 1) * P), :] = s * scale + mask_ref[:]
        # phase 2: one stacked softmax
        sall = scores_scr[:]
        sall = sall - jnp.max(sall, axis=-1, keepdims=True)
        e = jnp.exp(sall)
        scores_scr[:] = e / jnp.sum(e, axis=-1, keepdims=True)
        # phase 3: dv and dp for all heads
        for h in range(H):
            hrows = slice(h * P, (h + 1) * P)
            doh = datt[rows, slice(h * Dh, (h + 1) * Dh)]
            vh = qkv_scr[rows, slice(2 * D + h * Dh, 2 * D + (h + 1) * Dh)]
            pb = scores_scr[hrows, :].astype(dtype)
            dv = jax.lax.dot_general(
                pb, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_scr[rows, slice(2 * D + h * Dh, 2 * D + (h + 1) * Dh)] = (
                dv.astype(dtype))
            dp_scr[hrows, :] = jax.lax.dot_general(
                doh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        # phase 4: stacked dS algebra
        probs = scores_scr[:]
        dpv = dp_scr[:]
        dsc = probs * (dpv - jnp.sum(probs * dpv, axis=-1, keepdims=True))
        dp_scr[:] = dsc * scale
        # phase 5: dq and dk for all heads
        for h in range(H):
            hrows = slice(h * P, (h + 1) * P)
            qh = qkv_scr[rows, slice(h * Dh, (h + 1) * Dh)]
            kh = qkv_scr[rows, slice(D + h * Dh, D + (h + 1) * Dh)]
            dsb = dp_scr[hrows, :].astype(dtype)
            dq = jnp.dot(dsb, kh, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                dsb, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_scr[rows, slice(h * Dh, (h + 1) * Dh)] = dq.astype(dtype)
            dqkv_scr[rows, slice(D + h * Dh, D + (h + 1) * Dh)] = dk.astype(dtype)

    # --- qkv backward ---
    dqkvb = dqkv_scr[:]
    dwqkv_ref[:] += jax.lax.dot_general(
        yb, dqkvb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbqkv_ref[:] += jnp.sum(dqkvb.astype(jnp.float32), axis=0, keepdims=True)
    dy = jax.lax.dot_general(
        dqkvb, wqkv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # --- LayerNorm backward + residual ---
    ds_ref[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * s_ref[:]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = inv * (dxhat - m1 - xhat * m2)
    dx_ref[:] = (do + dx_ln).reshape(bi, N, D).astype(dx_ref.dtype)


def _blk_bwd_kernel_persist(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref,
                            wproj_ref, bproj_ref, mask_ref, do_ref,
                            dx_ref, ds_ref, db_ref, dwqkv_ref, dbqkv_ref,
                            dwproj_ref, dbproj_ref,
                            qkv_scr, att_scr, dqkv_scr, scores_scr, dp_scr,
                            *, H: int, g: int, scale: float):
    """Backward with probs computed ONCE: stacked scores for every
    (pack, head) of the block live in scores_scr, softmaxed in one VPU
    pass, and reused for the attention output, dv, and the dS algebra —
    no QK^T/softmax recompute in the backward half."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[:] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[:] = jnp.zeros_like(dbproj_ref)

    bi, N, D = x_ref.shape
    Dh = D // H
    P = g * N
    R = bi * N
    packs = bi // g
    dtype = x_ref.dtype

    xf = x_ref[:].reshape(R, D).astype(jnp.float32)
    y, xhat, inv = A._ln(xf, s_ref[:], b_ref[:])
    yb = y.astype(dtype)
    qkv = jnp.dot(yb, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkv_scr[:] = qkv.astype(dtype)

    # scores for every (pack, head), once
    for p in range(packs):
        rows = slice(p * P, (p + 1) * P)
        for h in range(H):
            i = p * H + h
            qh = qkv_scr[rows, slice(h * Dh, (h + 1) * Dh)]
            kh = qkv_scr[rows, slice(D + h * Dh, D + (h + 1) * Dh)]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            scores_scr[slice(i * P, (i + 1) * P), :] = s * scale + mask_ref[:]
    # one stacked softmax over the whole block
    sall = scores_scr[:]
    sall = sall - jnp.max(sall, axis=-1, keepdims=True)
    e = jnp.exp(sall)
    scores_scr[:] = e / jnp.sum(e, axis=-1, keepdims=True)
    # attention outputs
    for p in range(packs):
        rows = slice(p * P, (p + 1) * P)
        for h in range(H):
            i = p * H + h
            vh = qkv_scr[rows, slice(2 * D + h * Dh, 2 * D + (h + 1) * Dh)]
            pb = scores_scr[slice(i * P, (i + 1) * P), :].astype(dtype)
            o = jnp.dot(pb, vh, preferred_element_type=jnp.float32)
            att_scr[rows, slice(h * Dh, (h + 1) * Dh)] = o.astype(dtype)

    # proj backward
    do = do_ref[:].reshape(R, D).astype(jnp.float32)
    dob = do.astype(dtype)
    dwproj_ref[:] += jax.lax.dot_general(
        att_scr[:], dob, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbproj_ref[:] += jnp.sum(do, axis=0, keepdims=True)
    datt = jax.lax.dot_general(
        dob, wproj_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)

    # dv and dp (probs reused from scores_scr)
    for p in range(packs):
        rows = slice(p * P, (p + 1) * P)
        for h in range(H):
            i = p * H + h
            srows = slice(i * P, (i + 1) * P)
            doh = datt[rows, slice(h * Dh, (h + 1) * Dh)]
            vh = qkv_scr[rows, slice(2 * D + h * Dh, 2 * D + (h + 1) * Dh)]
            pb = scores_scr[srows, :].astype(dtype)
            dv = jax.lax.dot_general(
                pb, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_scr[rows, slice(2 * D + h * Dh, 2 * D + (h + 1) * Dh)] = (
                dv.astype(dtype))
            dp_scr[srows, :] = jax.lax.dot_general(
                doh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    # one stacked dS pass
    probs = scores_scr[:]
    dpv = dp_scr[:]
    dsc = probs * (dpv - jnp.sum(probs * dpv, axis=-1, keepdims=True))
    dp_scr[:] = dsc * scale
    # dq / dk
    for p in range(packs):
        rows = slice(p * P, (p + 1) * P)
        for h in range(H):
            i = p * H + h
            srows = slice(i * P, (i + 1) * P)
            qh = qkv_scr[rows, slice(h * Dh, (h + 1) * Dh)]
            kh = qkv_scr[rows, slice(D + h * Dh, D + (h + 1) * Dh)]
            dsb = dp_scr[srows, :].astype(dtype)
            dq = jnp.dot(dsb, kh, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                dsb, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_scr[rows, slice(h * Dh, (h + 1) * Dh)] = dq.astype(dtype)
            dqkv_scr[rows, slice(D + h * Dh, D + (h + 1) * Dh)] = (
                dk.astype(dtype))

    dqkvb = dqkv_scr[:]
    dwqkv_ref[:] += jax.lax.dot_general(
        yb, dqkvb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbqkv_ref[:] += jnp.sum(dqkvb.astype(jnp.float32), axis=0, keepdims=True)
    dy = jax.lax.dot_general(
        dqkvb, wqkv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    ds_ref[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * s_ref[:]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = inv * (dxhat - m1 - xhat * m2)
    dx_ref[:] = (do + dx_ln).reshape(bi, N, D).astype(dx_ref.dtype)


def persist_bwd_call(x, scale_p, bias_p, wqkv, bqkv, wproj, bproj, do, H,
                     bi_override=None):
    B, N, D = x.shape
    _, g = A._choose_blocks(B, N, D)
    bi = bi_override or A._bwd_block_images(B, N, D, g, H)
    mask = A._block_mask(g, N)
    row3, const = A._blk_specs(B, N, D, bi, g)
    Dh = D // H
    P = g * N
    stack = (bi // g) * H * P
    outs = A._pallas_call(
        functools.partial(_blk_bwd_kernel_persist, H=H, g=g, scale=Dh**-0.5),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        grid=(B // bi,),
        in_specs=[row3, const((1, D)), const((1, D)), const((D, 3 * D)),
                  const((1, 3 * D)), const((D, D)), const((1, D)),
                  const((P, P)), row3],
        out_specs=(row3, const((1, D)), const((1, D)), const((D, 3 * D)),
                   const((1, 3 * D)), const((D, D)), const((1, D))),
        scratch_shapes=[
            pltpu.VMEM((bi * N, 3 * D), x.dtype),
            pltpu.VMEM((bi * N, D), x.dtype),
            pltpu.VMEM((bi * N, 3 * D), x.dtype),
            pltpu.VMEM((stack, P), jnp.float32),
            pltpu.VMEM((stack, P), jnp.float32),
        ],
    )(x, scale_p.reshape(1, D), bias_p.reshape(1, D), wqkv.astype(x.dtype),
      bqkv.reshape(1, 3 * D), wproj.astype(x.dtype), bproj.reshape(1, D),
      mask, do)
    return outs


def phase_bwd_call(x, scale_p, bias_p, wqkv, bqkv, wproj, bproj, do, H,
                   bi_override=None):
    B, N, D = x.shape
    _, g = A._choose_blocks(B, N, D)
    bi = bi_override or A._bwd_block_images(B, N, D, g, H)
    mask = A._block_mask(g, N)
    row3, const = A._blk_specs(B, N, D, bi, g)
    Dh = D // H
    P = g * N
    outs = A._pallas_call(
        functools.partial(_blk_bwd_kernel_phase, H=H, g=g, scale=Dh**-0.5),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        grid=(B // bi,),
        in_specs=[row3, const((1, D)), const((1, D)), const((D, 3 * D)),
                  const((1, 3 * D)), const((D, D)), const((1, D)),
                  const((P, P)), row3],
        out_specs=(row3, const((1, D)), const((1, D)), const((D, 3 * D)),
                   const((1, 3 * D)), const((D, D)), const((1, D))),
        scratch_shapes=[
            pltpu.VMEM((bi * N, 3 * D), x.dtype),
            pltpu.VMEM((bi * N, D), x.dtype),
            pltpu.VMEM((bi * N, 3 * D), x.dtype),
            pltpu.VMEM((H * P, P), jnp.float32),
            pltpu.VMEM((H * P, P), jnp.float32),
        ],
    )(x, scale_p.reshape(1, D), bias_p.reshape(1, D), wqkv.astype(x.dtype),
      bqkv.reshape(1, 3 * D), wproj.astype(x.dtype), bproj.reshape(1, D),
      mask, do)
    return outs


def _timeit(fn, *args, reps=30, warmup=3):
    args2 = (args[0] + jnp.asarray(1e-3, args[0].dtype),) + args[1:]

    def _sync(out):
        leaf = jax.tree.leaves(out)[0]
        return float(leaf.ravel()[0])

    for _ in range(warmup):
        out = fn(*args)
        out = fn(*args2)
    _sync(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*(args if i % 2 else args2))
    _sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dit-b", action="store_true")
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    B, N = 2048, 64
    D, H = (768, 12) if args.dit_b else (384, 6)
    print(f"shapes: B={B} N={N} D={D} H={H} on {jax.devices()[0]}", flush=True)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, N, D), dt)
    sc = jnp.ones((D,), jnp.float32)
    bi_ = jnp.zeros((D,), jnp.float32)
    wqkv = jax.random.normal(ks[1], (D, 3 * D), jnp.float32) * 0.02
    bqkv = jnp.zeros((3 * D,), jnp.float32)
    wproj = jax.random.normal(ks[2], (D, D), jnp.float32) * 0.02
    bproj = jnp.zeros((D,), jnp.float32)
    a = (x, sc, bi_, wqkv, bqkv, wproj, bproj)

    cur = jax.jit(lambda *a: A._fused_block_fwd_call(*a, H))
    new = jax.jit(lambda *a: phase_fwd_call(*a, H))

    ref = cur(*a)
    out = new(*a)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) -
                                ref.astype(jnp.float32))))
    print(f"max |phase - current| = {err:.2e}", flush=True)

    t_cur = _timeit(cur, *a, reps=args.reps)
    t_new = _timeit(new, *a, reps=args.reps)
    print(f"current fwd: {t_cur:.3f} ms   phase-batched fwd: {t_new:.3f} ms "
          f"({(t_cur / t_new - 1) * 100:+.1f}%)", flush=True)

    # --- backward ---
    do = jax.random.normal(ks[3], (B, N, D), dt)
    res = a
    cur_b = jax.jit(lambda do_, *a_: A._fused_block_bwd(H, a_, do_))
    ref_b = cur_b(do, *a)
    t_cur_b = _timeit(cur_b, do, *a, reps=args.reps)
    print(f"current bwd (bi={A._bwd_block_images(B, N, D, 4, H)}): "
          f"{t_cur_b:.3f} ms", flush=True)

    for bi_try in (8, 4):
        try:
            def _mk(bi_fixed):
                def f(do_, *a_):
                    return phase_bwd_call(*a_, do_, H, bi_override=bi_fixed)
                return f
            new_b = jax.jit(_mk(bi_try))
            out_b = new_b(do, *a)
            errs = [float(jnp.max(jnp.abs(o.astype(jnp.float32) -
                                          r.astype(jnp.float32))))
                    for o, r in zip(out_b, ref_b)]
            t_new_b = _timeit(new_b, do, *a, reps=args.reps)
            print(f"phase bwd bi={bi_try}: {t_new_b:.3f} ms "
                  f"({(t_cur_b / t_new_b - 1) * 100:+.1f}%)  "
                  f"max err {max(errs):.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"phase bwd bi={bi_try}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)

    for bi_try in (8, 4):
        try:
            def _mkp(bi_fixed):
                def f(do_, *a_):
                    return persist_bwd_call(*a_, do_, H, bi_override=bi_fixed)
                return f
            new_b = jax.jit(_mkp(bi_try))
            out_b = new_b(do, *a)
            errs = [float(jnp.max(jnp.abs(o.astype(jnp.float32) -
                                          r.astype(jnp.float32))))
                    for o, r in zip(out_b, ref_b)]
            t_new_b = _timeit(new_b, do, *a, reps=args.reps)
            print(f"persist bwd bi={bi_try}: {t_new_b:.3f} ms "
                  f"({(t_cur_b / t_new_b - 1) * 100:+.1f}%)  "
                  f"max err {max(errs):.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"persist bwd bi={bi_try}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
