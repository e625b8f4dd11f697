"""Ablation microbenchmarks for the fused attention-block backward kernel.

Times variant kernels with individual compute phases removed (softmax
recompute VPU work, the dS VPU work, the LayerNorm backward, the dW
accumulation matmuls) to attribute the measured 6.2 ms/block to engines.
Results are WRONG numerically — this is a time-attribution tool only.

HISTORICAL BASELINE: the kernel copy ablated here is the r2
*interleaved-recompute* backward. Its ablation table (ROOFLINE.md §2)
motivated the persist-probs backward that replaced it in production
(`ops/attention.py::_blk_bwd_kernel`, +28%) — the −0.61 ms softmax
recompute and −1.08 ms MHA recompute rows are exactly what persisting
the stacked probabilities eliminated. Kept as the comparison baseline.

Usage: python tools/kbench_ablate.py [--reps 30]
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
from ddm_tpu.ops import mlp_block as M


def _timeit(fn, *args, reps=30, warmup=3):
    # two input variants defeat dispatch-level result caching; the final
    # SCALAR FETCH (not block_until_ready) is the only reliable sync through
    # the axon remote-TPU relay (see bench.py)
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


def _legacy_mha_packed_fwd(qkv, o_scratch, mask, *, bi, N, D, H, g, scale,
                           dtype):
    """Pre-diag-softmax packed MHA (full-tile masked softmax) for A/B."""
    Dh = D // H
    P = g * N
    for p in range(bi // g):
        rows = slice(p * P, (p + 1) * P)
        for h in range(H):
            cs = slice(h * Dh, (h + 1) * Dh)
            qh = qkv[rows, cs]
            kh = qkv[rows, slice(D + h * Dh, D + (h + 1) * Dh)]
            vh = qkv[rows, slice(2 * D + h * Dh, 2 * D + (h + 1) * Dh)]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + mask
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(probs.astype(dtype), vh,
                        preferred_element_type=jnp.float32)
            o_scratch[rows, cs] = o.astype(dtype)


def _bwd_kernel_ablate(x_ref, s_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                       bproj_ref, mask_ref, do_ref,
                       dx_ref, ds_ref, db_ref, dwqkv_ref, dbqkv_ref,
                       dwproj_ref, dbproj_ref,
                       qkv_scr, att_scr, dqkv_scr,
                       *, H, g, scale,
                       skip_softmax, skip_ds, skip_ln, skip_dw,
                       skip_core_mm, skip_recompute_mha):
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

    xf = x_ref[:].reshape(R, D).astype(jnp.float32)
    y, xhat, inv = A._ln(xf, s_ref[:], b_ref[:])
    yb = y.astype(dtype)
    qkv = jnp.dot(yb, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkv_scr[:] = qkv.astype(dtype)
    if not skip_recompute_mha:
        _legacy_mha_packed_fwd(qkv_scr[:], att_scr, mask_ref[:], bi=bi, N=N,
                               D=D, H=H, g=g, scale=scale, dtype=dtype)
    else:
        att_scr[:] = qkv_scr[:, :D]

    do = do_ref[:].reshape(R, D).astype(jnp.float32)
    dob = do.astype(dtype)
    if not skip_dw:
        dwproj_ref[:] += jax.lax.dot_general(
            att_scr[:], dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbproj_ref[:] += jnp.sum(do, axis=0, keepdims=True)
    datt = jax.lax.dot_general(
        dob, wproj_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)

    for p in range(bi // g):
        rows = slice(p * P, (p + 1) * P)
        for h in range(H):
            cq = slice(h * Dh, (h + 1) * Dh)
            ck = slice(D + h * Dh, D + (h + 1) * Dh)
            cv = slice(2 * D + h * Dh, 2 * D + (h + 1) * Dh)
            qh = qkv_scr[rows, cq]
            kh = qkv_scr[rows, ck]
            vh = qkv_scr[rows, cv]
            doh = datt[rows, cq]
            if skip_core_mm:
                dqkv_scr[rows, cq] = doh
                dqkv_scr[rows, ck] = doh
                dqkv_scr[rows, cv] = doh
                continue
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if skip_softmax:
                probs = s * scale
            else:
                s = s * scale + mask_ref[:]
                s = s - jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s)
                probs = e / jnp.sum(e, axis=-1, keepdims=True)
            pb = probs.astype(dtype)
            dv = jax.lax.dot_general(
                pb, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                doh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if skip_ds:
                dsc = dp
            else:
                dsc = probs * (dp - jnp.sum(probs * dp, axis=-1, keepdims=True))
            dsb = (dsc * scale).astype(dtype)
            dq = jnp.dot(dsb, kh, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                dsb, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqkv_scr[rows, cq] = dq.astype(dtype)
            dqkv_scr[rows, ck] = dk.astype(dtype)
            dqkv_scr[rows, cv] = dv.astype(dtype)

    dqkvb = dqkv_scr[:]
    if not skip_dw:
        dwqkv_ref[:] += jax.lax.dot_general(
            yb, dqkvb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbqkv_ref[:] += jnp.sum(dqkvb.astype(jnp.float32), axis=0,
                                keepdims=True)
    dy = jax.lax.dot_general(
        dqkvb, wqkv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    if skip_ln:
        dx_ref[:] = (do + dy).reshape(bi, N, D).astype(dx_ref.dtype)
    else:
        ds_ref[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
        db_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
        dxhat = dy * s_ref[:]
        m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx_ln = inv * (dxhat - m1 - xhat * m2)
        dx_ref[:] = (do + dx_ln).reshape(bi, N, D).astype(dx_ref.dtype)


def run_bwd_variant(x, sc, bi_, wqkv, bqkv, wproj, bproj, do, H, **skips):
    B, N, D = x.shape
    _, g = A._choose_blocks(B, N, D)
    bi = A._bwd_block_images(B, N, D, g, H)
    mask = jnp.zeros((g * N, g * N), jnp.float32)  # legacy masked-pack layout
    row3, const = A._blk_specs(B, N, D, bi, g)
    Dh = D // H
    kern = functools.partial(_bwd_kernel_ablate, H=H, g=g, scale=Dh**-0.5,
                             **skips)
    return pl.pallas_call(
        kern,
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
                  const((g * N, g * N)), row3],
        out_specs=(row3, const((1, D)), const((1, D)), const((D, 3 * D)),
                   const((1, 3 * D)), const((D, D)), const((1, D))),
        scratch_shapes=[
            pltpu.VMEM((bi * N, 3 * D), x.dtype),
            pltpu.VMEM((bi * N, D), x.dtype),
            pltpu.VMEM((bi * N, 3 * D), x.dtype),
        ],
    )(x, sc.reshape(1, D), bi_.reshape(1, D), wqkv.astype(x.dtype),
      bqkv.reshape(1, 3 * D), wproj.astype(x.dtype), bproj.reshape(1, D),
      mask, do)


def _gelu_id(h, erf=None):
    return h


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    B, N, D, H = 2048, 64, 384, 6
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, N, D), dt)
    sc = jnp.ones((D,), jnp.float32)
    bi_ = jnp.zeros((D,), jnp.float32)
    wqkv = jax.random.normal(ks[1], (D, 3 * D), jnp.float32) * 0.02
    bqkv = jnp.zeros((3 * D,), jnp.float32)
    wproj = jax.random.normal(ks[2], (D, D), jnp.float32) * 0.02
    bproj = jnp.zeros((D,), jnp.float32)
    do = jax.random.normal(ks[3], (B, N, D), dt)

    variants = [
        ("baseline", {}),
        ("no-softmax-vpu", dict(skip_softmax=True)),
        ("no-ds-vpu", dict(skip_ds=True)),
        ("no-ln-bwd", dict(skip_ln=True)),
        ("no-dw-matmuls", dict(skip_dw=True)),
        ("no-core-matmuls", dict(skip_core_mm=True)),
        ("no-mha-recompute", dict(skip_recompute_mha=True)),
        ("softmax+ds off", dict(skip_softmax=True, skip_ds=True)),
    ]
    base = dict(skip_softmax=False, skip_ds=False, skip_ln=False,
                skip_dw=False, skip_core_mm=False, skip_recompute_mha=False)
    for name, over in variants:
        skips = {**base, **over}
        fn = jax.jit(functools.partial(
            run_bwd_variant, H=H, **skips))
        try:
            t = _timeit(fn, x, sc, bi_, wqkv, bqkv, wproj, bproj, do,
                        reps=args.reps)
            print(f"attn-bwd {name:18s}: {t:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"attn-bwd {name:18s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)

    # MLP fwd gelu share
    T, F = B * N, 4 * D
    xm = jax.random.normal(ks[4], (T, D), dt)
    w1 = jax.random.normal(ks[5], (D, F), jnp.float32) * 0.02
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jax.random.normal(ks[6], (F, D), jnp.float32) * 0.02
    b2 = jnp.zeros((D,), jnp.float32)

    fwd = jax.jit(lambda *a: M._fused_fwd_call(*a))
    t = _timeit(fwd, xm, sc, bi_, w1, b1, w2, b2, reps=args.reps)
    print(f"mlp-fwd baseline      : {t:.3f} ms", flush=True)
    orig = M._gelu
    M._gelu = _gelu_id
    try:
        fwd2 = jax.jit(lambda *a: M._fused_fwd_call(*a))
        t = _timeit(fwd2, xm, sc, bi_, w1, b1, w2, b2, reps=args.reps)
        print(f"mlp-fwd identity-gelu : {t:.3f} ms", flush=True)
    finally:
        M._gelu = orig


if __name__ == "__main__":
    main()
