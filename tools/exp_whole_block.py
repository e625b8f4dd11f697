"""Experiment (measured dead end, r2 tail): whole-DiT-block forward merge.

One Pallas kernel computes a full pre-LN DiT block —
``a = x + proj(MHA(qkv(LN1(x)))); out = a + W2 gelu(W1 LN2(a))`` — keeping
``a`` in VMEM instead of round-tripping through HBM between the attention
and MLP half-block kernels. Values are bit-identical to the production
pair (``a`` is rounded to the compute dtype exactly where the pair's HBM
write/read rounds it).

Measured on v5e at sampler batch 256 (this script): +13% on a SINGLE
dispatch-bound call, but 3% SLOWER in the realistic 8-block chain
(4.98 vs 4.84 ms) and 2635 vs 2767 samples/s in the sampler bench — the
pair's kernels pipeline across blocks, so XLA already hides the saved
round trip, while the longer merged body overlaps less internally.
Conclusion recorded in ROOFLINE.md §3; the model keeps the two-kernel
pair.

Run: python tools/exp_whole_block.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ddm_tpu.ops.attention import (
    _block_mask,
    _choose_blocks,
    _ln,
    _mha_packed_fwd,
    fused_attention_block,
)
from ddm_tpu.ops.mlp_block import _act, fused_mlp_block
from ddm_tpu.ops.pallas_config import interpret_mode


def _whole_fwd_kernel(x_ref, s1_ref, b1_ref, wqkv_ref, bqkv_ref, wproj_ref,
                      bproj_ref, s2_ref, b2_ref, w1_ref, bb1_ref, w2_ref,
                      bb2_ref, mask_ref, o_ref, qkv_scr, att_scr,
                      *, H: int, g: int, scale: float):
    bi, N, D = x_ref.shape
    R = bi * N
    dtype = x_ref.dtype

    xf = x_ref[:].reshape(R, D).astype(jnp.float32)
    y, _, _ = _ln(xf, s1_ref[:], b1_ref[:])
    qkv = jnp.dot(y.astype(dtype), wqkv_ref[:],
                  preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkv_scr[:] = qkv.astype(dtype)
    _mha_packed_fwd(qkv_scr[:], att_scr, mask_ref[:], bi=bi, N=N, D=D, H=H,
                    g=g, scale=scale, dtype=dtype)
    a = xf + jnp.dot(att_scr[:], wproj_ref[:],
                     preferred_element_type=jnp.float32) + bproj_ref[:]
    af = a.astype(dtype).astype(jnp.float32)  # round where the pair rounds

    y2, _, _ = _ln(af, s2_ref[:], b2_ref[:])
    h = jnp.dot(y2.astype(dtype), w1_ref[:],
                preferred_element_type=jnp.float32) + bb1_ref[:]
    gact = _act(h).astype(dtype)
    out = jnp.dot(gact, w2_ref[:],
                  preferred_element_type=jnp.float32) + bb2_ref[:]
    o_ref[:] = (af + out).reshape(bi, N, D).astype(o_ref.dtype)


def merged_call(x, s1, b1, wqkv, bqkv, wproj, bproj, s2, b2, w1, bb1, w2,
                bb2, H, bi=8):
    B, N, D = x.shape
    F = w1.shape[1]
    _, g = _choose_blocks(B, N, D)
    mask = _block_mask(g, N)
    Dh = D // H
    row3 = pl.BlockSpec((bi, N, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    dt = x.dtype
    return pl.pallas_call(
        functools.partial(_whole_fwd_kernel, H=H, g=g, scale=Dh**-0.5),
        interpret=interpret_mode(),
        out_shape=jax.ShapeDtypeStruct((B, N, D), dt),
        grid=(B // bi,),
        in_specs=[row3, const((1, D)), const((1, D)), const((D, 3 * D)),
                  const((1, 3 * D)), const((D, D)), const((1, D)),
                  const((1, D)), const((1, D)), const((D, F)),
                  const((1, F)), const((F, D)), const((1, D)),
                  const((g * N, g * N))],
        out_specs=row3,
        scratch_shapes=[
            pltpu.VMEM((bi * N, 3 * D), dt),
            pltpu.VMEM((bi * N, D), dt),
        ],
    )(x, s1.reshape(1, D), b1.reshape(1, D), wqkv.astype(dt),
      bqkv.reshape(1, 3 * D), wproj.astype(dt), bproj.reshape(1, D),
      s2.reshape(1, D), b2.reshape(1, D), w1.astype(dt),
      bb1.reshape(1, F), w2.astype(dt), bb2.reshape(1, D), mask)


def pair_call(x, s1, b1, wqkv, bqkv, wproj, bproj, s2, b2, w1, bb1, w2,
              bb2, H):
    B, N, D = x.shape
    a = fused_attention_block(x, s1, b1, wqkv, bqkv, wproj, bproj, H)
    out = fused_mlp_block(a.reshape(B * N, D), s2, b2, w1, bb1, w2, bb2)
    return out.reshape(B, N, D)


def main():
    sys.path.insert(0, os.path.dirname(__file__))
    from kbench import _timeit

    B, N, D, H, F = 256, 64, 384, 6, 1536
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, N, D), dt)
    p = (
        jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32),
        jax.random.normal(ks[1], (D, 3 * D), jnp.float32) * 0.05,
        jnp.zeros((3 * D,), jnp.float32),
        jax.random.normal(ks[2], (D, D), jnp.float32) * 0.05,
        jnp.zeros((D,), jnp.float32),
        jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32),
        jax.random.normal(ks[3], (D, F), jnp.float32) * 0.05,
        jnp.zeros((F,), jnp.float32),
        jax.random.normal(ks[4], (F, D), jnp.float32) * 0.05,
        jnp.zeros((D,), jnp.float32),
    )
    mer = jax.jit(lambda x_: merged_call(x_, *p, H))
    par = jax.jit(lambda x_: pair_call(x_, *p, H))
    err = float(jnp.abs(mer(x).astype(jnp.float32) -
                        par(x).astype(jnp.float32)).max())
    print(f"max |merged - pair| = {err:.2e}")

    mer8 = jax.jit(
        lambda x_: [x_ := merged_call(x_, *p, H) for _ in range(8)][-1])
    par8 = jax.jit(
        lambda x_: [x_ := pair_call(x_, *p, H) for _ in range(8)][-1])
    print(f"merged 1blk {_timeit(mer, x, reps=100):.4f} ms   "
          f"pair 1blk {_timeit(par, x, reps=100):.4f} ms")
    print(f"merged 8blk {_timeit(mer8, x, reps=60):.4f} ms   "
          f"pair 8blk {_timeit(par8, x, reps=60):.4f} ms")


if __name__ == "__main__":
    main()
