"""Microbenchmark harness for the DiT half-block Pallas kernels.

Times forward and forward+backward of the attention half-block and the MLP
half-block at the CIFAR production shape (B*m = 2048 images, N = 64 tokens,
D = 384 / DiT-B 768), sweeping the image-pack size ``g`` and image block
``bi`` so kernel-layout decisions in ``ops/attention.py`` are grounded in
on-chip measurements rather than guesses.

Usage:
    python tools/kbench.py [--dit-b] [--reps 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


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


def bench_attention(B, N, D, H, reps):
    from ddm_tpu.ops import attention as A

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, N, D), dt)
    sc = jnp.ones((D,), jnp.float32)
    bi_ = jnp.zeros((D,), jnp.float32)
    wqkv = (jax.random.normal(ks[1], (D, 3 * D), jnp.float32) * 0.02)
    bqkv = jnp.zeros((3 * D,), jnp.float32)
    wproj = (jax.random.normal(ks[2], (D, D), jnp.float32) * 0.02)
    bproj = jnp.zeros((D,), jnp.float32)
    do = jax.random.normal(ks[3], (B, N, D), dt)
    args = (x, sc, bi_, wqkv, bqkv, wproj, bproj)

    def loss_fn(*a):
        return jnp.sum(A.fused_attention_block(*a, H=H).astype(jnp.float32) * do.astype(jnp.float32))

    fwd = jax.jit(lambda *a: A.fused_attention_block(*a, H=H))
    vg = jax.jit(jax.grad(loss_fn, argnums=tuple(range(7))))

    t_f = _timeit(fwd, *args, reps=reps)
    t_b = _timeit(vg, *args, reps=reps)
    print(f"attn CURRENT dispatch: fwd {t_f:.3f} ms  fwd+bwd {t_b:.3f} ms",
          flush=True)

    orig_choose = A._choose_blocks
    results = {}
    combos = [(2, 16), (2, 32), (2, 8), (4, 8), (4, 32), (8, 16)]
    for g, bi_cap in combos:
        if g * N > 512 or B % bi_cap or bi_cap < g:
            continue

        def patched(Bx, Nx, Dx, dtype_bytes=2, _g=g, _bi=bi_cap):
            return _bi, _g

        A._choose_blocks = patched
        try:
            # fresh jit wrappers -> fresh trace picks up the patched blocks
            f2 = jax.jit(lambda *a: A.fused_attention_block(*a, H=H))
            vg2 = jax.jit(jax.grad(loss_fn, argnums=tuple(range(7))))
            t_f = _timeit(f2, *args, reps=reps)
            t_b = _timeit(vg2, *args, reps=reps)
            results[(g, bi_cap)] = (t_f, t_b)
            print(f"attn g={g} bi={bi_cap}: fwd {t_f:.3f} ms  "
                  f"fwd+bwd {t_b:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"attn g={g} bi={bi_cap}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        finally:
            A._choose_blocks = orig_choose
    return results


def bench_mlp(B, N, D, reps):
    from ddm_tpu.ops import mlp_block as M

    T = B * N
    F = 4 * D
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (T, D), dt)
    sc = jnp.ones((D,), jnp.float32)
    bi_ = jnp.zeros((D,), jnp.float32)
    w1 = jax.random.normal(ks[1], (D, F), jnp.float32) * 0.02
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jax.random.normal(ks[2], (F, D), jnp.float32) * 0.02
    b2 = jnp.zeros((D,), jnp.float32)
    do = jax.random.normal(ks[3], (T, D), dt)
    args = (x, sc, bi_, w1, b1, w2, b2)

    def loss_fn(*a):
        return jnp.sum(M.fused_mlp_block(*a).astype(jnp.float32) * do.astype(jnp.float32))

    fwd = jax.jit(lambda *a: M.fused_mlp_block(*a))
    vg = jax.jit(jax.grad(loss_fn, argnums=tuple(range(7))))
    t_f = _timeit(fwd, *args, reps=reps)
    t_b = _timeit(vg, *args, reps=reps)
    print(f"mlp CURRENT dispatch: fwd {t_f:.3f} ms  fwd+bwd {t_b:.3f} ms",
          flush=True)


def bench_expert_ffn(B, N, D, reps, experts=8, group=256, cap_f=1.25):
    """Expert-FFN kernel vs the jnp/XLA reference at the MoE production
    shape (ROOFLINE 4a's numbers, reproducible from one command)."""
    from ddm_tpu.ops import expert_ffn as X

    T = B * N
    F = 4 * D
    G = T // group
    cap = int(-(-group * cap_f // experts))
    S = G * cap
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (experts, S, D), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (experts, D, F), jnp.float32) * 0.02
    b1 = jnp.zeros((experts, F), jnp.float32)
    w2 = jax.random.normal(ks[2], (experts, F, D), jnp.float32) * 0.02
    b2 = jnp.zeros((experts, D), jnp.float32)
    do = jax.random.normal(ks[3], (experts, S, D), jnp.bfloat16)
    args = (x, w1, b1, w2, b2)
    gflop = 2 * 2 * experts * S * D * F / 1e9

    for name, fn in (("kernel", X.expert_ffn_auto),
                     ("jnp/XLA", X.expert_ffn_reference)):
        def loss_fn(*a, _fn=fn):
            return jnp.sum(_fn(*a).astype(jnp.float32)
                           * do.astype(jnp.float32))

        fwd = jax.jit(lambda *a, _fn=fn: _fn(*a))
        vg = jax.jit(jax.grad(loss_fn, argnums=tuple(range(5))))
        t_f = _timeit(fwd, *args, reps=reps)
        t_b = _timeit(vg, *args, reps=reps)
        print(f"expert_ffn {name}: fwd {t_f:.3f} ms ({gflop/t_f:.0f} TF/s)  "
              f"fwd+bwd {t_b:.3f} ms", flush=True)
    print("(standalone gap understates the in-program one: inside the "
          "train step XLA fuses layout converts into these einsums and "
          "re-reads the saved hidden activations in the backward — "
          "ROOFLINE 4a has the trace-bucketed numbers)", flush=True)


def _marginal_ms(fn, args, iters_lo=8, iters_hi=24):
    """True per-iteration cost of ``fn`` by the MARGINAL-rate method.

    Through the axon remote-TPU relay every compiled-program dispatch
    carries ~25 ms of launch latency that per-call timing cannot separate,
    and even a chained ``fori_loop`` only amortises it 1/iters. Two chain
    lengths give the slope, which cancels every fixed cost (dispatch,
    argument fetch, the scalar-sync readback)."""

    def chained(iters):
        @jax.jit
        def run(*a):
            def body(_, carry):
                out = fn(carry, *a[1:])
                leaf = jax.tree.leaves(out)[0]
                return carry + 1e-6 * leaf[..., :1].astype(carry.dtype)
            return jax.lax.fori_loop(0, iters, body, a[0])
        return run

    times = []
    for iters in (iters_lo, iters_hi):
        run = chained(iters)
        float(jnp.sum(run(*args)))  # compile + one execution
        best = float("inf")
        for _ in range(3):  # min-of-3: one relay hiccup cannot skew the slope
            t0 = time.perf_counter()
            float(jnp.sum(run(*args)))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    return (times[1] - times[0]) / (iters_hi - iters_lo) * 1e3


def bench_flash(N, H, Dh, B=8):
    """Streaming flash tier vs XLA attention at long sequence (N >= 1024)."""
    from ddm_tpu.ops import attention as A
    from ddm_tpu.ops import flash as F

    D = H * Dh
    assert F.flash_supported(B, N, D, H), (B, N, D, H)
    tiles = F._tile_sizes(N, Dh)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, N, D), jnp.bfloat16) for kk in ks)
    fwd_gflop = 4 * B * N * N * D / 1e9          # QK^T + PV
    tot_gflop = 3.5 * fwd_gflop                  # + 5 bwd matmuls

    def grad_of(fn):
        loss = lambda q, k, v: jnp.sum(fn(q, k, v, H).astype(jnp.float32)
                                       ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))

    if N > 4096:
        tiles = (tiles, F._windowed_fwd_tiles(N, Dh),
                 F._windowed_bwd_tiles(N, Dh))
    print(f"flash: B={B} N={N} H={H} Dh={Dh} tiles(fwd,bwd)={tiles}",
          flush=True)
    variants = [("flash", F.flash_attention_streaming)]
    if N <= 4096:  # the XLA oracle materialises B*H*N^2 fp32 scores
        variants.append(("xla", lambda q, k, v, H: A.attention_reference(
            q, k, v, H)))
    for name, fn in variants:
        t_f = _marginal_ms(lambda q, k, v, fn=fn: fn(q, k, v, H), (q, k, v))
        t_b = _marginal_ms(grad_of(fn), (q, k, v))
        print(f"  {name:6s} fwd {t_f:8.3f} ms ({fwd_gflop/t_f:6.1f} TF/s)  "
              f"fwd+bwd {t_b:8.3f} ms ({tot_gflop/t_b:6.1f} TF/s)",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dit-b", action="store_true")
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--skip-mlp", action="store_true")
    ap.add_argument("--skip-attention", action="store_true")
    ap.add_argument("--moe", action="store_true",
                    help="also bench the expert-FFN kernel vs its XLA "
                         "reference at the MoE production shape")
    ap.add_argument("--flash", type=int, default=0, metavar="N",
                    help="bench the streaming flash tier (marginal-rate "
                         "method) at sequence length N (>= 1024) instead "
                         "of the short-sequence half-block kernels")
    ap.add_argument("--flash-heads", type=int, default=0,
                    help="override the head count for --flash at Dh=64 "
                         "(e.g. 3 = the DiT-S --tp 2 shard: odd local "
                         "heads exercise the phantom-head pad path)")
    args = ap.parse_args()

    if args.flash:
        # marginal-rate method: --reps does not apply (chain lengths are
        # fixed); batch is bench_flash's default, printed in its header
        D, H = (768, 12) if args.dit_b else (384, 6)
        if args.flash_heads:
            H, D = args.flash_heads, args.flash_heads * 64
        bench_flash(args.flash, H, D // H)
        return

    B, N = 2048, 64
    D, H = (768, 12) if args.dit_b else (384, 6)
    print(f"shapes: B={B} N={N} D={D} H={H} on {jax.devices()[0]}", flush=True)
    if not args.skip_attention:
        bench_attention(B, N, D, H, args.reps)
    if not args.skip_mlp:
        bench_mlp(B, N, D, args.reps)
    if args.moe:
        bench_expert_ffn(B, N, D, args.reps)


if __name__ == "__main__":
    main()
