"""Audit the XLA MLP backward against its matmul bounds (VERDICT r2 item 2).

At DiT-B/L widths the MLP half-block runs a fused Pallas FORWARD and an
XLA backward (``ops/mlp_block._fused_fwdonly``); ROOFLINE r2 attributed
~335 ms of the DiT-B step to "XLA MLP backward + dW matmuls" without a
bound table. This tool isolates that backward at the production row shape
and prints achieved vs bound per direction:

  phases (all contractions >= D deep -> the 197 TF/s deep-matmul bound):
    recompute  h = y @ W1            2*T*D*F
    dg  = dO @ W2^T                  2*T*D*F
    dW2 = g^T @ dO                   2*T*D*F
    dh  = dg * gelu'(h)              VPU
    dW1 = y^T @ dh                   2*T*D*F
    dy  = dh @ W1^T                  2*T*D*F
  plus LN fwd/bwd + exact-erf GELU fwd/bwd on the VPU (measured at DiT-S:
  0.70 ms/block for the erf alone, ROOFLINE §2).

Timing is fwd+bwd minus fwd (same program-subtraction method as
tools/kbench.py); sync is by scalar value fetch (relay-safe).

Usage:  python tools/audit_mlp_bwd.py [--dim 768 --mlp-ratio 4 --rows 131072]
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


def timed(fn, sync, iters=20):
    fn()  # compile
    sync()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        sync()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--mlp-ratio", type=float, default=4.0)
    ap.add_argument("--rows", type=int, default=131072,
                    help="token rows per step (batch*m*N = 2048*64 default)")
    ap.add_argument("--peak", type=float, default=197.0,
                    help="bf16 deep-matmul bound, TFLOP/s")
    args = ap.parse_args()

    from ddm_tpu.ops import mlp_block as M

    T, D = args.rows, args.dim
    F = int(D * args.mlp_ratio)
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(T, D)), dt)
    s = jnp.ones((D,), jnp.float32)
    b = jnp.zeros((D,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(D, F)) / np.sqrt(D), dt)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, D)) / np.sqrt(F), dt)
    b2 = jnp.zeros((D,), jnp.float32)
    argsv = (x, s, b, w1, b1, w2, b2)

    ref = lambda *a: M.mlp_block_reference(*a, dtype=dt)

    out = {"store": None}

    def run_fwd():
        out["store"] = jax.jit(ref)(*argsv)

    loss = jax.jit(lambda *a: jnp.sum(ref(*a).astype(jnp.float32)))
    grad = jax.jit(jax.grad(
        lambda *a: jnp.sum(ref(*a).astype(jnp.float32)),
        argnums=(0, 1, 2, 3, 4, 5, 6)))

    def run_loss():
        out["store"] = loss(*argsv)

    def run_vag():
        out["store"] = grad(*argsv)

    def sync():
        leaf = jax.tree.leaves(out["store"])[0]
        float(jnp.asarray(leaf).ravel()[0])

    t_fwd = timed(run_loss, sync)
    t_vag = timed(run_vag, sync)
    t_bwd = t_vag - t_fwd

    flops_per_matmul = 2.0 * T * D * F
    fwd_flops = 2 * flops_per_matmul
    bwd_flops = 5 * flops_per_matmul  # recompute + dg + dW2 + dW1 + dy
    bound_bwd_ms = bwd_flops / (args.peak * 1e12) * 1e3
    bound_fwd_ms = fwd_flops / (args.peak * 1e12) * 1e3

    print(f"shape: T={T} D={D} F={F}  ({flops_per_matmul/1e9:.0f} GFLOP "
          f"per contraction)")
    print(f"XLA fwd   : {t_fwd*1e3:8.2f} ms   bound {bound_fwd_ms:7.2f} ms "
          f"-> {bound_fwd_ms/t_fwd/1e3*100:5.1f}% of 197 TF/s")
    print(f"XLA bwd   : {t_bwd*1e3:8.2f} ms   bound {bound_bwd_ms:7.2f} ms "
          f"-> {bound_bwd_ms/t_bwd/1e3*100:5.1f}% of 197 TF/s")
    print(f"(fwd+bwd  : {t_vag*1e3:8.2f} ms; backward = subtraction; "
          f"achieved bwd {bwd_flops/t_bwd/1e12:.1f} TF/s)")

    # Also time the PRODUCTION dispatch (fused fwd kernel + XLA bwd) for
    # the same shape, so the fwd-kernel contribution is visible.
    prod_grad = jax.jit(jax.grad(
        lambda *a: jnp.sum(M.fused_mlp_block(*a).astype(jnp.float32)),
        argnums=(0, 3, 5)))

    def run_prod():
        out["store"] = prod_grad(*argsv)

    t_prod = timed(run_prod, sync)
    print(f"production (fused fwd + XLA bwd) fwd+bwd: {t_prod*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
