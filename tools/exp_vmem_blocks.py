"""Probe: marginal value of the attention/MLP kernel block sizes.

Times the fused attention half-block and MLP half-block (fwd+bwd) at the
DiT-S production shape under the existing cap hatches
(``DDM_TPU_ATTN_BWD_BI``, ``DDM_TPU_MLP_ROW_BLOCK``). Halving a block
doubles the grid-step count; the measured delta bounds what DOUBLING the
block (which needs a raised scoped-vmem compiler cap) could buy.

Usage: python tools/exp_vmem_blocks.py [--reps 20]
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _timeit(fn, *args, reps=20, warmup=3):
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


def attn(B, N, D, H, reps):
    from ddm_tpu.ops import attention as A
    importlib.reload(A)

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, N, D), dt)
    sc = jnp.ones((D,), jnp.float32)
    bi_ = jnp.zeros((D,), jnp.float32)
    wqkv = jax.random.normal(ks[1], (D, 3 * D), jnp.float32) * 0.02
    bqkv = jnp.zeros((3 * D,), jnp.float32)
    wproj = jax.random.normal(ks[2], (D, D), jnp.float32) * 0.02
    bproj = jnp.zeros((D,), jnp.float32)
    do = jax.random.normal(ks[3], (B, N, D), dt)
    args = (x, sc, bi_, wqkv, bqkv, wproj, bproj)

    def loss_fn(*a):
        return jnp.sum(A.fused_attention_block(*a, H=H).astype(jnp.float32)
                       * do.astype(jnp.float32))

    vg = jax.jit(jax.grad(loss_fn, argnums=tuple(range(7))))
    fwd = jax.jit(lambda *a: A.fused_attention_block(*a, H=H))
    return _timeit(fwd, *args, reps=reps), _timeit(vg, *args, reps=reps)


def mlp(T, D, F, reps):
    from ddm_tpu.ops import mlp_block as M
    importlib.reload(M)

    ks = jax.random.split(jax.random.PRNGKey(1), 8)
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
        return jnp.sum(M.fused_mlp_block(*a).astype(jnp.float32)
                       * do.astype(jnp.float32))

    vg = jax.jit(jax.grad(loss_fn, argnums=tuple(range(7))))
    fwd = jax.jit(lambda *a: M.fused_mlp_block(*a))
    return _timeit(fwd, *args, reps=reps), _timeit(vg, *args, reps=reps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--skip-mlp", action="store_true")
    p.add_argument("--skip-attn", action="store_true")
    p.add_argument("--vmem", action="store_true",
                   help="sweep DDM_TPU_MLP_VMEM_MB (raised scoped-vmem caps)")
    p.add_argument("--dit-b", action="store_true",
                   help="probe the DiT-B width (D=768, F=3072) instead of S")
    p.add_argument("--batch", type=int, default=2048,
                   help="images per step (T = batch * 64 tokens)")
    p.add_argument("--caps", default="16,32,64",
                   help="comma list of DDM_TPU_MLP_VMEM_MB values to sweep")
    a = p.parse_args()

    B, N, D, H, F = a.batch, 64, 384, 6, 1536
    if a.dit_b:
        D, H, F = 768, 12, 3072

    if not a.skip_attn and not a.vmem:
        for cap in ("0", "4", "2"):
            os.environ["DDM_TPU_ATTN_BWD_BI"] = cap
            f, b = attn(B, N, D, H, a.reps)
            print(f"attn  bwd_bi_cap={cap or 'dflt':>4}: fwd {f:7.3f} ms   "
                  f"fwd+bwd {b:7.3f} ms", flush=True)
        os.environ.pop("DDM_TPU_ATTN_BWD_BI", None)

    if not a.skip_mlp and not a.vmem:
        for cap in ("0", "128", "64"):
            os.environ["DDM_TPU_MLP_ROW_BLOCK"] = cap
            f, b = mlp(B * N, D, F, a.reps)
            print(f"mlp   row_block_cap={cap or 'dflt':>4}: fwd {f:7.3f} ms   "
                  f"fwd+bwd {b:7.3f} ms", flush=True)
        os.environ.pop("DDM_TPU_MLP_ROW_BLOCK", None)

    if a.vmem:
        from ddm_tpu.ops import mlp_block as M
        for mb in a.caps.split(","):
            os.environ["DDM_TPU_MLP_VMEM_MB"] = mb
            importlib.reload(M)
            T = B * N
            rbf = M._row_block(T, D, F, fixed=M._fwd_fixed(D, F))
            rbb = M._row_block(T, D, F)
            tier = ("fused-bwd" if M._mlp_kernel_ok(T, D, F) else
                    "fwdonly" if M._mlp_fwd_kernel_ok(T, D, F) else "xla")
            f, b = mlp(T, D, F, a.reps)
            print(f"mlp   vmem_mb={mb:>3} rb_fwd={rbf:>5} rb_bwd={rbb:>5} "
                  f"tier={tier:>9}: fwd {f:7.3f} ms   fwd+bwd {b:7.3f} ms",
                  flush=True)
        os.environ.pop("DDM_TPU_MLP_VMEM_MB", None)


if __name__ == "__main__":
    main()
