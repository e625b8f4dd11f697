"""Expert-batched FFN Pallas kernel for the MoE half-block.

The MoE layer (``ddm_tpu.models.moe``) dispatches tokens into per-expert
slot tensors ``x (E, S, D)`` and runs an independent GELU FFN per expert:

    out[e] = gelu(x[e] @ w1[e] + b1[e]) @ w2[e] + b2[e]

Measured on v5e at the DiT-S production shape (E=8, S=20480, D=384,
F=1536): XLA runs this einsum pair at ~45 TF/s forward and ~9% MFU
backward — it materialises the (E, S, F) hidden activations to HBM
(~0.5 GB per block), re-reads them in the backward, and fuses layout
conversions into the matmuls (the bare matmuls hit >200 TF/s in
isolation). This kernel applies the exact discipline of the dense
half-block kernel (``ddm_tpu.ops.mlp_block``, which this module shares its
GELU/erf helpers with): a row block plus BOTH of the current expert's
weight matrices stay resident in VMEM, the hidden activations never touch
HBM, and the backward recomputes them from the saved input block while
accumulating dW into VMEM-resident fp32 blocks across the sequential
row-grid — re-initialised per expert (grid = (E, S/rb); the row dimension
iterates innermost, so each expert's accumulator blocks flush exactly when
the expert index advances).

No LayerNorm and no residual here: the MoE half applies LN2 before
dispatch and adds the residual after combine (reference parity for the
surrounding structure: /root/reference/dddm/model.py:169-180; the expert
FFN itself is a capability addition with no reference counterpart).

Falls back to the jnp reference off-TPU / unsupported shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp_block import _act, _act_fwd_bwd, _pallas_call, _row_block
from .pallas_config import kernels_enabled

__all__ = ["expert_ffn", "expert_ffn_auto", "expert_ffn_fwd_ok",
           "expert_ffn_ok", "expert_ffn_reference"]


def expert_ffn_reference(x, w1, b1, w2, b2, dtype=jnp.bfloat16):
    """jnp oracle/fallback: per-expert gelu FFN on (E, S, D) slot rows."""
    h = jnp.einsum("esd,edf->esf", x.astype(dtype), w1.astype(dtype),
                   preferred_element_type=jnp.float32)
    g = _act(h + b1[:, None, :], erf=jax.lax.erf).astype(dtype)
    out = jnp.einsum("esf,efd->esd", g, w2.astype(dtype),
                     preferred_element_type=jnp.float32)
    return (out + b2[:, None, :]).astype(dtype)


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[0]
    h = jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32) + b1_ref[0]
    g = _act(h).astype(x_ref.dtype)
    out = jnp.dot(g, w2_ref[0], preferred_element_type=jnp.float32) + b2_ref[0]
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, do_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    # fresh accumulators at each expert's first row block (row grid dim is
    # innermost; the constant-over-rows output blocks flush when e advances)
    @pl.when(pl.program_id(1) == 0)
    def _init():
        for r in (dw1_ref, db1_ref, dw2_ref, db2_ref):
            r[:] = jnp.zeros_like(r)

    x = x_ref[0]
    h = jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32) + b1_ref[0]
    gf, dfac = _act_fwd_bwd(h)
    g = gf.astype(x_ref.dtype)

    do = do_ref[0].astype(jnp.float32)
    dob = do.astype(x_ref.dtype)

    dw2_ref[0] += jax.lax.dot_general(
        g, dob, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2_ref[0] += jnp.sum(do, axis=0, keepdims=True)
    dg = jax.lax.dot_general(  # dO @ W2^T without materialising the transpose
        dob, w2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = dg * dfac
    dhb = dh.astype(x_ref.dtype)

    dw1_ref[0] += jax.lax.dot_general(
        x, dhb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1_ref[0] += jnp.sum(dh, axis=0, keepdims=True)
    dx_ref[0] = jax.lax.dot_general(  # dH @ W1^T
        dhb, w1_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)


def _specs(E, S, D, F, rb):
    row = lambda e, i: (e, i, 0)
    w = lambda e, i: (e, 0, 0)
    return dict(
        x=pl.BlockSpec((1, rb, D), row, memory_space=pltpu.VMEM),
        w1=pl.BlockSpec((1, D, F), w, memory_space=pltpu.VMEM),
        w2=pl.BlockSpec((1, F, D), w, memory_space=pltpu.VMEM),
        # biases ride as (E, 1, F)/(E, 1, D): Mosaic requires the LAST TWO
        # block dims be (8, 128)-divisible or equal the array dims, so a
        # (1, F) block of an (E, F) array is rejected (1 != E)
        vecF=pl.BlockSpec((1, 1, F), w, memory_space=pltpu.VMEM),
        vecD=pl.BlockSpec((1, 1, D), w, memory_space=pltpu.VMEM),
    )


def _fwd_call(x, w1, b1, w2, b2):
    E, S, D = x.shape
    F = w1.shape[2]
    rb = _row_block(S, D, F, fixed=4 * D * F)
    sp = _specs(E, S, D, F, rb)
    return _pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((E, S, D), x.dtype),
        grid=(E, S // rb),
        in_specs=[sp["x"], sp["w1"], sp["vecF"], sp["w2"], sp["vecD"]],
        out_specs=sp["x"],
    )(x, w1.astype(x.dtype), b1.reshape(E, 1, F), w2.astype(x.dtype),
      b2.reshape(E, 1, D))


@jax.custom_vjp
def expert_ffn(x, w1, b1, w2, b2):
    """Per-expert GELU FFN ``(E, S, D) -> (E, S, D)`` as one Pallas kernel.

    ``w1 (E, D, F)``, ``b1 (E, F)``, ``w2 (E, F, D)``, ``b2 (E, D)`` may be
    fp32 (cast to ``x.dtype`` for the matmul operands; fp32 accumulation
    and fp32 dW — the dense half-block kernel's numerics class). Gate with
    :func:`expert_ffn_ok` and fall back to :func:`expert_ffn_reference`.
    """
    return _fwd_call(x, w1, b1, w2, b2)


def _expert_ffn_fwd(x, w1, b1, w2, b2):
    return _fwd_call(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _expert_ffn_bwd(res, do):
    x, w1, b1, w2, b2 = res
    E, S, D = x.shape
    F = w1.shape[2]
    rb = _row_block(S, D, F)
    sp = _specs(E, S, D, F, rb)
    dx, dw1, db1, dw2, db2 = _pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((E, S, D), x.dtype),
            jax.ShapeDtypeStruct((E, D, F), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, F), jnp.float32),
            jax.ShapeDtypeStruct((E, F, D), jnp.float32),
            jax.ShapeDtypeStruct((E, 1, D), jnp.float32),
        ),
        grid=(E, S // rb),
        in_specs=[sp["x"], sp["w1"], sp["vecF"], sp["w2"], sp["x"]],
        out_specs=(sp["x"], sp["w1"], sp["vecF"], sp["w2"], sp["vecD"]),
        # The per-expert weight + dW windows are double-buffered (index
        # maps change over the expert grid dim), so the resident set sits
        # right at Mosaic's default 16 MB scoped-vmem line and the final
        # few hundred KB vary with SURROUNDING-program layouts (see the
        # _row_block comment). Raise the per-kernel cap: v5e VMEM is
        # 128 MB and this kernel's true live set is ~16-17 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(x, w1.astype(x.dtype), b1.reshape(E, 1, F), w2.astype(x.dtype), do)
    return (dx, dw1.astype(w1.dtype), db1.reshape(E, F).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(E, D).astype(b2.dtype))


expert_ffn.defvjp(_expert_ffn_fwd, _expert_ffn_bwd)


def expert_ffn_ok(E: int, S: int, D: int, F: int) -> bool:
    """Same VMEM discipline as the dense kernel's gate: 12*D*F bytes of
    weight+dW residents in the backward plus the row block's live tensors
    must fit; degenerate row blocks fall back (the jnp path is better than
    an 8-row MXU grid)."""
    rb = _row_block(S, D, F)
    return (
        kernels_enabled()
        and D % 128 == 0
        and F % 128 == 0
        and S % rb == 0
        and rb >= 64
        and 12 * D * F + rb * (D * 8 + F * 8) < 15 * 1024 * 1024
    )


# Large-width tier (MoE at DiT-B width and beyond): at D=768/F=3072 the
# backward's 12*D*F = 28 MB of weight+dW residents cannot fit, exactly as
# for the dense half-block — the same split applies: Pallas FORWARD (one
# HBM round trip), XLA backward over the saved inputs (autodiff of the
# jnp reference).
#
# One expert-specific twist: the per-expert weight windows CHANGE across
# the expert grid dim, so Mosaic DOUBLE-BUFFERS them (the dense kernel's
# weights are constant over its whole grid and stay single-buffered) —
# the measured scoped-vmem stack at D=768/F=3072 is 18.75 MB ≈
# 2 * 4*D*F regardless of the row block. The budget below therefore
# charges 8*D*F for the weight pair, and past that wall the forward
# F-chunks: out = sum_c gelu(x @ w1[:,c] + b1[c]) @ w2[c,:] + b2 (GELU is
# elementwise over hidden columns, so chunking is exact), k passes of a
# partial kernel with fp32 partial sums added in XLA — the dense path's
# `_mlp_fwd_fchunks` scheme.
def _fwd_partial_kernel(x_ref, w1_ref, b1_ref, w2_ref, o_ref):
    x = x_ref[0]
    h = jnp.dot(x, w1_ref[0], preferred_element_type=jnp.float32) + b1_ref[0]
    g = _act(h).astype(x_ref.dtype)
    o_ref[0] = jnp.dot(g, w2_ref[0], preferred_element_type=jnp.float32)


def _expert_fwd_fchunks(S: int, D: int, F: int) -> int:
    """Smallest power-of-two F-chunk count whose forward kernel fits under
    the double-buffered weight budget (1 = unchunked; 0 = nothing fits)."""
    k = 1
    while k <= 8:
        fc = F // k
        if F % (k * 128) == 0:
            rb = _row_block(S, D, fc, fixed=8 * D * fc)
            if (S % rb == 0
                    and 8 * D * fc + rb * (D * 8 + fc * 8)
                    < 15 * 1024 * 1024):
                return k
        k *= 2
    return 0


def _fwd_call_chunked(x, w1, b1, w2, b2, k):
    E, S, D = x.shape
    F = w1.shape[2]
    fc = F // k
    acc = None
    for c in range(k):
        w1c = w1[:, :, c * fc:(c + 1) * fc]
        b1c = b1[:, c * fc:(c + 1) * fc]
        w2c = w2[:, c * fc:(c + 1) * fc, :]
        rb = _row_block(S, D, fc, fixed=8 * D * fc)
        sp = _specs(E, S, D, fc, rb)
        part = _pallas_call(
            _fwd_partial_kernel,
            out_shape=jax.ShapeDtypeStruct((E, S, D), jnp.float32),
            grid=(E, S // rb),
            in_specs=[sp["x"], sp["w1"], sp["vecF"], sp["w2"]],
            out_specs=sp["x"],
        )(x, w1c.astype(x.dtype), b1c.reshape(E, 1, fc), w2c.astype(x.dtype))
        acc = part if acc is None else acc + part
    return (acc + b2[:, None, :]).astype(x.dtype)


@jax.custom_vjp
def _expert_ffn_fwdonly(x, w1, b1, w2, b2):
    k = _expert_fwd_fchunks(x.shape[1], x.shape[2], w1.shape[2])
    return (_fwd_call(x, w1, b1, w2, b2) if k == 1
            else _fwd_call_chunked(x, w1, b1, w2, b2, k))


def _expert_ffn_fwdonly_fwd(x, w1, b1, w2, b2):
    return _expert_ffn_fwdonly(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _expert_ffn_fwdonly_bwd(res, do):
    x = res[0]
    _, vjp = jax.vjp(
        lambda *a: expert_ffn_reference(*a, dtype=x.dtype), *res
    )
    return vjp(do.astype(x.dtype))


_expert_ffn_fwdonly.defvjp(_expert_ffn_fwdonly_fwd, _expert_ffn_fwdonly_bwd)


def expert_ffn_fwd_ok(E: int, S: int, D: int, F: int) -> bool:
    return (
        kernels_enabled()
        and D % 128 == 0
        and F % 128 == 0
        and _expert_fwd_fchunks(S, D, F) > 0
    )


def expert_ffn_auto(x, w1, b1, w2, b2, dtype=jnp.bfloat16):
    """Tier dispatch: fully-fused kernel when the backward residents fit,
    fused forward + XLA backward at DiT-B+ widths, jnp reference
    otherwise. Differentiable on every path."""
    E, S, D = x.shape
    F = w1.shape[2]
    if expert_ffn_ok(E, S, D, F):
        return expert_ffn(x, w1, b1, w2, b2)
    if expert_ffn_fwd_ok(E, S, D, F):
        return _expert_ffn_fwdonly(x, w1, b1, w2, b2)
    return expert_ffn_reference(x, w1, b1, w2, b2, dtype=dtype)
