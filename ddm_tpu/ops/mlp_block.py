"""Fused transformer-MLP half-block Pallas kernel: x + W2 gelu(W1 LN(x)).

Motivation (measured on v5e): the DiT block's LayerNorms and the
(tokens, 4*dim) GELU hidden activations are pure HBM bandwidth — XLA keeps
each as a separate kernel with full round trips. This kernel keeps a block
of token rows plus BOTH weight matrices resident in VMEM and fuses

    out = x + gelu(LN(x) @ W1 + b1) @ W2 + b2

into one pass (fp32 LayerNorm statistics and matmul accumulation, bf16
matmul operands — identical numerics class to the unfused flax path,
LN eps = 1e-6 to match ``flax.linen.LayerNorm``; exact erf GELU computed in
fp32, matching ``nn.gelu(approximate=False)``). ``DDM_TPU_FAST_GELU=1``
opts in to the sigmoid GELU approximation in kernels AND fallbacks — a
documented deviation from reference numerics (see pallas_config).

Backward (``jax.custom_vjp``) recomputes the forward intermediates from the
saved input block (cheap; avoids storing the hidden activations in HBM) and
accumulates the weight gradients across the sequential TPU grid into
VMEM-resident fp32 output blocks with constant index maps — six 2-D matmuls
plus the standard LayerNorm backward per block.

Falls back to a jnp reference implementation off-TPU / unsupported shapes.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_config import fast_gelu_enabled, interpret_mode, kernels_enabled


def _pallas_call(*args, **kwargs):
    """pallas_call honouring the DDM_TPU_PALLAS_INTERPRET test knob."""
    return pl.pallas_call(*args, interpret=interpret_mode(), **kwargs)

__all__ = [
    "fused_mlp_block",
    "fused_mlp_partial",
    "mlp_block_reference",
    "mlp_partial_reference",
]

_LN_EPS = 1e-6
_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _ln(xf: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = xc * inv
    return xhat * scale + bias, xhat, inv


def _erf_poly(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.26 rational erf (|err| < 1.5e-7).

    Mosaic has no ``erf`` lowering; this keeps the kernel's GELU within
    float32 noise of the exact-erf GELU the reference/XLA path uses.
    """
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + p * z)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-z * z)
    return s * y


def _gelu(h: jnp.ndarray, erf=jax.lax.erf) -> jnp.ndarray:
    return 0.5 * h * (1.0 + erf(h * _INV_SQRT2))


def _dgelu(h: jnp.ndarray, erf=jax.lax.erf) -> jnp.ndarray:
    return 0.5 * (1.0 + erf(h * _INV_SQRT2)) + h * _INV_SQRT2PI * jnp.exp(
        -0.5 * h * h
    )


# Opt-in sigmoid GELU (DDM_TPU_FAST_GELU=1; see pallas_config.fast_gelu_
# enabled for the contract). x*sigmoid(1.702x) is the standard sigmoid
# approximation (Hendrycks & Gimpel 2016 eq. 5); one logistic replaces the
# rational erf's divide + 5-term polynomial + exp.
_FAST_GELU_C = 1.702


def _gelu_fast(h: jnp.ndarray) -> jnp.ndarray:
    return h * jax.nn.sigmoid(_FAST_GELU_C * h)


def _dgelu_fast(h: jnp.ndarray) -> jnp.ndarray:
    s = jax.nn.sigmoid(_FAST_GELU_C * h)
    return s * (1.0 + _FAST_GELU_C * h * (1.0 - s))


def _act(h: jnp.ndarray, erf=_erf_poly) -> jnp.ndarray:
    """GELU honoring the trace-time fast-gelu switch."""
    return _gelu_fast(h) if fast_gelu_enabled() else _gelu(h, erf=erf)


def _act_fwd_bwd(h: jnp.ndarray):
    """(gelu(h), gelu'(h)) with the transcendental shared between them."""
    if fast_gelu_enabled():
        s = jax.nn.sigmoid(_FAST_GELU_C * h)
        return h * s, s * (1.0 + _FAST_GELU_C * h * (1.0 - s))
    # one erf evaluation shared by the GELU recompute and its derivative
    # (bit-identical to calling _gelu/_dgelu separately; saves a full
    # rational-erf pass incl. divide+exp on the (rb, F) fp32 block)
    erf_h = _erf_poly(h * _INV_SQRT2)
    half_cdf = 0.5 * (1.0 + erf_h)
    dg = half_cdf + h * _INV_SQRT2PI * jnp.exp(-0.5 * h * h)
    return 0.5 * h * (1.0 + erf_h), dg


def mlp_block_reference(x, scale, bias, w1, b1, w2, b2, dtype=jnp.bfloat16):
    """jnp oracle/fallback; numerics match flax LN(fp32)+Dense(bf16)+gelu."""
    xf = x.astype(jnp.float32)
    y, _, _ = _ln(xf, scale, bias)
    y = y.astype(dtype)
    h = (
        jnp.dot(y, w1.astype(dtype), preferred_element_type=jnp.float32)
        + b1
    )
    g = _act(h, erf=jax.lax.erf).astype(dtype)
    out = (
        jnp.dot(g, w2.astype(dtype), preferred_element_type=jnp.float32)
        + b2
    )
    return x + out.astype(x.dtype)


def _fwd_kernel(x_ref, s_ref, bb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    xf = x_ref[:].astype(jnp.float32)
    y, _, _ = _ln(xf, s_ref[:], bb_ref[:])
    y = y.astype(x_ref.dtype)
    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    g = _act(h).astype(x_ref.dtype)
    out = jnp.dot(g, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[:] = (xf + out).astype(o_ref.dtype)


def _bwd_body(x_ref, s_ref, bb_ref, w1_ref, b1_ref, w2_ref, do_ref,
              dx_ref, ds_ref, db_ref, dw1_ref, db1_ref, dw2_ref,
              db2_ref, residual: bool):
    """Shared backward body; ``db2_ref=None``/``residual=False`` selects the
    tensor-parallel partial variant (no output bias, no residual)."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        accs = [ds_ref, db_ref, dw1_ref, db1_ref, dw2_ref]
        if db2_ref is not None:
            accs.append(db2_ref)
        for r in accs:
            r[:] = jnp.zeros_like(r)

    xf = x_ref[:].astype(jnp.float32)
    yf, xhat, inv = _ln(xf, s_ref[:], bb_ref[:])
    y = yf.astype(x_ref.dtype)
    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    gf, dfac = _act_fwd_bwd(h)
    g = gf.astype(x_ref.dtype)

    do = do_ref[:].astype(jnp.float32)
    dob = do.astype(x_ref.dtype)

    # second matmul
    dw2_ref[:] += jax.lax.dot_general(
        g, dob, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if db2_ref is not None:
        db2_ref[:] += jnp.sum(do, axis=0, keepdims=True)
    dg = jax.lax.dot_general(  # dO @ W2^T without materialising the transpose
        dob, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = dg * dfac
    dhb = dh.astype(x_ref.dtype)

    # first matmul
    dw1_ref[:] += jax.lax.dot_general(
        y, dhb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1_ref[:] += jnp.sum(dh, axis=0, keepdims=True)
    dy = jax.lax.dot_general(  # dH @ W1^T
        dhb, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # LayerNorm backward
    ds_ref[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * s_ref[:]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = inv * (dxhat - m1 - xhat * m2)

    dx_ref[:] = ((do + dx_ln) if residual else dx_ln).astype(dx_ref.dtype)


def _bwd_kernel(x_ref, s_ref, bb_ref, w1_ref, b1_ref, w2_ref, b2_ref, do_ref,
                dx_ref, ds_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    _bwd_body(x_ref, s_ref, bb_ref, w1_ref, b1_ref, w2_ref, do_ref,
              dx_ref, ds_ref, db_ref, dw1_ref, db1_ref, dw2_ref,
              db2_ref, residual=True)


def _partial_bwd_kernel(x_ref, s_ref, bb_ref, w1_ref, b1_ref, w2_ref, do_ref,
                        dx_ref, ds_ref, db_ref, dw1_ref, db1_ref, dw2_ref):
    _bwd_body(x_ref, s_ref, bb_ref, w1_ref, b1_ref, w2_ref, do_ref,
              dx_ref, ds_ref, db_ref, dw1_ref, db1_ref, dw2_ref,
              None, residual=False)


def _vmem_mb() -> int:
    """Per-kernel scoped-vmem cap (MB) for this module's pallas_calls.

    Mosaic's default check line is 16 MB, but v5e has 128 MB of VMEM and
    ``CompilerParams(vmem_limit_bytes=...)`` raises the line per kernel
    (``expert_ffn.py`` has shipped at 32 MB since r4). Bigger caps admit
    bigger row blocks — fewer sequential grid steps. Measured on v5e
    (tools/exp_vmem_blocks.py): the backward pays ~2.3 us/grid-step of
    overhead, so rb 256 -> 1024 at the DiT-S shape is worth ~0.9 ms per
    half-block invocation. ``DDM_TPU_MLP_VMEM_MB=16`` restores the
    r4-and-earlier default-cap behaviour exactly.
    """
    import os

    return int(os.environ.get("DDM_TPU_MLP_VMEM_MB", "16"))


def _bwd_budget() -> int:
    # 4 MB headroom under the cap: rb=512 at D=384/F=1536 under the 16 MB
    # default compiled in SOME programs but hit 17.0/16.0 MB scoped-vmem in
    # others (Mosaic stack allocation varies with surrounding-program
    # layouts). The backward holds the most live state, so it keeps the
    # widest margin.
    return (_vmem_mb() - 4) * 1024 * 1024


def _fwd_budget() -> int:
    # forward kernels have far less live state: 1 MB headroom suffices
    # (rb=512 forward measured clean everywhere under the 16 MB default).
    return (_vmem_mb() - 1) * 1024 * 1024


def _compiler_params():
    """Raised scoped-vmem cap for pallas_call, or None at the default."""
    mb = _vmem_mb()
    if mb == 16:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=mb * 1024 * 1024)


def _row_block(T: int, D: int, F: int, fixed: Optional[int] = None) -> int:
    import os

    rb = 1024
    while T % rb != 0 and rb > 8:
        rb //= 2
    # Budget: fixed VMEM residents (both weight matrices bf16 + both fp32
    # grad accumulators in the backward kernel = 12*D*F bytes) plus the row
    # block's activations must stay inside VMEM (budgets parameterised by
    # the scoped-vmem cap — see _vmem_mb).
    #
    # Escape hatch for programs that still trip Mosaic's scoped-vmem
    # check (layout-dependent): DDM_TPU_MLP_ROW_BLOCK caps rb directly, so
    # a user hitting the compile error can drop to 256 without code edits.
    if fixed is None:
        budget = _bwd_budget()
        fixed = 12 * D * F
    else:
        budget = _fwd_budget()
    while rb > 8 and fixed + rb * (D * 8 + F * 8) > budget:
        rb //= 2
    cap = int(os.environ.get("DDM_TPU_MLP_ROW_BLOCK", "0"))
    while cap and rb > cap and rb > 8:
        rb //= 2
    return rb


# Forward-only VMEM footprint: just the two bf16 weight matrices resident —
# no fp32 dW accumulators. This is what lets DiT-B (D=768, F=3072: weights
# 9.4 MB, 12*D*F = 28 MB) keep a fully-fused FORWARD kernel even though the
# accumulate-in-VMEM backward cannot fit; see fused_mlp_block_fwdonly.
def _fwd_fixed(D: int, F: int) -> int:
    return 4 * D * F


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused(x, scale, bias, w1, b1, w2, b2):
    return _fused_fwd_call(x, scale, bias, w1, b1, w2, b2)


def _specs(T, D, F, rb, dtype):
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    return dict(
        x=pl.BlockSpec((rb, D), row, memory_space=pltpu.VMEM),
        vecD=pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        vecF=pl.BlockSpec((1, F), const, memory_space=pltpu.VMEM),
        w1=pl.BlockSpec((D, F), const, memory_space=pltpu.VMEM),
        w2=pl.BlockSpec((F, D), const, memory_space=pltpu.VMEM),
    )


def _fused_fwd_call(x, scale, bias, w1, b1, w2, b2):
    T, D = x.shape
    F = w1.shape[1]
    # forward never holds dW accumulators, so it always gets the bigger
    # forward-only row block (matters at DiT-B widths)
    rb = _row_block(T, D, F, fixed=_fwd_fixed(D, F))
    sp = _specs(T, D, F, rb, x.dtype)
    return _pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((T, D), x.dtype),
        grid=(T // rb,),
        in_specs=[sp["x"], sp["vecD"], sp["vecD"], sp["w1"], sp["vecF"],
                  sp["w2"], sp["vecD"]],
        out_specs=sp["x"],
        compiler_params=_compiler_params(),
    )(x, scale.reshape(1, D), bias.reshape(1, D), w1.astype(x.dtype),
      b1.reshape(1, F), w2.astype(x.dtype), b2.reshape(1, D))


def _fused_fwd(x, scale, bias, w1, b1, w2, b2):
    out = _fused_fwd_call(x, scale, bias, w1, b1, w2, b2)
    return out, (x, scale, bias, w1, b1, w2, b2)


def _fused_bwd(res, do):
    x, scale, bias, w1, b1, w2, b2 = res
    T, D = x.shape
    F = w1.shape[1]
    rb = _row_block(T, D, F)
    sp = _specs(T, D, F, rb, x.dtype)
    outs = _pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, D), x.dtype),        # dx
            jax.ShapeDtypeStruct((1, D), jnp.float32),    # dscale
            jax.ShapeDtypeStruct((1, D), jnp.float32),    # dbias
            jax.ShapeDtypeStruct((D, F), jnp.float32),    # dw1
            jax.ShapeDtypeStruct((1, F), jnp.float32),    # db1
            jax.ShapeDtypeStruct((F, D), jnp.float32),    # dw2
            jax.ShapeDtypeStruct((1, D), jnp.float32),    # db2
        ),
        grid=(T // rb,),
        in_specs=[sp["x"], sp["vecD"], sp["vecD"], sp["w1"], sp["vecF"],
                  sp["w2"], sp["vecD"], sp["x"]],
        out_specs=(
            sp["x"],
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=_compiler_params(),
    )(x, scale.reshape(1, D), bias.reshape(1, D), w1.astype(x.dtype),
      b1.reshape(1, F), w2.astype(x.dtype), b2.reshape(1, D), do)
    dx, ds, db, dw1, db1, dw2, db2 = outs
    return (dx, ds.reshape(D), db.reshape(D), dw1, db1.reshape(F),
            dw2, db2.reshape(D))


_fused.defvjp(_fused_fwd, _fused_bwd)


def _mlp_kernel_ok(T: int, D: int, F: int) -> bool:
    rb = _row_block(T, D, F)
    return (
        kernels_enabled()
        and D % 128 == 0
        and F % 128 == 0
        and T % rb == 0
        # rb < 64 means the 12*D*F residents squeezed the row block down
        # to near-nothing (e.g. TP local F at DiT-B width): an 8-row
        # matmul uses 1/16 of the MXU's sublanes and the grid degenerates
        # to T/8 sequential steps — the fwd-only tier (weights-only
        # residents, big row blocks) is strictly better there.
        and rb >= 64
        and 12 * D * F + rb * (D * 8 + F * 8) < _bwd_budget() + 3 * 1024 * 1024
    )


def _mlp_fwd_kernel_ok(T: int, D: int, F: int) -> bool:
    rb = _row_block(T, D, F, fixed=_fwd_fixed(D, F))
    return (
        kernels_enabled()
        and D % 128 == 0
        and F % 128 == 0
        and T % rb == 0
        and _fwd_fixed(D, F) + rb * (D * 8 + F * 8) < _fwd_budget()
    )


# Large-width variant (DiT-B and beyond): fused FORWARD kernel, XLA
# backward. The in-VMEM backward needs 12*D*F bytes of weight+dW residents,
# which at D=768/F=3072 is 28 MB — no row block fits. A chunked-dW Pallas
# backward cannot win either: accumulating (D, F) fp32 gradients across the
# T/rb sequential grid steps from HBM costs ~2*(D*F*4)*T/rb bytes of extra
# traffic (≈ 4.8 GB at the CIFAR DiT-B shape), and a two-pass recompute
# scheme burns ~2 extra forward-MLP FLOP sets (~2.5 TFLOP/step) — both
# worse than XLA's stock backward. So past the VMEM wall the right split is
# kernel-forward (one HBM round trip instead of five) + XLA backward over
# the saved inputs.
@jax.custom_vjp
def _fused_fwdonly(x, scale, bias, w1, b1, w2, b2):
    return _fused_fwd_call(x, scale, bias, w1, b1, w2, b2)


def _fused_fwdonly_fwd(x, scale, bias, w1, b1, w2, b2):
    out = _fused_fwd_call(x, scale, bias, w1, b1, w2, b2)
    return out, (x, scale, bias, w1, b1, w2, b2)


def _fused_fwdonly_bwd(res, do):
    x = res[0]
    _, vjp = jax.vjp(
        lambda *a: mlp_block_reference(*a, dtype=x.dtype), *res
    )
    return vjp(do)


_fused_fwdonly.defvjp(_fused_fwdonly_fwd, _fused_fwdonly_bwd)


# F-chunked forward (DiT-L and beyond; VERDICT r2 item 1): at D=1024 /
# F=4096 even the weights-only forward residents are 4*D*F = 16.8 MB, so
# the one-shot forward kernel gates off and r2 left the whole half-block
# to XLA (five HBM round trips). Splitting the hidden axis into k column
# chunks — out = x + b2 + sum_c gelu(LN(x) @ w1[:,c] + b1[c]) @ w2[c,:] —
# brings the residents down to 4*D*F/k per pass at the cost of k-1 extra
# LN recomputes (pure VPU, negligible) and k fp32 partial outputs summed
# in XLA. Each pass reuses the TP partial-product kernel verbatim; the
# backward stays XLA over the saved inputs, exactly like _fused_fwdonly.
def _mlp_fwd_fchunks(T: int, D: int, F: int) -> int:
    """Smallest power-of-two F-chunk count whose forward kernel fits
    (1 = unchunked; 0 = nothing fits)."""
    k = 1
    while k <= 8:
        if F % (k * 128) == 0 and _mlp_fwd_kernel_ok(T, D, F // k):
            return k
        k *= 2
    return 0


def _fchunked_fwd_call(x, scale, bias, w1, b1, w2, b2):
    T, D = x.shape
    F = w1.shape[1]
    k = _mlp_fwd_fchunks(T, D, F)
    Fc = F // k
    acc = None
    for c in range(k):
        part = _fused_partial_fwd_call(
            x, scale, bias, w1[:, c * Fc:(c + 1) * Fc],
            b1[c * Fc:(c + 1) * Fc], w2[c * Fc:(c + 1) * Fc, :],
        )
        acc = part if acc is None else acc + part
    out = x.astype(jnp.float32) + acc + b2
    return out.astype(x.dtype)


@jax.custom_vjp
def _fused_fwdonly_fchunked(x, scale, bias, w1, b1, w2, b2):
    return _fchunked_fwd_call(x, scale, bias, w1, b1, w2, b2)


def _fused_fwdonly_fchunked_fwd(x, scale, bias, w1, b1, w2, b2):
    out = _fchunked_fwd_call(x, scale, bias, w1, b1, w2, b2)
    return out, (x, scale, bias, w1, b1, w2, b2)


def _fused_fwdonly_fchunked_bwd(res, do):
    x = res[0]
    _, vjp = jax.vjp(
        lambda *a: mlp_block_reference(*a, dtype=x.dtype), *res
    )
    return vjp(do)


_fused_fwdonly_fchunked.defvjp(_fused_fwdonly_fchunked_fwd,
                               _fused_fwdonly_fchunked_bwd)


def fused_mlp_block(x, scale, bias, w1, b1, w2, b2, persist: bool = False):
    """``x + gelu(LN(x) @ w1 + b1) @ w2 + b2`` over (T, D) token rows.

    Dispatch: fully-fused kernel (fwd + accumulate-in-VMEM bwd) when the
    12*D*F resident budget fits; else fused forward + XLA backward (DiT-B
    widths — see the roofline note on ``_fused_fwdonly``); else the
    F-chunked forward + XLA backward (DiT-L widths); else the jnp
    reference. Differentiable on every path.

    ``persist=True`` — the hybrid persist-residuals tier (ROOFLINE §4): on
    the widths where the in-VMEM backward does NOT fit, skip the
    kernel-forward + recompute-backward pair and run the plain XLA path,
    letting autodiff SAVE the backward residuals (y, h) instead of
    recomputing the half-block forward inside the backward. Audited at the
    DiT-B production shape: XLA fwd 9.38 ms + saved-residual bwd 13.41 ms
    = 22.8 ms/block vs the production kernel-fwd + recompute-bwd 25.4 ms —
    a structural 2.6 ms/block. Measured HBM cost is ~0.43 GiB/block (not
    the analytic 2.6 GB: XLA rematerialises the elementwise chains inside
    the backward fusions and persists essentially one bf16 tensor), so
    every DiT-B block fits at batch 256 — measured 409.7 -> 430.2 img/s
    persisting all 12 (ROOFLINE §4 sweep table). Callers pick N via
    ``DDDMDiT.mlp_persist_blocks``. A no-op on widths where the in-VMEM
    backward fits (DiT-S): that kernel recomputes from VMEM, not HBM, and
    beats both.
    """
    T, D = x.shape
    F = w1.shape[1]
    if _mlp_kernel_ok(T, D, F):
        return _fused(x, scale, bias, w1, b1, w2, b2)
    if persist:
        return mlp_block_reference(x, scale, bias, w1, b1, w2, b2,
                                   dtype=x.dtype)
    if _mlp_fwd_kernel_ok(T, D, F):
        return _fused_fwdonly(x, scale, bias, w1, b1, w2, b2)
    if kernels_enabled() and D % 128 == 0 and _mlp_fwd_fchunks(T, D, F) > 1:
        return _fused_fwdonly_fchunked(x, scale, bias, w1, b1, w2, b2)
    return mlp_block_reference(x, scale, bias, w1, b1, w2, b2, dtype=x.dtype)


# ---------------------------------------------------------------------------
# Tensor-parallel PARTIAL variant: gelu(LN(x) @ w1 + b1) @ w2, returned in
# fp32 WITHOUT the output bias or the residual. Under Megatron-style TP the
# hidden axis is column-sharded (w1 local (D, F/tp), w2 local (F/tp, D)),
# each shard computes this partial product, and the caller psums over the
# model axis before adding b2 + the residual exactly once.
# ---------------------------------------------------------------------------


def mlp_partial_reference(x, scale, bias, w1, b1, w2, dtype=jnp.bfloat16):
    """jnp oracle/fallback for the partial half-block (fp32 output)."""
    xf = x.astype(jnp.float32)
    y, _, _ = _ln(xf, scale, bias)
    y = y.astype(dtype)
    h = (
        jnp.dot(y, w1.astype(dtype), preferred_element_type=jnp.float32)
        + b1
    )
    g = _act(h, erf=jax.lax.erf).astype(dtype)
    return jnp.dot(g, w2.astype(dtype), preferred_element_type=jnp.float32)


def _partial_fwd_kernel(x_ref, s_ref, bb_ref, w1_ref, b1_ref, w2_ref, o_ref):
    xf = x_ref[:].astype(jnp.float32)
    y, _, _ = _ln(xf, s_ref[:], bb_ref[:])
    y = y.astype(x_ref.dtype)
    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    g = _act(h).astype(x_ref.dtype)
    o_ref[:] = jnp.dot(g, w2_ref[:], preferred_element_type=jnp.float32)


@jax.custom_vjp
def _fused_partial(x, scale, bias, w1, b1, w2):
    return _fused_partial_fwd_call(x, scale, bias, w1, b1, w2)


def _fused_partial_fwd_call(x, scale, bias, w1, b1, w2):
    T, D = x.shape
    F = w1.shape[1]
    rb = _row_block(T, D, F, fixed=_fwd_fixed(D, F))
    sp = _specs(T, D, F, rb, x.dtype)
    out32 = pl.BlockSpec((rb, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return _pallas_call(
        _partial_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((T, D), jnp.float32),
        grid=(T // rb,),
        in_specs=[sp["x"], sp["vecD"], sp["vecD"], sp["w1"], sp["vecF"],
                  sp["w2"]],
        out_specs=out32,
        compiler_params=_compiler_params(),
    )(x, scale.reshape(1, D), bias.reshape(1, D), w1.astype(x.dtype),
      b1.reshape(1, F), w2.astype(x.dtype))


def _fused_partial_fwd(x, scale, bias, w1, b1, w2):
    out = _fused_partial_fwd_call(x, scale, bias, w1, b1, w2)
    return out, (x, scale, bias, w1, b1, w2)


def _fused_partial_bwd(res, do):
    x, scale, bias, w1, b1, w2 = res
    T, D = x.shape
    F = w1.shape[1]
    rb = _row_block(T, D, F)
    sp = _specs(T, D, F, rb, x.dtype)
    do32 = pl.BlockSpec((rb, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    outs = _pallas_call(
        _partial_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, D), x.dtype),        # dx
            jax.ShapeDtypeStruct((1, D), jnp.float32),    # dscale
            jax.ShapeDtypeStruct((1, D), jnp.float32),    # dbias
            jax.ShapeDtypeStruct((D, F), jnp.float32),    # dw1
            jax.ShapeDtypeStruct((1, F), jnp.float32),    # db1
            jax.ShapeDtypeStruct((F, D), jnp.float32),    # dw2
        ),
        grid=(T // rb,),
        in_specs=[sp["x"], sp["vecD"], sp["vecD"], sp["w1"], sp["vecF"],
                  sp["w2"], do32],
        out_specs=(sp["x"], const((1, D)), const((1, D)), const((D, F)),
                   const((1, F)), const((F, D))),
        compiler_params=_compiler_params(),
    )(x, scale.reshape(1, D), bias.reshape(1, D), w1.astype(x.dtype),
      b1.reshape(1, F), w2.astype(x.dtype), do.astype(jnp.float32))
    dx, ds, db, dw1, db1, dw2 = outs
    return dx, ds.reshape(D), db.reshape(D), dw1, db1.reshape(F), dw2


_fused_partial.defvjp(_fused_partial_fwd, _fused_partial_bwd)


@jax.custom_vjp
def _fused_partial_fwdonly(x, scale, bias, w1, b1, w2):
    return _fused_partial_fwd_call(x, scale, bias, w1, b1, w2)


def _fused_partial_fwdonly_fwd(x, scale, bias, w1, b1, w2):
    out = _fused_partial_fwd_call(x, scale, bias, w1, b1, w2)
    return out, (x, scale, bias, w1, b1, w2)


def _fused_partial_fwdonly_bwd(res, do):
    x = res[0]
    _, vjp = jax.vjp(
        lambda *a: mlp_partial_reference(*a, dtype=x.dtype), *res
    )
    return vjp(do)


_fused_partial_fwdonly.defvjp(_fused_partial_fwdonly_fwd,
                              _fused_partial_fwdonly_bwd)


def fused_mlp_partial(x, scale, bias, w1, b1, w2):
    """Partial TP half-block over (T, D) rows: fp32 pre-psum product.

    Same dispatch policy as :func:`fused_mlp_block` (minus the F-chunked
    tier: TP already shards the hidden axis, so the local F is F/tp and
    the plain forward kernel fits through DiT-L at tp>=2); differentiable
    on every path. The caller owns ``psum`` + output bias + residual.
    """
    T, D = x.shape
    F = w1.shape[1]
    if _mlp_kernel_ok(T, D, F):
        return _fused_partial(x, scale, bias, w1, b1, w2)
    if _mlp_fwd_kernel_ok(T, D, F):
        return _fused_partial_fwdonly(x, scale, bias, w1, b1, w2)
    return mlp_partial_reference(x, scale, bias, w1, b1, w2, dtype=x.dtype)
