"""Fused MoE dispatch prologue / combine epilogue Pallas kernels.

Capability context: the reference has no MoE at all (its FeedForward is a
dense two-matmul GELU MLP, ``/root/reference/dddm/model.py:156-166``); the
MoE layer is this repo's capability addition (``ddm_tpu.models.moe``).
These kernels attack the measured overhead ABOVE the expert-FFN kernel
(ROOFLINE §4a): at the DiT-S production shape the one-hot dispatch/combine
einsums, their cotangents, the layout converts between them, and the XLA
LN2 backward cost ~30 ms of a 176 ms step. The root cause is HBM traffic:
XLA materialises the ``(G, gs, E, C)`` one-hot dispatch and combine
tensors (~170 MB each per MoE block in fp32) plus the LN output, reads
them back in the backward, and pays convert/transpose passes between.

The fused design never lets a one-hot tensor touch HBM:

  * **moe_dispatch** — one kernel over the group grid ``(G,)`` computing
    LN2 -> router matmul -> softmax -> top-k -> capacity queue -> the
    dispatch matmul, emitting the expert slot rows ``xin (E, G*Cp, D)``
    directly in the layout ``ddm_tpu.ops.expert_ffn`` consumes, plus
    compact routing state: slot positions ``pos (G, gs, E)`` and gates
    ``(G, gs, 2)`` (~9 MB total vs ~340 MB of one-hot residuals). The
    router ``probs (G, gs, E)`` tensor stays a backward residual; the
    aux-loss statistics leave as in-kernel ``(1, E)`` sums.
  * **Queue positions via triangular matmul**: the per-group cumulative
    count that assigns capacity slots is ``L @ onehot`` with ``L`` the
    in-kernel lower-triangular ones matrix — an MXU matmul instead of the
    VPU-sequential ``jnp.cumsum`` (whose recompute cost made
    ``jax.checkpoint`` around routing a measured dead end, ROOFLINE §4a).
    The one-hot dispatch block is rebuilt from ``pos`` wherever needed by
    an iota compare (exact fp32 integer equality), so backward passes
    recompute it in VMEM for free instead of reading 170 MB.
  * **moe_combine** — the epilogue: rebuilds the gate-scaled combine
    block from ``(pos, gates)`` and contracts it with the expert outputs,
    ``part = (g1*dd1 + g2*dd2) @ out`` per group.
  * **Hand-written VJPs** for both ops (the LayerNorm/router/softmax/
    gate-renormalisation backward chain runs in-kernel; ``dwr``/``dbr``/
    ``dscale``/``dbias`` accumulate into grid-constant fp32 VMEM blocks,
    the ``ddm_tpu.ops.mlp_block`` discipline).

The expert FFN between the two ops stays ``expert_ffn_auto`` with its
existing tiers. Capacity semantics, top-1/top-2 queueing (second choices
after first choices), gate renormalisation, and the 1e-9/1e-6 stabilisers
match ``ddm_tpu.models.moe.MoEMLP``'s einsum path bit-for-bit in structure
(fp32 routing; parity tests in ``tests/test_moe_dispatch.py``). The slot
dim is padded to ``Cp = roundup(cap, 8)`` for sublane alignment; padded
slots are never matched by the ``c < cap`` mask, so drop behaviour is
unchanged (the expert FFN runs on the padded rows; their outputs carry
zero combine weight).

Replicated path only: under expert parallelism (``tp_axis`` set) the
einsum path with its f/g collective discipline remains in force.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp_block import _ln, _pallas_call
from .pallas_config import kernels_enabled

__all__ = ["MoEDispatchCfg", "moe_dispatch", "moe_dispatch_thru",
           "moe_combine", "moe_combine_res", "moe_dispatch_ok"]


class MoEDispatchCfg(NamedTuple):
    """Static routing geometry (hashable: rides custom_vjp nondiff args)."""

    gs: int          # routing group size (rows)
    cap: int         # logical per-expert capacity per group
    cpad: int        # slot-dim padding: roundup(cap, 8)
    num_experts: int
    topk: int        # 1 (Switch) or 2 (GShard)
    cdt: str         # compute dtype name for matmul operands ("bfloat16")


def _cdt(cfg: MoEDispatchCfg):
    return jnp.dtype(cfg.cdt)


# Raised scoped-vmem cap for the routing kernels (default 16 MB; v5e has
# 128 MB physical) — the group-batched blocks are sized against 20 MB in
# `_groups_per_block` and Mosaic's stack estimate varies a few hundred KB
# with surrounding-program layouts.
_VMEM32 = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def _build_dd(pos, cap: int, cpad: int, dtype):
    """One-hot dispatch block ``(gs, E*Cp)`` from slot positions.

    ``dd[t, e*Cp + c] = 1`` iff token ``t`` holds slot ``c`` of expert
    ``e``; rebuilt by iota compare (``pos`` holds exact small integers in
    fp32: -1 off-route, >= cap dropped — neither matches a slot id).
    ``pos_full`` (pos broadcast slot-wise) comes from a tiny selection
    matmul rather than a lane gather.
    """
    gs, E = pos.shape
    ecp = E * cpad
    col = jax.lax.broadcasted_iota(jnp.int32, (gs, ecp), 1)
    c_id = col - (col // cpad) * cpad
    sel = (jax.lax.broadcasted_iota(jnp.int32, (E, ecp), 1) // cpad
           == jax.lax.broadcasted_iota(jnp.int32, (E, ecp), 0)
           ).astype(jnp.float32)
    pos_full = jnp.dot(pos, sel, preferred_element_type=jnp.float32)
    return ((pos_full == c_id.astype(jnp.float32))
            & (c_id < cap)).astype(dtype)


def _route(probs, cfg: MoEDispatchCfg, cdt):
    """Shared fwd routing: (pos1, pos2, gates (gs, 2)) from router probs."""
    gs, E = probs.shape
    eids = jax.lax.broadcasted_iota(jnp.int32, (gs, E), 1)
    idx1 = jnp.argmax(probs, axis=-1)[:, None]
    oh1 = (eids == idx1).astype(jnp.float32)
    p1v = jnp.max(probs, axis=-1, keepdims=True)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (gs, gs), 0)
           >= jax.lax.broadcasted_iota(jnp.int32, (gs, gs), 1)).astype(cdt)
    cum1 = jnp.dot(tri, oh1.astype(cdt), preferred_element_type=jnp.float32)
    pos1 = cum1 * oh1 - 1.0
    if cfg.topk == 1:
        return pos1, jnp.full_like(pos1, -1.0), jnp.concatenate(
            [p1v, jnp.zeros_like(p1v)], axis=1)
    # top-2: mask the first choice, re-argmax; second choices queue after
    # ALL of the group's first choices (cnt1 offset) so slots never collide
    probs_m = jnp.where(oh1 > 0, -jnp.inf, probs)
    idx2 = jnp.argmax(probs_m, axis=-1)[:, None]
    p2v = jnp.max(probs_m, axis=-1, keepdims=True)
    oh2 = (eids == idx2).astype(jnp.float32)
    cnt1 = jnp.sum(oh1, axis=0, keepdims=True)
    cum2 = jnp.dot(tri, oh2.astype(cdt),
                   preferred_element_type=jnp.float32) + cnt1
    pos2 = cum2 * oh2 - 1.0
    denom = p1v + p2v + 1e-9
    return pos1, pos2, jnp.concatenate([p1v / denom, p2v / denom], axis=1)


def _softmax(logits):
    mx = jnp.max(logits, axis=-1, keepdims=True)
    ex = jnp.exp(logits - mx)
    return ex / jnp.sum(ex, axis=-1, keepdims=True)


# ---------------------------------------------------------------- dispatch

def _dispatch_fwd_kernel(x_ref, s_ref, b_ref, wr_ref, br_ref,
                         xin_ref, gates_ref, p1_ref, p2_ref, probs_ref,
                         cnt_ref, psum_ref, *, cfg: MoEDispatchCfg, gb: int):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)
        psum_ref[:] = jnp.zeros_like(psum_ref)

    cdt = _cdt(cfg)
    E, cpad, gs = cfg.num_experts, cfg.cpad, cfg.gs
    D = x_ref.shape[-1]
    # LN + router + softmax batched over the gb groups of the block (the
    # per-group grid was measured VPU/latency-bound at ~2 us a step: 512
    # steps of (256, 8)-shaped work; batching amortises it 4-8x)
    xf = x_ref[:].astype(jnp.float32)
    y, _, _ = _ln(xf, s_ref[:], b_ref[:])
    yb = y.astype(cdt)  # bf16 rounding point matches the einsum path
    logits = jnp.dot(yb.astype(jnp.float32), wr_ref[:],
                     preferred_element_type=jnp.float32) + br_ref[:]
    probs = _softmax(logits)
    probs_ref[:] = probs.reshape(gb, gs, E)
    # Switch aux-loss statistics, accumulated in-kernel so the XLA side
    # never touches a (G, gs, E) tensor (E-minor layouts are lane-padded
    # 16x on TPU; the r5 trace charged ~3 ms/step to that path): psum is
    # the per-expert sum of router probs, cnt the pre-capacity
    # first-choice count (pos >= 0 includes capacity-dropped tokens,
    # matching the einsum path's pre-capacity one-hot).
    psum_ref[:] += jnp.sum(probs, axis=0, keepdims=True)
    cnt_local = jnp.zeros((1, E), jnp.float32)
    for j in range(gb):  # queueing is per routing group by definition
        pos1, pos2, gates = _route(probs[j * gs:(j + 1) * gs], cfg, cdt)
        p1_ref[j] = pos1
        p2_ref[j] = pos2
        gates_ref[j] = gates
        cnt_local += jnp.sum((pos1 >= 0).astype(jnp.float32), axis=0,
                             keepdims=True)
        dd = _build_dd(pos1, cfg.cap, cpad, cdt)
        if cfg.topk == 2:
            dd = dd + _build_dd(pos2, cfg.cap, cpad, cdt)  # slots disjoint
        xin = jax.lax.dot_general(  # dd^T @ yb, no materialised transpose
            dd, yb[j * gs:(j + 1) * gs], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        xin_ref[:, j * cpad:(j + 1) * cpad, :] = (
            xin.reshape(E, cpad, D).astype(xin_ref.dtype))
    cnt_ref[:] += cnt_local


def _dispatch_bwd_kernel(*refs, cfg: MoEDispatchCfg, gb: int,
                         with_dres: bool):
    if with_dres:
        (x_ref, s_ref, b_ref, wr_ref, p1_ref, p2_ref, probs_ref,
         dxin_ref, dgates_ref, dpsum_ref, dres_ref,
         dx_ref, ds_ref, db_ref, dwr_ref, dbr_ref) = refs
    else:
        (x_ref, s_ref, b_ref, wr_ref, p1_ref, p2_ref, probs_ref,
         dxin_ref, dgates_ref, dpsum_ref,
         dx_ref, ds_ref, db_ref, dwr_ref, dbr_ref) = refs
        dres_ref = None

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (ds_ref, db_ref, dwr_ref, dbr_ref):
            r[:] = jnp.zeros_like(r)

    cdt = _cdt(cfg)
    E, cpad, gs = cfg.num_experts, cfg.cpad, cfg.gs
    D = x_ref.shape[-1]
    xf = x_ref[:].astype(jnp.float32)
    y, xhat, inv = _ln(xf, s_ref[:], b_ref[:])
    yb = y.astype(cdt)
    pos1 = p1_ref[:].reshape(gb * gs, E)
    pos2 = p2_ref[:].reshape(gb * gs, E)
    probs = probs_ref[:].reshape(gb * gs, E)

    # cotangent of the LN output through the dispatch copy (per group:
    # the one-hot block is group-local), everything after is batched
    dyb_parts = []
    for j in range(gb):
        dd = _build_dd(p1_ref[j], cfg.cap, cpad, cdt)
        if cfg.topk == 2:
            dd = dd + _build_dd(p2_ref[j], cfg.cap, cpad, cdt)
        dxin = dxin_ref[:, j * cpad:(j + 1) * cpad, :].reshape(
            E * cpad, D).astype(cdt)
        dyb_parts.append(
            jnp.dot(dd, dxin, preferred_element_type=jnp.float32))
    dyb = (dyb_parts[0] if gb == 1
           else jnp.concatenate(dyb_parts, axis=0))

    # gate cotangents -> router probs; dpsum is the cotangent of the
    # in-kernel per-expert prob sums (the aux-loss path) — uniform over
    # rows, so it broadcasts straight into dprobs. probs itself is a
    # backward RESIDUAL only, not a primal output (r5: exposing it as an
    # output made every backward materialise and DMA a (G, gs, E) fp32
    # zeros cotangent — ~4 MB/block/step of dead traffic at the
    # production shape), so its only cotangent source is dpsum.
    dprobs_base = jnp.broadcast_to(dpsum_ref[:], (gb * gs, E))
    dg = dgates_ref[:].reshape(gb * gs, 2)
    oh1 = (pos1 >= 0).astype(jnp.float32)
    if cfg.topk == 1:
        dprobs = dprobs_base + dg[:, 0][:, None] * oh1
    else:
        oh2 = (pos2 >= 0).astype(jnp.float32)
        p1v = jnp.sum(probs * oh1, axis=-1, keepdims=True)
        p2v = jnp.sum(probs * oh2, axis=-1, keepdims=True)
        s = p1v + p2v + 1e-9
        dg1 = dg[:, 0][:, None]
        dg2 = dg[:, 1][:, None]
        inv_s2 = 1.0 / (s * s)
        dp1 = (dg1 * (p2v + 1e-9) - dg2 * p2v) * inv_s2
        dp2 = (dg2 * (p1v + 1e-9) - dg1 * p1v) * inv_s2
        dprobs = dprobs_base + dp1 * oh1 + dp2 * oh2

    # softmax + router matmul backward
    dlogits = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                        keepdims=True))
    dwr_ref[:] += jax.lax.dot_general(
        yb.astype(jnp.float32), dlogits, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbr_ref[:] += jnp.sum(dlogits, axis=0, keepdims=True)
    dy = dyb + jax.lax.dot_general(  # dlogits @ wr^T
        dlogits, wr_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # LayerNorm backward (the mlp_block discipline)
    ds_ref[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[:] += jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * s_ref[:]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dxv = inv * (dxhat - m1 - xhat * m2)
    if dres_ref is not None:
        # thru path: x's residual-stream cotangent (= the block-output
        # cotangent) joins the LN-path cotangent here, in fp32, instead
        # of as a full-HBM XLA add of the two kernel outputs
        dxv = dxv + dres_ref[:].astype(jnp.float32)
    dx_ref[:] = dxv.astype(dx_ref.dtype)


def _groups_per_block(cfg: MoEDispatchCfg, G: int, D: int,
                      with_res: bool = True) -> int:
    """Routing groups handled per grid step. The per-group grid is
    latency/VPU-bound (~2 us of (gs, E)-shaped work a step); batching
    groups amortises it. Picks the largest power-of-two divisor of ``G``
    whose conservative VMEM estimate (fp32 row-block temporaries, the
    lane-padded routing tensors, the double-buffered xin window, the
    triangular + one-hot blocks) fits the raised 32 MB scoped budget.
    ``with_res`` charges the residual window + fp32 temp that only the
    residual-carrying calls (combine_res, dispatch-bwd with dres)
    actually hold — kernels without a residual operand keep the larger
    gb where that term is the marginal one."""
    gs, E, cpad = cfg.gs, cfg.num_experts, cfg.cpad
    cb = jnp.dtype(cfg.cdt).itemsize
    for gb in (8, 4, 2, 1):
        if G % gb:
            continue
        est = (
            16 * gb * gs * D                # xf/y/xhat/dy fp32 temporaries
            + 8 * gb * gs * 128             # E- and 2-lane-padded tensors
            + 4 * E * gb * cpad * D * cb    # xin window, double-buffered
            + 4 * gs * (gs + E * cpad)      # tri + one-hot blocks
            + 12 * D * 128                  # wr window + LN vec residents
            + (10 * gb * gs * D if with_res else 0)
        )                                   # residual window + f32 temp
        if est < 20 * 1024 * 1024:          # (combine_res fwd / bwd dres)
            return gb
    return 1


def _dispatch_specs(cfg: MoEDispatchCfg, T: int, D: int,
                    with_res: bool = True):
    gs, E, cpad = cfg.gs, cfg.num_experts, cfg.cpad
    G = T // gs
    gb = _groups_per_block(cfg, G, D, with_res=with_res)
    return dict(
        G=G, gb=gb,
        x=pl.BlockSpec((gb * gs, D), lambda g: (g, 0),
                       memory_space=pltpu.VMEM),
        vecD=pl.BlockSpec((1, D), lambda g: (0, 0), memory_space=pltpu.VMEM),
        wr=pl.BlockSpec((D, E), lambda g: (0, 0), memory_space=pltpu.VMEM),
        vecE=pl.BlockSpec((1, E), lambda g: (0, 0), memory_space=pltpu.VMEM),
        xin=pl.BlockSpec((E, gb * cpad, D), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
        gE=pl.BlockSpec((gb, gs, E), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM),
        g2=pl.BlockSpec((gb, gs, 2), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def moe_dispatch(cfg: MoEDispatchCfg, x, scale, bias, wr, br):
    """Fused LN2 + router + top-k capacity dispatch.

    ``x (T, D)`` pre-LN rows -> ``(xin (E, G*Cp, D) cdt, gates (G, gs, 2)
    fp32, pos1/pos2 (G, gs, E) fp32, cnt (1, E) fp32, psum (1, E)
    fp32)``. ``pos*`` are piecewise-constant routing state (no gradient,
    matching the einsum path where one-hot construction goes through int
    argmax/astype); ``gates`` carries the router's differentiable path.
    ``cnt``/``psum`` are the Switch aux-loss statistics accumulated
    in-kernel (pre-capacity first-choice counts and per-expert prob
    sums): ``cnt`` is piecewise-constant, ``psum``'s cotangent broadcasts
    into dprobs inside the backward kernel so the aux loss costs no
    (G, gs, E) XLA math in either direction. The router ``probs`` tensor
    is a backward RESIDUAL only, never a primal output — exposing it made
    every backward materialise a (G, gs, E) fp32 zeros cotangent.
    """
    out, _ = _dispatch_fwd_split(_dispatch_fwd_call(
        cfg, x, scale, bias, wr, br))
    return out


def _dispatch_fwd_split(kout):
    """(primal outputs, probs residual) from the 7 kernel outputs."""
    xin, gates, pos1, pos2, probs, cnt, psum = kout
    return (xin, gates, pos1, pos2, cnt, psum), probs


def _dispatch_fwd_call(cfg, x, scale, bias, wr, br):
    T, D = x.shape
    sp = _dispatch_specs(cfg, T, D, with_res=False)
    G, gs, E, cpad = sp["G"], cfg.gs, cfg.num_experts, cfg.cpad
    return _pallas_call(
        functools.partial(_dispatch_fwd_kernel, cfg=cfg, gb=sp["gb"]),
        out_shape=(
            jax.ShapeDtypeStruct((E, G * cpad, D), _cdt(cfg)),
            jax.ShapeDtypeStruct((G, gs, 2), jnp.float32),
            jax.ShapeDtypeStruct((G, gs, E), jnp.float32),
            jax.ShapeDtypeStruct((G, gs, E), jnp.float32),
            jax.ShapeDtypeStruct((G, gs, E), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
        ),
        grid=(G // sp["gb"],),
        in_specs=[sp["x"], sp["vecD"], sp["vecD"], sp["wr"], sp["vecE"]],
        out_specs=(sp["xin"], sp["g2"], sp["gE"], sp["gE"], sp["gE"],
                   sp["vecE"], sp["vecE"]),
        compiler_params=_VMEM32,
    )(x, scale.reshape(1, D), bias.reshape(1, D),
      wr.astype(jnp.float32), br.reshape(1, E).astype(jnp.float32))


def _moe_dispatch_fwd(cfg, x, scale, bias, wr, br):
    out, probs = _dispatch_fwd_split(
        _dispatch_fwd_call(cfg, x, scale, bias, wr, br))
    _, gates, pos1, pos2, _cnt, _psum = out
    return out, (x, scale, bias, wr, br, pos1, pos2, probs)


def _dispatch_bwd_call(cfg, res, dxin, dgates, dpsum, dres=None):
    x, scale, bias, wr, br, pos1, pos2, probs = res
    T, D = x.shape
    E = cfg.num_experts
    sp = _dispatch_specs(cfg, T, D, with_res=dres is not None)
    in_specs = [sp["x"], sp["vecD"], sp["vecD"], sp["wr"],
                sp["gE"], sp["gE"], sp["gE"],
                sp["xin"], sp["g2"], sp["vecE"]]
    operands = (x, scale.reshape(1, D), bias.reshape(1, D),
                wr.astype(jnp.float32), pos1, pos2, probs,
                dxin, dgates,
                dpsum.reshape(1, E).astype(jnp.float32))
    if dres is not None:
        in_specs.append(sp["x"])
        operands = operands + (dres,)
    dx, ds, db, dwr, dbr = _pallas_call(
        functools.partial(_dispatch_bwd_kernel, cfg=cfg, gb=sp["gb"],
                          with_dres=dres is not None),
        out_shape=(
            jax.ShapeDtypeStruct((T, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, E), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
        ),
        grid=(sp["G"] // sp["gb"],),
        in_specs=in_specs,
        out_specs=(sp["x"], sp["vecD"], sp["vecD"], sp["wr"], sp["vecE"]),
        compiler_params=_VMEM32,
    )(*operands)
    return (dx, ds.reshape(scale.shape).astype(scale.dtype),
            db.reshape(bias.shape).astype(bias.dtype),
            dwr.astype(wr.dtype),
            dbr.reshape(br.shape).astype(br.dtype))


def _moe_dispatch_bwd(cfg, res, cts):
    # pos/cnt cotangents are meaningless (piecewise-constant outputs)
    dxin, dgates, _dp1, _dp2, _dcnt, dpsum = cts
    return _dispatch_bwd_call(cfg, res, dxin, dgates, dpsum)


moe_dispatch.defvjp(_moe_dispatch_fwd, _moe_dispatch_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def moe_dispatch_thru(cfg: MoEDispatchCfg, x, scale, bias, wr, br):
    """``moe_dispatch`` plus a pass-through of ``x`` as the last output,
    for callers whose residual stream IS the dispatch input (the DiT
    block). The pass-through costs nothing forward (the primal output is
    the input array itself, no kernel write); in the backward the
    pass-through's cotangent — the block-output cotangent arriving via
    ``moe_combine_res``'s identity residual gradient — is folded into
    ``dx`` inside the backward kernel in fp32, replacing the full-HBM
    XLA join add of the two gradient paths of ``x`` (the r5 trace
    charged ~0.31 ms/block to that ``add_any``). Only valid because the
    residual and the dispatch input are the same autodiff variable:
    summing their cotangents at ``dx`` is exactly the total gradient."""
    out, _ = _dispatch_fwd_split(
        _dispatch_fwd_call(cfg, x, scale, bias, wr, br))
    return (*out, x)


def _moe_dispatch_thru_fwd(cfg, x, scale, bias, wr, br):
    out, res = _moe_dispatch_fwd(cfg, x, scale, bias, wr, br)
    return (*out, x), res


def _moe_dispatch_thru_bwd(cfg, res, cts):
    dxin, dgates, _dp1, _dp2, _dcnt, dpsum, dthru = cts
    x = res[0]
    return _dispatch_bwd_call(cfg, res, dxin, dgates, dpsum,
                              dres=dthru.astype(x.dtype))


moe_dispatch_thru.defvjp(_moe_dispatch_thru_fwd, _moe_dispatch_thru_bwd)


# ----------------------------------------------------------------- combine

def _combine_fwd_kernel(*refs, cfg: MoEDispatchCfg, gb: int,
                        with_res: bool):
    if with_res:
        out_ref, gates_ref, p1_ref, p2_ref, res_ref, part_ref = refs
    else:
        out_ref, gates_ref, p1_ref, p2_ref, part_ref = refs
        res_ref = None
    E, cpad, gs = cfg.num_experts, cfg.cpad, cfg.gs
    D = out_ref.shape[-1]
    for j in range(gb):
        outf = out_ref[:, j * cpad:(j + 1) * cpad, :].astype(
            jnp.float32).reshape(E * cpad, D)
        g = gates_ref[j]
        cdd = (_build_dd(p1_ref[j], cfg.cap, cpad, jnp.float32)
               * g[:, 0][:, None])
        if cfg.topk == 2:
            cdd = cdd + (_build_dd(p2_ref[j], cfg.cap, cpad, jnp.float32)
                         * g[:, 1][:, None])
        part = jnp.dot(cdd, outf, preferred_element_type=jnp.float32)
        if res_ref is not None:
            # residual added in fp32 AFTER rounding the combine to the
            # compute dtype — the exact op sequence the XLA residual add
            # performed (part.astype(cdt).astype(f32) + res.astype(f32)),
            # so fusing it in-kernel is bitwise-neutral
            part = (part.astype(part_ref.dtype).astype(jnp.float32)
                    + res_ref[j * gs:(j + 1) * gs, :].astype(jnp.float32))
        part_ref[j * gs:(j + 1) * gs, :] = part.astype(part_ref.dtype)


def _combine_bwd_kernel(out_ref, gates_ref, p1_ref, p2_ref, dpart_ref,
                        dout_ref, dgates_ref, *, cfg: MoEDispatchCfg,
                        gb: int):
    E, cpad, gs = cfg.num_experts, cfg.cpad, cfg.gs
    D = out_ref.shape[-1]
    for j in range(gb):
        outf = out_ref[:, j * cpad:(j + 1) * cpad, :].astype(
            jnp.float32).reshape(E * cpad, D)
        dy = dpart_ref[j * gs:(j + 1) * gs, :].astype(jnp.float32)
        g = gates_ref[j]
        dd1 = _build_dd(p1_ref[j], cfg.cap, cpad, jnp.float32)
        acc1 = jnp.dot(dd1, outf, preferred_element_type=jnp.float32)
        dg1 = jnp.sum(acc1 * dy, axis=-1, keepdims=True)
        cdd = dd1 * g[:, 0][:, None]
        if cfg.topk == 2:
            dd2 = _build_dd(p2_ref[j], cfg.cap, cpad, jnp.float32)
            acc2 = jnp.dot(dd2, outf, preferred_element_type=jnp.float32)
            dg2 = jnp.sum(acc2 * dy, axis=-1, keepdims=True)
            cdd = cdd + dd2 * g[:, 1][:, None]
        else:
            dg2 = jnp.zeros_like(dg1)
        dout = jax.lax.dot_general(  # cdd^T @ dy
            cdd, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dout_ref[:, j * cpad:(j + 1) * cpad, :] = (
            dout.reshape(E, cpad, D).astype(dout_ref.dtype))
        dgates_ref[j] = jnp.concatenate([dg1, dg2], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def moe_combine(cfg: MoEDispatchCfg, out, gates, pos1, pos2):
    """Gate-scaled combine: expert outputs ``(E, G*Cp, D)`` -> token rows
    ``(T, D)`` in the compute dtype (no residual — the block adds it in
    fp32, matching the einsum path)."""
    return _combine_fwd_call(cfg, out, gates, pos1, pos2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def moe_combine_res(cfg: MoEDispatchCfg, out, gates, pos1, pos2, res):
    """``moe_combine`` with the block's residual add fused in: returns
    ``(res_f32 + combine_rounded_to_cdt_f32).astype(cdt)`` — the exact op
    sequence the XLA-side residual add performed, moved in-kernel so the
    combine output never round-trips HBM through a convert + add pass
    (the r5 trace charged ~5.7 ms/step to that family at the DiT-S MoE
    production shape). ``res (T, D)`` may be any float dtype (it is read
    as-is and upcast in-kernel); the residual cotangent is the output
    cotangent unchanged."""
    return _combine_fwd_call(cfg, out, gates, pos1, pos2, res)


def _combine_fwd_call(cfg, out, gates, pos1, pos2, res=None):
    E, S, D = out.shape
    G = S // cfg.cpad
    sp = _dispatch_specs(cfg, G * cfg.gs, D, with_res=res is not None)
    in_specs = [sp["xin"], sp["g2"], sp["gE"], sp["gE"]]
    operands = (out, gates, pos1, pos2)
    if res is not None:
        in_specs.append(sp["x"])
        operands = operands + (res,)
    return _pallas_call(
        functools.partial(_combine_fwd_kernel, cfg=cfg, gb=sp["gb"],
                          with_res=res is not None),
        out_shape=jax.ShapeDtypeStruct((G * cfg.gs, D), _cdt(cfg)),
        grid=(G // sp["gb"],),
        in_specs=in_specs,
        out_specs=sp["x"],
        compiler_params=_VMEM32,
    )(*operands)


def _combine_bwd_call(cfg, out, gates, pos1, pos2, dpart):
    E, S, D = out.shape
    G = S // cfg.cpad
    sp = _dispatch_specs(cfg, G * cfg.gs, D, with_res=False)
    return _pallas_call(
        functools.partial(_combine_bwd_kernel, cfg=cfg, gb=sp["gb"]),
        out_shape=(
            jax.ShapeDtypeStruct(out.shape, out.dtype),
            jax.ShapeDtypeStruct(gates.shape, jnp.float32),
        ),
        grid=(G // sp["gb"],),
        in_specs=[sp["xin"], sp["g2"], sp["gE"], sp["gE"], sp["x"]],
        out_specs=(sp["xin"], sp["g2"]),
        compiler_params=_VMEM32,
    )(out, gates, pos1, pos2, dpart)


def _moe_combine_fwd(cfg, out, gates, pos1, pos2):
    part = _combine_fwd_call(cfg, out, gates, pos1, pos2)
    return part, (out, gates, pos1, pos2)


def _moe_combine_bwd(cfg, res, dpart):
    out, gates, pos1, pos2 = res
    dout, dgates = _combine_bwd_call(cfg, out, gates, pos1, pos2, dpart)
    return dout, dgates, jnp.zeros_like(pos1), jnp.zeros_like(pos2)


moe_combine.defvjp(_moe_combine_fwd, _moe_combine_bwd)


def _moe_combine_res_fwd(cfg, out, gates, pos1, pos2, res):
    part = _combine_fwd_call(cfg, out, gates, pos1, pos2, res)
    # `res` rides the residuals only for its dtype; it aliases the block
    # input already saved by the dispatch VJP, so no extra HBM liveness
    return part, (out, gates, pos1, pos2, res)


def _moe_combine_res_bwd(cfg, resids, dpart):
    out, gates, pos1, pos2, res = resids
    dout, dgates = _combine_bwd_call(cfg, out, gates, pos1, pos2, dpart)
    # d(res) = d(part): the residual enters through a fp32 add and leaves
    # through the cdt rounding — identity to the cotangent
    return (dout, dgates, jnp.zeros_like(pos1), jnp.zeros_like(pos2),
            dpart.astype(res.dtype))


moe_combine_res.defvjp(_moe_combine_res_fwd, _moe_combine_res_bwd)


# ------------------------------------------------------------------- gates

def moe_dispatch_ok(T: int, gs: int, E: int, cap: int, D: int,
                    topk: int) -> bool:
    """Fused-path eligibility. Requirements: TPU (or interpret mode), an
    even group partition, sublane-aligned group size, lane-aligned D, and
    bounded VMEM for the in-kernel triangular matrix + one-hot block
    (fp32 ``gs*gs + 3*gs*E*Cp`` live bytes — the 2048 cap keeps it
    comfortably under budget at every production group size).
    ``DDM_TPU_MOE_DISPATCH=off`` is the measurement escape hatch: it
    forces the einsum dispatch so the kernel's contribution can be A/B'd
    on hardware (ROOFLINE §4a)."""
    import os

    return (
        kernels_enabled()
        and os.environ.get("DDM_TPU_MOE_DISPATCH", "") != "off"
        and topk in (1, 2)
        and 0 < gs <= 2048
        and T % gs == 0
        and gs % 8 == 0
        and D % 128 == 0
        and E >= 2
        and cap >= 1
    )
