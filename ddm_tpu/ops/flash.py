"""Online-softmax flash attention for long sequences (N >= 1024).

The packed kernel in ``ddm_tpu.ops.attention`` materialises the full
(g*N)^2 fp32 score tile in VMEM — ideal at the DiT patch counts it was
built for (N <= 512), impossible beyond: at N = 1024 a single head's
score matrix is already 4 MB and the backward needs several of them.
This module is the long-sequence tier of the dispatch ladder, engaged by
``fused_attention`` when the reference's ``--image-size`` knob
(``/root/reference/train_cifar10_dit.py:378-379``) pushes the token count
past what the packed kernel supports; behavioural contract is the same
plain bidirectional softmax attention with scale = Dh**-0.5
(``/root/reference/dddm/model.py:132-153``).

Design, engineered for the TPU memory hierarchy rather than translated
from any GPU flash kernel:

- Grid ``(B, H // hp)``: one grid step per (image, head group), where a
  head group is ``hp = 128 // Dh`` heads — exactly one 128-lane tile, the
  narrowest block Mosaic accepts (and the natural DMA width). K and V for
  the whole group stay VMEM-resident — at Dh = 64 a group's K is N*256
  bytes in bf16, i.e. 256 KB even at N = 1024 — so unlike HBM-streaming
  GPU designs the ONLY thing that must be tiled is the fp32 score matrix.
- **Head-pair packing**: per q row-tile the hp heads are stacked
  BLOCK-DIAGONALLY over the 128 lanes — ``q_pack`` row-group e holds head
  e's queries in its own Dh-lane band, zeros elsewhere — so the score
  matmul against the group's native ``[k_0 | k_1]`` lane-packed K tile
  contracts over all 128 lanes at once: both heads' (bq, bk) score tiles
  from ONE full-efficiency MXU pass, where per-head slices would contract
  over Dh = 64 lanes at half rate. The same identity makes dv, dp and dk
  single full-width matmuls in the backward. Only the PV product (and dq)
  pay an hp-fold redundancy for lane-crossing garbage that a mask
  discards — and a (bq, bk) @ (bk, 128) product at full rate costs the
  same as the (bq, bk) @ (bk, 64) half-width product it replaces. No
  64-lane register slicing anywhere.
- Inside a grid step a ``lax.fori_loop`` walks (bq, bk) score tiles with
  the running-max/sum online softmax; compile time and VMEM are O(1) in
  N. The tile chooser prefers bk = N (one k tile: the online correction
  degenerates to a single softmax and PV contracts over the whole row),
  with fwd and bwd tiled independently — the backward holds ~4 fp32 score
  tiles live and needs smaller bq.
- Above N = 2048 the q-side tensors no longer fit VMEM-whole (the
  backward holds nine N-length blocks), so the grid gains a third axis
  over COARSE q chunks of ``cq`` rows: q/o (and do/dq in the backward)
  stream one chunk per grid step while K/V windows stay grid-constant
  and dk/dv accumulate into fp32 scratch across the sequential chunk
  steps (re-zeroed at chunk 0, flushed on the last chunk). At N <= 2048
  the chooser picks cq = N — one chunk, the same single-pass structure as
  the ungridded r4 kernel (fine tile sizes may differ: the byte estimator
  was revised alongside, so re-validate tilings on hardware when they
  move). This covers N = 4096 (image-size 256 at patch 4) with the
  single-pass backward.
- Past N = 4096 the single-pass residency walls fall one by one (the
  backward's grid-constant K/V + dk/dv scratch at N = 8192, the
  forward's K/V at N = 16384), so the grid gains a FOURTH axis over K/V
  windows of ``ck`` rows and every residency becomes O(cq + ck) — N is
  then bounded only by HBM:

  * windowed forward: grid (B, G, N/cq, N/ck), window axis innermost;
    the online-softmax state (packed fp32 acc, running m/l) persists in
    VMEM scratch across the sequential window steps of one q chunk,
    initialised at window 0 and flushed to o/lse on the last window.
  * windowed backward: the standard two-kernel split. A dq kernel on the
    same (q-chunk outer, k-window inner) grid accumulates dq in (cq, W)
    fp32 scratch; a dk/dv kernel on the TRANSPOSED grid (k-window outer,
    q-chunk inner) keeps one K/V window grid-constant and accumulates
    dk/dv in (ck, W) fp32 scratch. Each kernel recomputes its score
    tiles from lse — the extra QK^T pass is the price of bounded VMEM,
    exactly the FlashAttention-2 large-N trade.

  The windowed tiers engage ONLY where the single-pass picks fail, so
  hardware-validated tilings at N <= 4096 are untouched. N = 16384
  (image-size 512 at patch 4) is in kernel range; the gate requires N
  divisible by the chunk/window sizes (every power-of-two token count
  from the image-size knob is).
- The forward writes ``lse = m + log(l)`` (shape (B*H/hp, N, hp), fp32):
  the backward rebuilds normalised probabilities per tile as
  exp(s - lse) without a second online pass.
- The backward is ONE kernel on the same grid: dk/dv accumulate into
  full-group fp32 VMEM scratch across the q-tile loop (grid steps are
  sequential on TPU, but these scratches are re-zeroed every step since
  each (image, group) is independent), dq accumulates in the k-tile loop
  carry. dsum = rowsum(dO * O) is computed in-kernel from the saved
  output — no extra XLA pass over HBM.

Head groups are sliced out of the (B, N, H*Dh) layout by the BlockSpec
index map (lane offset hg*128), so the model pays zero transposes around
the kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_config import interpret_mode, kernels_enabled

__all__ = ["flash_attention_streaming", "flash_supported"]

_NEG_BIG = -1e30  # -inf would turn exp(m - m_new) into NaN on the first tile
_LANES = 128


def _pallas_call(*args, **kwargs):
    return pl.pallas_call(*args, interpret=interpret_mode(), **kwargs)


def _heads_per_group(Dh: int) -> int:
    """Heads per 128-lane block (0 if Dh cannot tile lanes exactly)."""
    if Dh >= _LANES:
        return 1 if Dh % _LANES == 0 else 0
    return _LANES // Dh if _LANES % Dh == 0 else 0


def _fwd_bytes(N: int, W: int, hp: int, cq: int, bq: int, bk: int) -> int:
    """VMEM estimate for the forward at one (cq, bq, bk) choice: K/V group
    blocks (grid-constant in the chunk axis but conservatively counted
    double-buffered — Mosaic double-buffers windows whose index_map
    changes anywhere across the grid), q/o chunk blocks double-buffered,
    lse out + 2 fp32 score tiles (s, p) at the packed (hp*bq, bk) shape +
    the fp32 acc carry."""
    kv = 2 * 2 * N * W * 2
    qo = 2 * 2 * cq * W * 2 + 2 * cq * hp * 4
    return kv + qo + 2 * hp * bq * bk * 4 + hp * bq * W * 4


def _bwd_bytes(N: int, W: int, hp: int, cq: int, bq: int, bk: int) -> int:
    """Backward estimate: K/V inputs AND dk/dv outputs double-buffered
    (their index_maps change across (b, g) grid steps, and Mosaic
    double-buffers every window whose index_map changes anywhere across
    the grid — writing only on the last chunk does not exempt them),
    q/do/o inputs + dq output at chunk length, 2 full-group fp32 dk/dv
    scratches, 4 fp32 packed score tiles (s, p, dp, ds) + the packed dq
    carry and q/do packs."""
    kv = 2 * 2 * N * W * 2 + 2 * 2 * N * W * 2
    qblk = 4 * 2 * cq * W * 2 + 2 * cq * hp * 4
    scratch = 2 * N * W * 4
    tiles = 4 * hp * bq * bk * 4 + 3 * hp * bq * W * 4
    return kv + qblk + scratch + tiles


# Leave Mosaic headroom inside the 16 MB VMEM. 14.5 MB admits the
# worst-case composition in range — the N=4096 backward at
# (cq=512, bq=64, bk=256) estimates 14.36 MB with everything counted
# double-buffered, still >1.5 MB under the hard scoped-vmem limit.
_BUDGET = int(14.5 * 1024 * 1024)


def _pick(N: int, W: int, hp: int, estimate) -> tuple:
    """Largest (cq, bq, bk) under the budget: prefer one q chunk (cq = N,
    no cross-grid-step accumulation traffic), then one k tile (bk = N:
    the online correction degenerates to a single softmax and PV
    contracts over the whole row), then larger bq. bq = 64 (still a full
    128-row MXU tile at hp = 2) is a LAST-RESORT second pass so it cannot
    displace the hardware-validated bq >= 128 picks at smaller N."""
    for bq_options in ((512, 256, 128), (64,)):
        for cq in (N, 2048, 1024, 512):
            if cq > N or N % cq:
                continue
            for bk in (N, 1024, 512, 256):
                if bk > N or N % bk:
                    continue
                for bq in bq_options:
                    if bq > cq or cq % bq:
                        continue
                    if estimate(N, W, hp, cq, bq, bk) < _BUDGET:
                        return cq, bq, bk
    return 0, 0, 0


def _tile_sizes(N: int, Dh: int):
    """Single-pass picks ((cq_f, bq_f, bk_f), (cq_b, bq_b, bk_b)) for
    fwd/bwd, each independently (0,0,0) if that direction has no
    single-pass fit (the windowed tiers below take over per direction)."""
    hp = _heads_per_group(Dh)
    if hp == 0:
        return (0, 0, 0), (0, 0, 0)
    W = hp * Dh
    return _pick(N, W, hp, _fwd_bytes), _pick(N, W, hp, _bwd_bytes)


# --- K/V-windowed tiers (N > 4096): every residency is O(cq + ck) ---

def _fwd_win_bytes(W: int, hp: int, cq: int, ck: int, bq: int,
                   bk: int) -> int:
    """Windowed forward: K/V window blocks + q/o chunk blocks (all
    double-buffered), lse out, online-state scratch (packed fp32 acc +
    m/l columns, charged at full 128 lanes — Mosaic pads narrow
    scratch), 2 fp32 score tiles."""
    kv = 2 * 2 * ck * W * 2
    qo = 2 * 2 * cq * W * 2 + 2 * cq * hp * 4
    scr = hp * cq * W * 4 + 2 * hp * cq * _LANES * 4
    tiles = 2 * hp * bq * bk * 4 + hp * bq * W * 4
    return kv + qo + scr + tiles


def _bwd_dq_bytes(W: int, hp: int, cq: int, ck: int, bq: int,
                  bk: int) -> int:
    """dq kernel: K/V windows in, q/do/o chunks + dq chunk out, lse,
    (cq, W) fp32 dq scratch, 4 fp32 score tiles + 3 packs."""
    kv = 2 * 2 * ck * W * 2
    qblk = 4 * 2 * cq * W * 2 + 2 * cq * hp * 4
    scr = cq * W * 4
    tiles = 4 * hp * bq * bk * 4 + 3 * hp * bq * W * 4
    return kv + qblk + scr + tiles


def _bwd_dkv_bytes(W: int, hp: int, cq: int, ck: int, bq: int,
                   bk: int) -> int:
    """dk/dv kernel: K/V windows in + dk/dv windows out, q/do/o chunks,
    lse, 2 (ck, W) fp32 scratches, score tiles + packs."""
    kv = 2 * 2 * ck * W * 2 + 2 * 2 * ck * W * 2
    qblk = 3 * 2 * cq * W * 2 + 2 * cq * hp * 4
    scr = 2 * ck * W * 4
    tiles = 4 * hp * bq * bk * 4 + 3 * hp * bq * W * 4
    return kv + qblk + scr + tiles


def _pick_windowed(N: int, W: int, hp: int, estimates) -> tuple:
    """Largest (cq, ck, bq, bk) with every estimator under budget.
    Larger k windows first (fewer dk/dv flush boundaries and score-tile
    re-reads), then larger q chunks, then larger tiles."""
    for ck in (2048, 1024, 512):
        if ck > N or N % ck:
            continue
        for cq in (1024, 512, 256):
            if cq > N or N % cq:
                continue
            for bk in (1024, 512, 256):
                if bk > ck or ck % bk:
                    continue
                for bq in (256, 128, 64):
                    if bq > cq or cq % bq:
                        continue
                    if all(e(W, hp, cq, ck, bq, bk) < _BUDGET
                           for e in estimates):
                        return cq, ck, bq, bk
    return 0, 0, 0, 0


def _windowed_fwd_tiles(N: int, Dh: int) -> tuple:
    hp = _heads_per_group(Dh)
    if hp == 0:
        return 0, 0, 0, 0
    return _pick_windowed(N, hp * Dh, hp, (_fwd_win_bytes,))


def _windowed_bwd_tiles(N: int, Dh: int) -> tuple:
    hp = _heads_per_group(Dh)
    if hp == 0:
        return 0, 0, 0, 0
    return _pick_windowed(N, hp * Dh, hp, (_bwd_dq_bytes, _bwd_dkv_bytes))


def flash_supported(B: int, N: int, D: int, H: int) -> bool:
    """True when the streaming kernel can run (B, N, H*Dh) attention.

    ``H % hp != 0`` (e.g. an odd local head count on a tensor-parallel
    shard: DiT-S ``--tp 2`` sees H = 3 at Dh = 64) is handled by padding
    the last head group with a PHANTOM zero head rather than falling back
    to XLA — see :func:`flash_attention_streaming`. Tile sizes and VMEM
    residency depend only on (N, Dh), so the gate is unchanged by the pad
    EXCEPT for the redundancy bound: phantom heads are pure waste, so the
    pad path is admitted only while ``pad <= H`` (at most half the
    attention-core work redundant — the measured pad-vs-XLA margin at
    N=1024 is ~2x, so 50% waste is the break-even). Small head dims make
    this real: at Dh = 8 (hp = 16) a single-head shard would pad 15/16 of
    the core — worse than the XLA fallback — and gates off here.
    """
    if H <= 0 or D % H:
        return False
    Dh = D // H
    hp = _heads_per_group(Dh)
    if hp == 0:
        return False
    pad = (-H) % hp
    f, b = _tile_sizes(N, Dh)
    fwd_ok = f[0] > 0 or _windowed_fwd_tiles(N, Dh)[0] > 0
    bwd_ok = b[0] > 0 or _windowed_bwd_tiles(N, Dh)[0] > 0
    return (
        kernels_enabled()
        and N >= 1024
        and pad <= H
        and fwd_ok
        and bwd_ok
    )


def _lane_masks(hp: int, W: int, dtype):
    """mask[e]: (1, W) with ones on head e's Dh-lane band."""
    if hp == 1:
        return [jnp.ones((1, W), dtype)]
    Dh = W // hp
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    return [(lane // Dh == e).astype(dtype) for e in range(hp)]


def _pack_rows(t, masks):
    """(bq, W) tile -> (hp*bq, W) block-diagonal head stack."""
    if len(masks) == 1:
        return t
    return jnp.concatenate([t * m for m in masks], axis=0)


def _unpack_rows(t, masks, bq):
    """(hp*bq, W) -> (bq, W): keep row-group e's own lane band, sum."""
    if len(masks) == 1:
        return t
    return sum(t[e * bq:(e + 1) * bq, :] * masks[e]
               for e in range(len(masks)))


def _tile_probs(s, lse_ref, rows, bq: int, hp: int):
    """Normalised probs exp(s - lse) for a packed (hp*bq, bk) score tile.

    The lse subtraction runs per row group: Mosaic cannot concat
    lane-sliced (bq, 1) vectors across lane offsets, but full-width
    (bq, bk) tiles concat fine."""
    if hp == 1:
        return jnp.exp(s - lse_ref[0, rows, 0:1])
    return jnp.concatenate(
        [jnp.exp(s[e * bq:(e + 1) * bq, :] - lse_ref[0, rows, e:e + 1])
         for e in range(hp)], axis=0)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, hp: int, bq: int,
                bk: int, scale: float):
    # q/o/lse refs hold ONE coarse q chunk (cq rows); k/v the full N.
    _, cq, W = q_ref.shape
    N = k_ref.shape[1]
    nq, nk = cq // bq, N // bk
    dtype = q_ref.dtype
    masks = _lane_masks(hp, W, dtype)

    def q_tile(i, _):
        rows = pl.ds(i * bq, bq)
        qp = _pack_rows(q_ref[0, rows, :], masks)     # (hp*bq, W)

        def k_tile(j, carry):
            m, l, acc = carry
            kslab = pl.ds(j * bk, bk)
            s = jax.lax.dot_general(
                qp, k_ref[0, kslab, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                  # (hp*bq, bk)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            pv = jnp.dot(p.astype(dtype), v_ref[0, kslab, :],
                         preferred_element_type=jnp.float32)
            return m_new, l, acc * corr + pv

        m0 = jnp.full((hp * bq, 1), _NEG_BIG, jnp.float32)
        l0 = jnp.zeros((hp * bq, 1), jnp.float32)
        a0 = jnp.zeros((hp * bq, W), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nk, k_tile, (m0, l0, a0))
        o_ref[0, rows, :] = _unpack_rows(acc / l, masks,
                                         bq).astype(o_ref.dtype)
        lse = m + jnp.log(l)                           # (hp*bq, 1)
        for e in range(hp):
            lse_ref[0, rows, e:e + 1] = lse[e * bq:(e + 1) * bq, :]
        return 0

    jax.lax.fori_loop(0, nq, q_tile, 0)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, dk_s, dv_s, *, hp: int, bq: int,
                bk: int, scale: float):
    # q/do/o/dq refs hold ONE coarse q chunk; k/v/dk/dv the full N. The
    # chunk axis is the innermost grid dim, so chunks of one (image,
    # group) run consecutively: dk/dv accumulate in scratch across them,
    # re-zeroed on chunk 0 and flushed on the last chunk.
    _, cq, W = q_ref.shape
    N = k_ref.shape[1]
    nq, nk = cq // bq, N // bk
    nchunks = N // cq
    chunk = pl.program_id(2)
    dtype = q_ref.dtype
    masks = _lane_masks(hp, W, dtype)
    fmasks = _lane_masks(hp, W, jnp.float32)

    @pl.when(chunk == 0)
    def _zero():
        dk_s[:] = jnp.zeros_like(dk_s)
        dv_s[:] = jnp.zeros_like(dv_s)

    def q_tile(i, _):
        rows = pl.ds(i * bq, bq)
        qp = _pack_rows(q_ref[0, rows, :], masks)
        dop = _pack_rows(do_ref[0, rows, :], masks)
        op = _pack_rows(o_ref[0, rows, :], masks)
        dsum = jnp.sum(dop.astype(jnp.float32) * op.astype(jnp.float32),
                       axis=-1, keepdims=True)         # (hp*bq, 1)

        def k_tile(j, dq_acc):
            kslab = pl.ds(j * bk, bk)
            kt = k_ref[0, kslab, :]
            s = jax.lax.dot_general(
                qp, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = _tile_probs(s, lse_ref, rows, bq, hp)
            pb = p.astype(dtype)
            dv_s[kslab, :] += jax.lax.dot_general(
                pb, dop, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # (bk, W) lane-packed
            dp = jax.lax.dot_general(
                dop, v_ref[0, kslab, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (p * (dp - dsum) * scale).astype(dtype)
            dk_s[kslab, :] += jax.lax.dot_general(
                ds, qp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return dq_acc + jnp.dot(ds, kt,
                                    preferred_element_type=jnp.float32)

        dq0 = jnp.zeros((hp * bq, W), jnp.float32)
        dq = jax.lax.fori_loop(0, nk, k_tile, dq0)
        dq_ref[0, rows, :] = _unpack_rows(dq, fmasks,
                                          bq).astype(dq_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nq, q_tile, 0)

    @pl.when(chunk == nchunks - 1)
    def _flush():
        dk_ref[0, :, :] = dk_s[:].astype(dk_ref.dtype)
        dv_ref[0, :, :] = dv_s[:].astype(dv_ref.dtype)


def _fwd_win_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_s, m_s, l_s,
                    *, hp: int, bq: int, bk: int, scale: float):
    # Windowed forward: grid (B, G, N//cq, N//ck), k-window axis
    # innermost. q/o/lse refs hold ONE q chunk (constant across the
    # window steps); k/v refs ONE window. The online-softmax state
    # persists across window steps in VMEM scratch — acc in PACKED
    # (hp*cq, W) layout (q tile i's hp row groups at rows i*hp*bq..),
    # m/l as (hp*cq, 1) columns — initialised at window 0, flushed to
    # o/lse on the last window.
    _, cq, W = q_ref.shape
    ck = k_ref.shape[1]
    nq, nk = cq // bq, ck // bk
    kc = pl.program_id(3)
    nkc = pl.num_programs(3)
    dtype = q_ref.dtype
    masks = _lane_masks(hp, W, dtype)
    fmasks = _lane_masks(hp, W, jnp.float32)

    @pl.when(kc == 0)
    def _init():
        acc_s[:] = jnp.zeros_like(acc_s)
        m_s[:] = jnp.full_like(m_s, _NEG_BIG)
        l_s[:] = jnp.zeros_like(l_s)

    def q_tile(i, _):
        rows = pl.ds(i * bq, bq)
        prows = pl.ds(i * hp * bq, hp * bq)
        qp = _pack_rows(q_ref[0, rows, :], masks)

        def k_tile(j, carry):
            m, l, acc = carry
            kslab = pl.ds(j * bk, bk)
            s = jax.lax.dot_general(
                qp, k_ref[0, kslab, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            pv = jnp.dot(p.astype(dtype), v_ref[0, kslab, :],
                         preferred_element_type=jnp.float32)
            return m_new, l, acc * corr + pv

        m, l, acc = jax.lax.fori_loop(
            0, nk, k_tile, (m_s[prows, :], l_s[prows, :], acc_s[prows, :]))
        m_s[prows, :] = m
        l_s[prows, :] = l
        acc_s[prows, :] = acc
        return 0

    jax.lax.fori_loop(0, nq, q_tile, 0)

    @pl.when(kc == nkc - 1)
    def _flush():
        def flush_tile(i, _):
            rows = pl.ds(i * bq, bq)
            prows = pl.ds(i * hp * bq, hp * bq)
            l = l_s[prows, :]
            o_ref[0, rows, :] = _unpack_rows(
                acc_s[prows, :] / l, fmasks, bq).astype(o_ref.dtype)
            lse = m_s[prows, :] + jnp.log(l)
            for e in range(hp):
                lse_ref[0, rows, e:e + 1] = lse[e * bq:(e + 1) * bq, :]
            return 0

        jax.lax.fori_loop(0, nq, flush_tile, 0)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref,
                   dq_s, *, hp: int, bq: int, bk: int, scale: float):
    # Windowed-backward dq half: same (q-chunk outer, k-window inner)
    # grid as the windowed forward; dq accumulates in (cq, W) fp32
    # scratch across the window steps of one q chunk, flushed on the
    # last window. Scores recomputed per tile from the saved lse.
    _, cq, W = q_ref.shape
    ck = k_ref.shape[1]
    nq, nk = cq // bq, ck // bk
    kc = pl.program_id(3)
    nkc = pl.num_programs(3)
    dtype = q_ref.dtype
    masks = _lane_masks(hp, W, dtype)
    fmasks = _lane_masks(hp, W, jnp.float32)

    @pl.when(kc == 0)
    def _zero():
        dq_s[:] = jnp.zeros_like(dq_s)

    def q_tile(i, _):
        rows = pl.ds(i * bq, bq)
        qp = _pack_rows(q_ref[0, rows, :], masks)
        dop = _pack_rows(do_ref[0, rows, :], masks)
        op = _pack_rows(o_ref[0, rows, :], masks)
        dsum = jnp.sum(dop.astype(jnp.float32) * op.astype(jnp.float32),
                       axis=-1, keepdims=True)

        def k_tile(j, dq_acc):
            kslab = pl.ds(j * bk, bk)
            kt = k_ref[0, kslab, :]
            s = jax.lax.dot_general(
                qp, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = _tile_probs(s, lse_ref, rows, bq, hp)
            dp = jax.lax.dot_general(
                dop, v_ref[0, kslab, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (p * (dp - dsum) * scale).astype(dtype)
            return dq_acc + jnp.dot(ds, kt,
                                    preferred_element_type=jnp.float32)

        dq = jax.lax.fori_loop(0, nk, k_tile,
                               jnp.zeros((hp * bq, W), jnp.float32))
        dq_s[rows, :] += _unpack_rows(dq, fmasks, bq)
        return 0

    jax.lax.fori_loop(0, nq, q_tile, 0)

    @pl.when(kc == nkc - 1)
    def _flush():
        dq_ref[0, :, :] = dq_s[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                    dk_ref, dv_ref, dk_s, dv_s, *, hp: int, bq: int,
                    bk: int, scale: float):
    # Windowed-backward dk/dv half: TRANSPOSED grid (B, G, N//ck, N//cq),
    # q-chunk axis innermost — one K/V window stays grid-constant while
    # q/do/o/lse chunks stream past it, dk/dv accumulating in (ck, W)
    # fp32 scratch, flushed on the last chunk.
    _, cq, W = q_ref.shape
    ck = k_ref.shape[1]
    nq, nk = cq // bq, ck // bk
    qc = pl.program_id(3)
    ncq = pl.num_programs(3)
    dtype = q_ref.dtype
    masks = _lane_masks(hp, W, dtype)

    @pl.when(qc == 0)
    def _zero():
        dk_s[:] = jnp.zeros_like(dk_s)
        dv_s[:] = jnp.zeros_like(dv_s)

    def q_tile(i, _):
        rows = pl.ds(i * bq, bq)
        qp = _pack_rows(q_ref[0, rows, :], masks)
        dop = _pack_rows(do_ref[0, rows, :], masks)
        op = _pack_rows(o_ref[0, rows, :], masks)
        dsum = jnp.sum(dop.astype(jnp.float32) * op.astype(jnp.float32),
                       axis=-1, keepdims=True)

        def k_tile(j, _):
            kslab = pl.ds(j * bk, bk)
            s = jax.lax.dot_general(
                qp, k_ref[0, kslab, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = _tile_probs(s, lse_ref, rows, bq, hp)
            pb = p.astype(dtype)
            dv_s[kslab, :] += jax.lax.dot_general(
                pb, dop, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                dop, v_ref[0, kslab, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (p * (dp - dsum) * scale).astype(dtype)
            dk_s[kslab, :] += jax.lax.dot_general(
                ds, qp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, nk, k_tile, 0)
        return 0

    jax.lax.fori_loop(0, nq, q_tile, 0)

    @pl.when(qc == ncq - 1)
    def _flush():
        dk_ref[0, :, :] = dk_s[:].astype(dk_ref.dtype)
        dv_ref[0, :, :] = dv_s[:].astype(dv_ref.dtype)


def _win_specs(B: int, N: int, D: int, H: int, hp: int, cq: int, ck: int,
               q_outer: bool):
    """(q-chunk spec, k-window spec, lse spec) over a 4-axis grid whose
    axes 2/3 are (q-chunk, k-window) when ``q_outer`` else transposed."""
    W = (D // H) * hp
    G = H // hp
    if q_outer:
        qi = lambda b, g, i, j: (b, i, g)      # noqa: E731
        ki = lambda b, g, i, j: (b, j, g)      # noqa: E731
        li = lambda b, g, i, j: (b * G + g, i, 0)  # noqa: E731
    else:
        qi = lambda b, g, j, i: (b, i, g)      # noqa: E731
        ki = lambda b, g, j, i: (b, j, g)      # noqa: E731
        li = lambda b, g, j, i: (b * G + g, i, 0)  # noqa: E731
    return (
        pl.BlockSpec((1, cq, W), qi, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ck, W), ki, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cq, hp), li, memory_space=pltpu.VMEM),
    )


def _group_specs(B: int, N: int, D: int, H: int, hp: int, cq: int):
    """(full-N spec, cq-chunk spec, cq lse spec) over grid (B, G, N//cq)."""
    W = (D // H) * hp
    G = H // hp
    full = pl.BlockSpec((1, N, W), lambda b, g, i: (b, 0, g),
                        memory_space=pltpu.VMEM)
    chunk = pl.BlockSpec((1, cq, W), lambda b, g, i: (b, i, g),
                         memory_space=pltpu.VMEM)
    lse = pl.BlockSpec((1, cq, hp), lambda b, g, i: (b * G + g, i, 0),
                       memory_space=pltpu.VMEM)
    return full, chunk, lse


def _flash_fwd_call(q, k, v, H: int, scale: float):
    B, N, D = q.shape
    Dh = D // H
    hp = _heads_per_group(Dh)
    out_shape = (
        jax.ShapeDtypeStruct((B, N, D), q.dtype),
        jax.ShapeDtypeStruct((B * H // hp, N, hp), jnp.float32),
    )
    (cq, bq, bk), _ = _tile_sizes(N, Dh)
    if cq:
        full, chunk, lse_spec = _group_specs(B, N, D, H, hp, cq)
        o, lse = _pallas_call(
            functools.partial(_fwd_kernel, hp=hp, bq=bq, bk=bk,
                              scale=scale),
            out_shape=out_shape,
            grid=(B, H // hp, N // cq),
            in_specs=[chunk, full, full],
            out_specs=(chunk, lse_spec),
        )(q, k, v)
        return o, lse
    cq, ck, bq, bk = _windowed_fwd_tiles(N, Dh)
    chunk, kwin, lse_spec = _win_specs(B, N, D, H, hp, cq, ck, True)
    W = Dh * hp
    o, lse = _pallas_call(
        functools.partial(_fwd_win_kernel, hp=hp, bq=bq, bk=bk,
                          scale=scale),
        out_shape=out_shape,
        grid=(B, H // hp, N // cq, N // ck),
        in_specs=[chunk, kwin, kwin],
        out_specs=(chunk, lse_spec),
        scratch_shapes=[
            pltpu.VMEM((hp * cq, W), jnp.float32),
            pltpu.VMEM((hp * cq, 1), jnp.float32),
            pltpu.VMEM((hp * cq, 1), jnp.float32),
        ],
    )(q, k, v)
    return o, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, H: int, scale: float):
    return _flash_fwd_call(q, k, v, H, scale)[0]


def _flash_fwd(q, k, v, H: int, scale: float):
    o, lse = _flash_fwd_call(q, k, v, H, scale)
    return o, (q, k, v, o, lse)


def _flash_bwd(H: int, scale: float, res, do):
    q, k, v, o, lse = res
    B, N, D = q.shape
    Dh = D // H
    hp = _heads_per_group(Dh)
    shp = jax.ShapeDtypeStruct((B, N, D), q.dtype)
    W = Dh * hp
    _, (cq, bq, bk) = _tile_sizes(N, Dh)
    if cq:
        full, chunk, lse_spec = _group_specs(B, N, D, H, hp, cq)
        dq, dk, dv = _pallas_call(
            functools.partial(_bwd_kernel, hp=hp, bq=bq, bk=bk,
                              scale=scale),
            out_shape=(shp, shp, shp),
            grid=(B, H // hp, N // cq),
            in_specs=[chunk, full, full, chunk, chunk, lse_spec],
            out_specs=(chunk, full, full),
            scratch_shapes=[
                pltpu.VMEM((N, W), jnp.float32),
                pltpu.VMEM((N, W), jnp.float32),
            ],
        )(q, k, v, o, do, lse)
        return dq, dk, dv
    # windowed two-kernel split (N > 4096)
    cq, ck, bq, bk = _windowed_bwd_tiles(N, Dh)
    chunk, kwin, lse_spec = _win_specs(B, N, D, H, hp, cq, ck, True)
    dq = _pallas_call(
        functools.partial(_bwd_dq_kernel, hp=hp, bq=bq, bk=bk,
                          scale=scale),
        out_shape=shp,
        grid=(B, H // hp, N // cq, N // ck),
        in_specs=[chunk, kwin, kwin, chunk, chunk, lse_spec],
        out_specs=chunk,
        scratch_shapes=[pltpu.VMEM((cq, W), jnp.float32)],
    )(q, k, v, o, do, lse)
    chunk, kwin, lse_spec = _win_specs(B, N, D, H, hp, cq, ck, False)
    dk, dv = _pallas_call(
        functools.partial(_bwd_dkv_kernel, hp=hp, bq=bq, bk=bk,
                          scale=scale),
        out_shape=(shp, shp),
        grid=(B, H // hp, N // ck, N // cq),
        in_specs=[chunk, kwin, kwin, chunk, chunk, lse_spec],
        out_specs=(kwin, kwin),
        scratch_shapes=[
            pltpu.VMEM((ck, W), jnp.float32),
            pltpu.VMEM((ck, W), jnp.float32),
        ],
    )(q, k, v, o, do, lse)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_streaming(q, k, v, H: int,
                              scale: Optional[float] = None):
    """Long-sequence multi-head attention over (B, N, H*Dh) inputs.

    Caller (``fused_attention``) is responsible for checking
    :func:`flash_supported`; this function assumes the shapes fit.

    When H does not fill whole 128-lane head groups (odd local head
    counts under tensor parallelism), the lane dimension is zero-padded
    with phantom heads up to the next group boundary. A phantom head is
    exact, not approximate: its scores are identically zero, so its
    softmax is uniform over a zero V (output 0, finite lse), and the
    output slice discards it — the backward through the slice feeds zero
    cotangents, so no gradient leaks into or out of the pad lanes. Cost
    is pad/(H+pad) redundant attention-core work on that shard (25% at
    H=3), far cheaper than the XLA fallback it replaces (ROOFLINE §4c:
    43.7% vs 20.5% MFU at N=1024).
    """
    B, N, D = q.shape
    Dh = D // H
    if scale is None:
        scale = Dh**-0.5
    pad = (-H) % _heads_per_group(Dh)
    if pad == 0:
        return _flash(q, k, v, H, scale)
    widths = ((0, 0), (0, 0), (0, pad * Dh))
    out = _flash(jnp.pad(q, widths), jnp.pad(k, widths),
                 jnp.pad(v, widths), H + pad, scale)
    return out[..., :D]
