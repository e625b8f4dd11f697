"""Analytic ICI roofline + compiled-HLO collective-schedule inspection.

No multi-chip hardware is reachable from this environment, so the
multi-chip story is kept honest two ways (ROOFLINE.md §6):

1. **Analytic predictions** — closed-form ring-collective costs on the
   v5e 2-D ICI torus, applied to this repo's measured single-chip step
   times and exact parameter counts, giving predicted DP/FSDP scaling
   efficiencies per model config (the reference's multi-chip claim is
   plain DP gradient allreduce — BASELINE config 5).
2. **Schedule verification** — the actual collectives XLA emits for the
   sharded train steps, counted from compiled HLO on a virtual device
   mesh, asserted against the same closed forms
   (``tests/test_collective_schedule.py``). If a refactor silently turns
   the DP grad allreduce into per-parameter chatter or FSDP's
   reduce-scatter into an allreduce+slice, the byte accounting breaks the
   test before any pod time is wasted.

Bandwidth constants are the public v5e figures (datasheet 1,600 Gbps/chip
aggregate ICI; 2-D torus → 2 axes); predictions use ONE axis unless the
mesh genuinely spans two, which keeps every number a lower bound.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

__all__ = [
    "V5E_ICI_AXIS_BW",
    "all_reduce_seconds",
    "all_gather_seconds",
    "reduce_scatter_seconds",
    "dp_efficiency",
    "collective_footprint",
    "collective_lines",
]

# v5e: 1,600 Gbps/chip aggregate ICI = 200 GB/s across the 2-D torus's
# 4 links; a ring over ONE axis uses 2 of them bidirectionally.
V5E_ICI_AXIS_BW = 1.0e11  # bytes/s per torus axis (both directions)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}


def all_reduce_seconds(volume_bytes: float, n: int,
                       axis_bw: float = V5E_ICI_AXIS_BW,
                       axes: int = 1) -> float:
    """Bandwidth-optimal ring allreduce over one mesh axis of n chips:
    every byte crosses the ring twice (reduce-scatter + all-gather),
    each phase moving V*(n-1)/n."""
    if n <= 1:
        return 0.0
    return 2.0 * volume_bytes * (n - 1) / n / (axis_bw * axes)


def all_gather_seconds(volume_bytes: float, n: int,
                       axis_bw: float = V5E_ICI_AXIS_BW,
                       axes: int = 1) -> float:
    """Ring all-gather of a V-byte result: V*(n-1)/n crosses the axis."""
    if n <= 1:
        return 0.0
    return volume_bytes * (n - 1) / n / (axis_bw * axes)


def reduce_scatter_seconds(volume_bytes: float, n: int,
                           axis_bw: float = V5E_ICI_AXIS_BW,
                           axes: int = 1) -> float:
    """Same wire volume as the all-gather of the unsharded operand."""
    return all_gather_seconds(volume_bytes, n, axis_bw, axes)


def dp_efficiency(step_seconds: float, grad_bytes: float, n: int,
                  axis_bw: float = V5E_ICI_AXIS_BW,
                  overlap: bool = True) -> float:
    """Predicted data-parallel scaling efficiency at n chips.

    With ``overlap`` (XLA's latency-hiding scheduler overlaps the grad
    allreduce with the backward), comms only bite once they exceed the
    compute they hide behind; without it they serialise after the step.
    """
    comm = all_reduce_seconds(grad_bytes, n, axis_bw)
    if overlap:
        return step_seconds / max(step_seconds, comm)
    return step_seconds / (step_seconds + comm)


_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
                "collective-permute")
# `%name = <shape-or-tuple> <op>-?(start)?(` — async starts counted, dones
# skipped (same transfer), and `fusion`-wrapped variants don't exist for
# collectives in XLA:TPU today.
_OP_RE = re.compile(
    r"=\s+(\([^)]*\)|\S+)\s+(" + "|".join(_COLLECTIVES) + r")(-start)?\(")


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


_GROUPS_RE = re.compile(r"replica_groups=\{(\{[\d,{}]*\})\}")


def collective_lines(hlo_text: str):
    """Per-op collective listing: (kind, result_bytes, group_size) tuples.

    ``group_size`` is the number of devices in each replica group (0 when
    the op carries no ``replica_groups`` attribute) — on a 2-D
    (data, model) mesh it distinguishes model-axis activation psums
    (group size = tp) from the data-axis gradient allreduce (group size =
    n/tp), which ``collective_footprint``'s kind-level totals cannot."""
    out = []
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        gsize = 0
        g = _GROUPS_RE.search(line)
        if g:
            first = g.group(1).split("}")[0].lstrip("{")
            gsize = len([t for t in first.split(",") if t.strip() != ""])
        out.append((m.group(2), _shape_bytes(m.group(1)), gsize))
    return out


def collective_footprint(hlo_text: str) -> Dict[str, Tuple[int, int]]:
    """Count collectives in compiled HLO: kind -> (ops, result bytes).

    Result bytes are the op's OUTPUT shape total (for all-reduce this is
    the logical volume V of the analytic formulas; for all-gather it is
    the gathered result; for reduce-scatter the scattered shard — callers
    multiply by n to recover the unsharded operand where needed).
    """
    out: Dict[str, Tuple[int, int]] = {}
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        shape, kind = m.group(1), m.group(2)
        cnt, byt = out.get(kind, (0, 0))
        out[kind] = (cnt + 1, byt + _shape_bytes(shape))
    return out
