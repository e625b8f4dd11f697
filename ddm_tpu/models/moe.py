"""Mixture-of-Experts MLP half-block with expert parallelism.

Capability addition (the reference has no MoE — SURVEY §2 lists a dense
GELU ``FeedForward`` only, ``/root/reference/dddm/model.py:156-166``):
a top-1/top-2-routed expert MLP for scaled-width DiT deployments, designed
TPU-first in the GShard/Switch style:

  * **Static shapes end-to-end.** Routing is expressed as capacity-bounded
    one-hot dispatch/combine tensors and the expert FFNs run as batched
    ``(E, C, D) x (E, D, F)`` einsums — large MXU matmuls, no gathers with
    data-dependent shapes, nothing XLA cannot tile.
  * **Top-1 (Switch) or top-2 (GShard) routing** with the (renormalised)
    gate probabilities scaling the expert outputs, so the router is
    trained through the only differentiable path hard routing leaves
    open. Tokens over an expert's capacity
    ``C = ceil(group/E * capacity_factor * topk)`` are dropped — they
    pass through the residual connection untouched (standard Switch
    behaviour); with top-2, second choices queue after first choices so
    drops hit them first.
  * **Expert parallelism over the ``model`` mesh axis**: each shard holds
    ``E/tp`` experts' weights (and Adam moments) and computes ONLY its
    local experts on the (axis-replicated) token stream; partial combines
    leave through the Megatron ``g`` psum, and the ``f`` operator
    reassembles the cotangents of the replicated inputs/router — the same
    conjugate-operator discipline as :class:`~ddm_tpu.models.dit._TPAttention`
    (one psum per MoE block, identical comm volume to the dense TP MLP).
    Composes with tensor-parallel attention on the same axis and with the
    pipeline stage scan (the expert dimension stacks like any other leaf).
  * **Sequence-parallel expert parallelism** (``sequence_parallel=True``,
    the GShard transport): rows arrive token-sharded, routing runs on the
    local T/tp rows in per-shard groups, and the expert-FFN inputs cross
    the axis as capacity-sliced ``(E, slots, D)`` ``all_to_all`` pairs
    instead of the token psums — MoE wire volume and routing compute both
    scale ~1/tp, which is what makes expert parallelism weak-scale
    (ROOFLINE §6).

Aux signal: the standard Switch load-balance loss (mean over experts of
``E * fraction_routed * mean_prob``) is returned via ``self.sow`` under
the ``"losses"`` collection as ``moe_aux`` so the training step can add
``moe_aux_weight * aux`` without threading extra outputs through the
denoiser contract.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MoEMLP", "make_moe_aux_apply"]


def make_moe_aux_apply(model, weight: float, method: Optional[str] = None):
    """Denoiser apply fn that surfaces the Switch load-balance loss.

    :class:`MoEMLP` sows its per-block aux term under the ``"losses"``
    collection; a plain ``model.apply(params, ...)`` treats that collection
    as immutable, so flax DROPS the sown values and the router trains only
    through the gate-probability scaling of expert outputs — which lets
    routing collapse onto a few experts. This wrapper runs apply with
    ``mutable=["losses"]``, averages the per-block terms (the Switch
    convention: one aux per MoE layer, mean over layers), scales by
    ``weight`` (Switch uses 1e-2), and returns ``(x0hat, aux)`` — the tuple
    form :func:`ddm_tpu.training.distributional_training_step` adds to the
    energy loss and reports as the ``moe_aux`` metric.
    """

    def apply_fn(params, xt, t, xi):
        kwargs = {"method": method} if method is not None else {}
        out, mut = model.apply(params, xt, t, xi, mutable=["losses"],
                               **kwargs)
        terms = jax.tree.leaves(dict(mut).get("losses", {}))
        if not terms:
            raise ValueError(
                "make_moe_aux_apply wrapped a model that sows no 'losses' "
                "collection (moe_experts == 0?)"
            )
        aux = (weight / len(terms)) * sum(terms)
        return out, aux

    return apply_fn


class MoEMLP(nn.Module):
    """Expert-routed GELU MLP over token rows ``(T, D) -> (T, D)``
    (top-1 Switch or top-2 GShard routing via ``topk``).

    Two instantiations share one param tree (the `_TPAttention` trick):
    ``tp_axis=None`` declares full ``(E, ...)`` expert weights (init,
    sampling, the replicated oracle); ``tp_axis='model'`` declares the
    local ``(E/tp, ...)`` shard inside ``shard_map`` — flax sees each
    shard's slice, and this module computes only the local experts.
    """

    dim: int
    hidden: int
    num_experts: int
    capacity_factor: float = 1.25
    # GShard-style routing groups: the dispatch/combine one-hot einsums
    # cost O(T * group * D) FLOPs, so with one group (group_size=0) they
    # are QUADRATIC in the total row count — fine for unit-test shapes,
    # infeasible at the CIFAR training shape (B*m*N = 131k rows). A
    # group_size of a few hundred keeps dispatch linear in T while the
    # capacity rule applies per group (GShard §3.2's exact trade).
    group_size: int = 0  # 0 = all rows in one group (exact, small T only)
    # routed experts per token: 1 = Switch, 2 = GShard top-2 (renormalised
    # gates, second choices queue after first choices; per-expert capacity
    # scales by topk so the default capacity_factor keeps the same drop
    # behaviour — expert FFN FLOPs scale with topk)
    topk: int = 1
    tp: int = 1
    tp_axis: Optional[str] = None
    # Sequence-parallel expert parallelism: ``rows`` arrive TOKEN-sharded
    # over ``tp_axis`` (each shard holds T/tp rows) instead of replicated.
    # Routing runs on the local token shard only, routing groups are
    # formed per shard (GShard's per-device grouping — identical to the
    # replicated partition whenever ``group_size`` divides the local row
    # count), and the expert FFN inputs cross the axis as CAPACITY-SLICED
    # ``all_to_all``s of the (E, slots, D) dispatch output instead of the
    # replicated path's full-(T, D) fp32 psum pair: each shard ships only
    # the ~``capacity_factor x topk / tp`` fraction of rows that actually
    # route off-shard, in the compute dtype. Both router compute and
    # dispatch/combine einsums scale 1/tp. Requires ``tp_axis``.
    sequence_parallel: bool = False
    dtype: jnp.dtype = jnp.float32

    def _fused(self, rows, ln_scale, ln_bias, wr, br, w1, b1, w2, b2,
               gs: int, cap: int, residual=None,
               res_is_rows: bool = False) -> jnp.ndarray:
        """Fused-kernel body (``ddm_tpu.ops.moe_dispatch``): one Pallas
        prologue (LN2 + router + top-k capacity dispatch), the tiered
        expert-FFN kernel, one combine epilogue. The one-hot dispatch
        tensors never reach HBM; routing state rides as compact
        ``(pos, gates)`` arrays, the Switch aux statistics as in-kernel
        ``(1, E)`` sums, and (with ``residual``) the block's residual add
        runs inside the combine epilogue. With ``res_is_rows`` (the DiT
        block's case: the residual stream IS the dispatch input) the
        residual rides the dispatch pass-through so its backward
        cotangent joins ``dx`` inside the dispatch backward kernel
        instead of as an XLA add of two kernel outputs. Replicated
        (non-EP) path only."""
        import jax as _jax

        from ddm_tpu.ops.expert_ffn import expert_ffn_auto
        from ddm_tpu.ops.moe_dispatch import (
            MoEDispatchCfg, moe_combine, moe_combine_res, moe_dispatch,
            moe_dispatch_thru,
        )

        T, D = rows.shape
        E = self.num_experts
        cfg = MoEDispatchCfg(
            gs=gs, cap=cap, cpad=-(-cap // 8) * 8, num_experts=E,
            topk=self.topk, cdt=jnp.dtype(self.dtype).name,
        )
        if res_is_rows:
            (xin, gates, pos1, pos2, cnt, psum,
             residual) = moe_dispatch_thru(
                cfg, rows, ln_scale, ln_bias, wr, br)
        else:
            xin, gates, pos1, pos2, cnt, psum = moe_dispatch(
                cfg, rows, ln_scale, ln_bias, wr, br)
        pos1 = _jax.lax.stop_gradient(pos1)
        pos2 = _jax.lax.stop_gradient(pos2)
        # Switch aux (same formula as the einsum path; frac from the
        # pre-capacity first-choice counts, differentiable through the
        # in-kernel prob sums — (1, E) vectors, so the XLA side never
        # builds a lane-padded (G, gs, E) tensor)
        frac = _jax.lax.stop_gradient(cnt).reshape(E) / float(T)
        mean_p = psum.reshape(E) / float(T)
        self.sow("losses", "moe_aux", E * jnp.sum(frac * mean_p))
        out = expert_ffn_auto(xin, w1, b1, w2, b2, dtype=self.dtype)
        if residual is not None:
            return moe_combine_res(cfg, out, gates, pos1, pos2, residual)
        return moe_combine(cfg, out, gates, pos1, pos2)

    @nn.compact
    def __call__(self, rows: jnp.ndarray,
                 ln_scale: Optional[jnp.ndarray] = None,
                 ln_bias: Optional[jnp.ndarray] = None,
                 residual: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``rows`` are token rows ``(T, D)``.

        With ``ln_scale``/``ln_bias`` given, ``rows`` are PRE-LayerNorm and
        this module owns LN2 — the contract that lets the fused Pallas
        prologue (``ddm_tpu.ops.moe_dispatch``) run LN + router + dispatch
        in one kernel on the replicated path. Without them, ``rows`` are
        already normalised (the sharded/EP path keeps LN outside).

        ``residual`` (replicated path only): the block's residual stream
        ``(T, D)``, any float dtype. When given, the module returns
        ``(residual_f32 + out_f32).astype(dtype)`` — added inside the
        combine kernel on the fused path, in XLA fp32 on the einsum
        fallback; both match the expression the DiT block used to apply.
        The string sentinel ``"rows"`` declares that the residual stream
        IS ``rows`` itself (the DiT block's case): the fused path then
        routes it through the dispatch pass-through so the backward's
        residual-cotangent join runs inside the dispatch kernel.
        """
        res_is_rows = isinstance(residual, str)
        if res_is_rows:
            if residual != "rows":
                raise ValueError(f"unknown residual sentinel {residual!r}")
            residual = rows
        shard = self.tp_axis is not None
        a2a = self.sequence_parallel and shard
        e_local = self.num_experts // self.tp if shard else self.num_experts
        T, D = rows.shape
        E = self.num_experts
        # clamp to the actual row count: init traces with a 1-image dummy
        # (N rows) and small inference batches may be under one group
        gs = min(self.group_size, T) if self.group_size > 0 else T
        # Row counts that don't divide the group (eval remainder chunks,
        # odd sampling batches) are zero-PADDED to the next group boundary;
        # padded rows are masked out of routing (no capacity consumed, no
        # aux contribution) and the output is sliced back.
        T_pad = -(-T // gs) * gs
        n_valid = T
        if T_pad != T:
            rows = jnp.pad(rows, ((0, T_pad - T), (0, 0)))
        G = T_pad // gs
        if self.topk not in (1, 2):
            raise ValueError(f"topk must be 1 or 2, got {self.topk}")
        # ceil, per group; each token occupies up to topk slots
        cap = int(-(-gs * self.capacity_factor * self.topk // E))

        wr = self.param("router_kernel", nn.initializers.lecun_normal(),
                        (self.dim, E), jnp.float32)
        br = self.param("router_bias", nn.initializers.zeros, (E,),
                        jnp.float32)
        w1 = self.param("experts_in", nn.initializers.lecun_normal(),
                        (e_local, self.dim, self.hidden), jnp.float32)
        b1 = self.param("experts_in_bias", nn.initializers.zeros,
                        (e_local, self.hidden), jnp.float32)
        w2 = self.param("experts_out", nn.initializers.lecun_normal(),
                        (e_local, self.hidden, self.dim), jnp.float32)
        b2 = self.param("experts_out_bias", nn.initializers.zeros,
                        (e_local, self.dim), jnp.float32)

        if ln_scale is not None:
            from ddm_tpu.ops.moe_dispatch import moe_dispatch_ok

            # Fused prologue/epilogue kernels (replicated path only; init
            # traces the jnp body so no kernel compiles inside model.init)
            if (not shard and self.tp == 1 and not self.is_initializing()
                    and T_pad == T
                    and moe_dispatch_ok(T, gs, E, cap, D, self.topk)):
                return self._fused(rows, ln_scale, ln_bias, wr, br,
                                   w1, b1, w2, b2, gs, cap,
                                   residual=residual,
                                   res_is_rows=res_is_rows)
            from ddm_tpu.ops.mlp_block import _ln

            # jnp LN2 fallback (off-TPU / ragged / init trace). `rows` may
            # carry zero padding already; LN maps those rows to the bias
            # vector, but they are masked out of routing and sliced off
            # the output, so the value is inert.
            h, _, _ = _ln(rows.astype(jnp.float32), ln_scale, ln_bias)
            rows = h.astype(self.dtype)

        if shard:
            from ddm_tpu.parallel.tp import tp_region_enter

            # every replicated value consumed by per-shard branches gets
            # partial cotangents; the f operator psums them back. Under
            # sequence parallelism `rows` are GENUINELY sharded (each
            # shard's cotangent is the true gradient of its own tokens)
            # so only the replicated router params enter.
            if not a2a:
                rows = tp_region_enter(rows, self.tp_axis)
            wr = tp_region_enter(wr, self.tp_axis)
            br = tp_region_enter(br, self.tp_axis)

        # --- routing (fp32; identical on every model shard) ---
        rows_g = rows.reshape(G, gs, D)
        logits = jnp.einsum(
            "gtd,de->gte", rows_g.astype(jnp.float32), wr
        ) + br                                                   # (G, gs, E)
        probs = jax.nn.softmax(logits, axis=-1)

        valid = None
        if T_pad != n_valid:
            # padding rows never route: they consume no expert capacity
            # and contribute nothing to the load-balance statistics
            valid = (jnp.arange(T_pad) < n_valid).reshape(G, gs, 1)

        def queue(oh, offset=None):
            """Per-group, per-expert slot positions for routed tokens
            (token order; -1 off-route) and the capacity-bounded one-hot
            dispatch block built from them."""
            pos = jnp.cumsum(oh, axis=1) * oh - 1.0
            if offset is not None:
                pos = pos + offset * oh
            keep = (pos >= 0) & (pos < cap)
            # dispatch[g, t, e, c] = 1 iff token t is slot c of expert e
            # in group g (pos is -1 off-route / >= cap over capacity;
            # one_hot of those yields zeros, matching the `keep` mask)
            d = (oh * keep)[..., None] * jax.nn.one_hot(
                pos.astype(jnp.int32), cap, dtype=jnp.float32
            )
            return d                                             # (G, gs, E, C)

        def route(probs):
            """(dispatch-parts, first-choice onehot) from router probs.

            Returns a list of ``(one-hot dispatch block, per-token gate)``
            pairs — one per routed choice — so the caller can shard-slice
            each block over the expert axis BEFORE the gate multiply (the
            combine tensor is then built at local E/tp width; gating the
            full width first measured tp-fold wasted elementwise work).

            NOT jax.checkpoint'ed (measured dead end): recomputing the
            (G, gs, E, C) one-hot blocks from probs in the backward saves
            ~334 MB/block of residuals but the cumsum/one_hot recompute is
            VPU-sequential — 1456 -> 1375 img/s at the DiT-S bench shape.
            """
            if self.topk == 1:
                gate = jnp.max(probs, axis=-1)                   # (G, gs)
                idx = jnp.argmax(probs, axis=-1)                 # (G, gs)
                onehot = jax.nn.one_hot(idx, E, dtype=jnp.float32)
                if valid is not None:
                    onehot = onehot * valid
                return [(queue(onehot), gate.astype(jnp.float32))], onehot
            # GShard-style top-2: every token routes to its two largest
            # experts with renormalised gates; second choices queue AFTER
            # all of the group's first choices (first-choice priority), so
            # slots never collide and capacity drops hit second choices
            # first. Each token occupies up to 2 slots — the capacity rule
            # above already scales by topk.
            p2, i2 = jax.lax.top_k(probs, 2)                     # (G, gs, 2)
            oh = jax.nn.one_hot(i2, E, dtype=jnp.float32)        # (G, gs, 2, E)
            if valid is not None:
                oh = oh * valid[..., None, :]
            oh1, oh2 = oh[:, :, 0], oh[:, :, 1]
            d1 = queue(oh1)
            cnt1 = jnp.sum(oh1, axis=1, keepdims=True)           # (G, 1, E)
            d2 = queue(oh2, offset=cnt1)
            denom_g = p2[..., 0] + p2[..., 1] + 1e-9
            g1 = (p2[..., 0] / denom_g).astype(jnp.float32)
            g2 = (p2[..., 1] / denom_g).astype(jnp.float32)
            return [(d1, g1), (d2, g2)], oh1

        parts, onehot = route(probs)

        # Switch load-balance aux: E * sum_e f_e * P_e (==1 when uniform).
        # NOT sown during init: flax init returns every mutable collection,
        # and a sown scalar inside the init variables would ride into the
        # TrainState param tree (AdamW would weight-decay it).
        if not self.is_initializing():
            denom = float(n_valid)
            cnt = jnp.sum(onehot, axis=(0, 1))
            if T_pad != n_valid:
                sump = jnp.sum(probs * valid, axis=(0, 1))
            else:
                sump = jnp.sum(probs, axis=(0, 1))
            if a2a:
                # Switch statistics are means over ALL tokens but only
                # T/tp live here: psum the (E,) count/prob sums — the
                # only sub-KB collective in the block. Each shard then
                # holds the identical global aux; the 1/tp cotangent
                # scale below makes the psum transpose (itself a psum
                # under check_vma=False) reconstruct exactly 1x into the
                # local probs.
                cnt = jax.lax.psum(cnt, self.tp_axis)
                sump = jax.lax.psum(sump, self.tp_axis)
                denom = denom * self.tp
            frac = cnt / denom
            mean_p = sump / denom
            aux = E * jnp.sum(frac * mean_p)
            if shard:
                # Every input of aux passed through tp_region_enter, whose
                # backward is a psum over the model axis — but unlike the
                # expert branches (partial computations whose cotangents
                # must sum), aux is computed IDENTICALLY on every shard, so
                # the psum would over-count its gradients tp-fold. Scale
                # the cotangents by 1/tp (value untouched) so the psum
                # reconstructs exactly 1x — the conjugate of "replicated
                # compute on entered values".
                inv = 1.0 / self.tp
                aux = aux * inv + jax.lax.stop_gradient(aux * (1.0 - inv))
            self.sow("losses", "moe_aux", aux)

        if shard and not a2a:
            s = jax.lax.axis_index(self.tp_axis)
            parts = [
                (jax.lax.dynamic_slice_in_dim(d, s * e_local, e_local, 2), g)
                for d, g in parts
            ]                                          # (G, gs, El, C) each
        local = sum(d for d, _ in parts)
        combine = sum(d * g[..., None, None] for d, g in parts)

        comp = self.dtype
        # a2a: dispatch/combine tensors stay FULL-E width (the local
        # tokens' slots for every expert, shipped to the expert's owner)
        el = e_local if shard and not a2a else E
        # Dispatch emits (El, G, C, D) and the expert FFN runs on each
        # expert's G*C slots FLATTENED into one matmul: einsums batched
        # over (G, El) pairs lower to C-row matmuls (C ~= 40 at the
        # production group size — under half an MXU tile; measured
        # ~4.6 ms/step/block of expert-FFN time at the DiT-S bench shape
        # vs ~1.6 for the flat form), so the group dim must stay out of
        # the FFN's batch dims.
        xin = jnp.einsum("gtec,gtd->egcd", local.astype(comp),
                         rows_g.astype(comp))                    # (El, G, C, D)
        xin = xin.reshape(el, G * cap, D)
        if a2a:
            # Capacity-sliced all-to-all (GShard's dispatch transport):
            # split the expert dim so each shard receives every shard's
            # slot rows for ITS local experts, concatenated on the slot
            # dim — (E, S, D) -> (E/tp, tp*S, D). Wire volume per shard
            # per direction is (tp-1)/tp * E*S*D in the compute dtype,
            # i.e. the capacity_factor*topk slot fraction of the local
            # tokens — vs the replicated path's full-(T, D) fp32 psum
            # pair. The transpose of all_to_all is the reverse
            # all_to_all, so the backward ships the same sliced volume.
            xin = jax.lax.all_to_all(
                xin, self.tp_axis, split_axis=0, concat_axis=1, tiled=True)
        from ddm_tpu.ops.expert_ffn import expert_ffn_auto

        # tiered kernel dispatch (ops/expert_ffn.py): fully-fused Pallas
        # kernel (hidden activations never touch HBM, per-expert in-VMEM
        # dW — XLA ran this einsum pair at ~45 TF/s fwd / ~9% MFU bwd at
        # the production shape), forward-only kernel at DiT-B+ widths,
        # jnp reference off-TPU/odd shapes
        out = expert_ffn_auto(xin, w1, b1, w2, b2, dtype=comp)
        if a2a:
            # return each slot row to its token's owner shard
            out = jax.lax.all_to_all(
                out, self.tp_axis, split_axis=1, concat_axis=0, tiled=True)
        out = out.reshape(el, G, cap, D)

        part = jnp.einsum(
            "gtec,egcd->gtd", combine.astype(jnp.float32),
            out.astype(jnp.float32),
        )                                                        # (G, gs, D)
        if shard and not a2a:
            from ddm_tpu.parallel.tp import tp_region_exit

            part = tp_region_exit(part, self.tp_axis)
        out = part.reshape(T_pad, D)[:T].astype(self.dtype)
        if residual is not None:
            out = (residual.astype(jnp.float32)
                   + out.astype(jnp.float32)).astype(self.dtype)
        return out
