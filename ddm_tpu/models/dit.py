"""DiT distributional denoiser for images (Flax, TPU-first layout).

TPU-native re-implementation of the reference's DiT stack
(``/root/reference/dddm/model.py:6-26,70-244``): sinusoidal time embedding,
patch embed/unembed, pre-LN transformer blocks with plain softmax attention
and a GELU 4x MLP, learned positional embedding, and xi-conditioning by
*channel concatenation* (input channels = 2 * data channels,
``model.py:236``). Faithful behavioural details preserved:

  * time enters additively only (NO AdaLN modulation — matches the reference,
    which departs from canonical DiT here, ``model.py:237-239``);
  * ``xt`` and ``xi`` must have identical shapes (``model.py:230-231``);
  * final LayerNorm before unembedding (``model.py:218``).

TPU-first design departures (behaviour-preserving):
  * Images flow internally as NHWC (the layout XLA:TPU prefers); the public
    ``__call__`` accepts NCHW by default for reference API parity and
    transposes once at entry/exit. Set ``data_format="NHWC"`` to skip.
  * Patch embed/unembed are pure reshape + Dense (a stride-p conv with
    kernel p is exactly a matmul over flattened patches) — lands on the MXU
    with no im2col.
  * Attention softmax runs in float32 even under bf16 compute; the matmuls
    run in the compute dtype on the MXU. A Pallas flash-attention path
    (``ddm_tpu.ops.attention``) is used when ``attention_impl='flash'`` or
    when ``'auto'`` and the sequence is long enough to benefit.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ddm_tpu.ops.pallas_config import fast_gelu_enabled

__all__ = [
    "SinusoidalTimeEmbedding",
    "sinusoidal_time_embedding",
    "patchify_images",
    "DDDMDiT",
]


def patchify_images(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """NHWC images -> ``(B, N, p*p*C)`` patch tokens (pure reshape).

    The exact permutation :meth:`DDDMDiT.tokens` outputs correspond to —
    used as the loss ``target_transform`` on the tokens fast path.
    """
    B, H, W, C = x.shape
    gh, gw = H // patch, W // patch
    x = x.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, p, p, C)
    return x.reshape(B, gh * gw, patch * patch * C)


def sinusoidal_time_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """Standard sinusoidal diffusion time embedding.

    ``[sin(t * f_0..f_{h-1}), cos(t * f_0..f_{h-1})]`` with geometrically
    spaced frequencies; odd ``dim`` is zero-padded by one.

    Reference parity: ``/root/reference/dddm/model.py:6-26``.
    """
    t = t.reshape(-1)
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=t.dtype) / max(half - 1, 1)
    freqs = jnp.exp(exponent)
    args = t[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class SinusoidalTimeEmbedding(nn.Module):
    dim: int
    max_period: float = 10000.0

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        return sinusoidal_time_embedding(t, self.dim, self.max_period)


class MultiheadSelfAttention(nn.Module):
    """Bidirectional MHSA with fp32 softmax and a fused Pallas kernel path.

    Reference parity: ``/root/reference/dddm/model.py:132-153`` (fused qkv
    projection, scale = head_dim**-0.5, output projection).

    Layout: the fused qkv Dense emits ``[q | k | v]`` lane blocks with heads
    contiguous inside each — exactly the layout
    :func:`ddm_tpu.ops.attention.fused_attention` consumes, so the kernel
    path pays zero transposes. Measured on v5e, XLA's batched tiny-matmul
    attention was HALF the DiT train step; the fused kernel runs at the HBM
    bandwidth floor (~2.7x faster fwd+bwd).
    """

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"  # 'auto'/'flash' -> fused kernel, 'xla' -> einsum

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.dim % self.num_heads != 0:
            raise ValueError("dim must be divisible by num_heads")
        from ddm_tpu.ops.attention import attention_reference, fused_attention

        B, N, C = x.shape
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # (B, N, D) each, heads contiguous

        if self.attention_impl == "xla":
            out = attention_reference(q, k, v, self.num_heads)
        else:
            # fused_attention falls back to the XLA path off-TPU or for
            # unsupported shapes, so 'auto' and 'flash' are safe everywhere
            out = fused_attention(q, k, v, self.num_heads)

        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class _LNParams(nn.Module):
    """Param holder matching ``nn.LayerNorm``'s tree ({scale, bias})."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class _DenseParams(nn.Module):
    """Param holder matching ``nn.Dense``'s tree ({kernel, bias})."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_dim, self.out_dim), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,), jnp.float32)
        return k, b


class _AttnParams(nn.Module):
    """Param holder matching ``MultiheadSelfAttention``'s tree (qkv, proj)."""

    dim: int

    @nn.compact
    def __call__(self):
        wqkv, bqkv = _DenseParams(self.dim, 3 * self.dim, name="qkv")()
        wproj, bproj = _DenseParams(self.dim, self.dim, name="proj")()
        return wqkv, bqkv, wproj, bproj


def _layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """fp32 LayerNorm matching ``flax.linen.LayerNorm`` (eps 1e-6).

    Used by the sequence-parallel block bodies, where the norm runs on the
    LOCAL token shard with explicitly-held (f-wrapped) params — LayerNorm is
    per-token, so it never needs the gathered sequence.
    """
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias


class _TPAttention(nn.Module):
    """Tensor-parallel attention: column-parallel q/k/v, row-parallel proj.

    Megatron layout over the ``model`` mesh axis (VERDICT r1 item 3): the
    fused ``[q|k|v]`` projection is split into THREE column-parallel
    projections so a model-axis shard owns whole heads contiguously — no
    mid-block all-gather — and the Pallas ``fused_attention`` kernel runs
    per shard on its local heads inside ``shard_map``. The proj matmul is
    row-parallel; its partial products are psum'd once per block via the
    ``g`` operator and the bias + residual are added exactly once after.

    Two instantiations share one param TREE (names/values), differing only
    in declared shapes:
      * ``tp_axis=None`` — full weights (init, sampling, jit-SPMD, oracle);
      * ``tp_axis='model'`` — local shard shapes, used inside ``shard_map``
        where flax sees each shard's slice.
    """

    dim: int
    num_heads: int
    tp: int = 1
    tp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"
    # Megatron-style sequence parallelism: ``h`` arrives as the FULL
    # (already all-gathered) sequence whose gather transpose owns the
    # input cotangent reassembly (no f operator), and the row-parallel
    # partial outputs leave through a token reduce-scatter instead of the
    # g psum — the residual stream stays token-sharded. The replicated
    # proj bias is f-wrapped because its cotangent is then per-token-shard.
    sequence_parallel: bool = False

    @nn.compact
    def __call__(self, h: jnp.ndarray, x_res: jnp.ndarray) -> jnp.ndarray:
        from ddm_tpu.ops.attention import attention_reference, fused_attention

        shard = self.tp_axis is not None
        local_dim = self.dim // self.tp if shard else self.dim
        local_heads = self.num_heads // self.tp if shard else self.num_heads

        if shard and not self.sequence_parallel:
            from ddm_tpu.parallel.tp import tp_region_enter

            h = tp_region_enter(h, self.tp_axis)
        q = nn.Dense(local_dim, dtype=self.dtype, name="q")(h)
        k = nn.Dense(local_dim, dtype=self.dtype, name="k")(h)
        v = nn.Dense(local_dim, dtype=self.dtype, name="v")(h)

        if self.attention_impl == "xla":
            o = attention_reference(q, k, v, local_heads)
        else:
            o = fused_attention(q, k, v, local_heads)

        wproj, bproj = _DenseParams(local_dim, self.dim, name="proj")()
        out = jnp.dot(
            o, wproj.astype(o.dtype), preferred_element_type=jnp.float32
        )
        if shard and self.sequence_parallel:
            from ddm_tpu.parallel.tp import tp_region_enter

            out = jax.lax.psum_scatter(
                out, self.tp_axis, scatter_dimension=1, tiled=True
            )
            bproj = tp_region_enter(bproj, self.tp_axis)
        elif shard:
            from ddm_tpu.parallel.tp import tp_region_exit

            out = tp_region_exit(out, self.tp_axis)
        return (x_res.astype(jnp.float32) + out + bproj).astype(self.dtype)


class DiTBlock(nn.Module):
    """Pre-LN transformer block: ``x + attn(LN(x)); x + ff(LN(x))``.

    Reference parity: ``/root/reference/dddm/model.py:169-180`` (LayerNorms
    carry learnable affine params; GELU MLP with ``mlp_ratio`` expansion).

    TPU execution: the whole block compiles to exactly TWO Pallas kernels —
    the fused attention half-block (LN1 + qkv + packed MHA + proj +
    residual, ``ddm_tpu.ops.attention``) and the fused MLP half-block
    (LN2 + ff + GELU + residual, ``ddm_tpu.ops.mlp_block``) — with jnp
    fallbacks off-TPU. The param tree is identical to the plain
    ``nn.LayerNorm``/``nn.Dense``/``MultiheadSelfAttention`` layout, so
    checkpoints and sharding rules are unaffected. ``fused_*=False`` or
    ``attention_impl='xla'`` select the unfused modules.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"
    fused_mlp: bool = True
    tp: int = 1
    tp_axis: Optional[str] = None
    # Hybrid persist-residuals MLP backward (ROOFLINE §4): let XLA save
    # this block's MLP residuals instead of recomputing the forward in the
    # backward. Only meaningful on widths where the in-VMEM backward kernel
    # does not fit (DiT-B+); measured ~0.43 GiB HBM per DiT-B block.
    mlp_persist: bool = False
    # Megatron sequence parallelism (Korthikanti et al. 2022) on top of TP:
    # the residual stream between blocks is TOKEN-sharded (B, N/tp, D); LN1
    # runs on the local shard, an all-gather assembles the full sequence for
    # the column-parallel matmuls, and the row-parallel partial products
    # leave through a token psum_scatter instead of the g psum. Same comm
    # volume as TP's two psums, but activations and LN compute scale 1/tp.
    sequence_parallel: bool = False
    # Mixture-of-Experts MLP half (ddm_tpu.models.moe): > 1 replaces the
    # dense ff_in/ff_out with moe_experts top-1-routed expert FFNs; with
    # tp > 1 the experts are SHARDED over the model axis (expert
    # parallelism: E/tp experts' weights + moments per shard, one psum).
    moe_experts: int = 0
    moe_capacity: float = 1.25
    moe_group_size: int = 0
    moe_topk: int = 1

    def _moe_half(self, x: jnp.ndarray) -> jnp.ndarray:
        """LN2 + top-k expert MLP + residual (replaces the dense MLP)."""
        from ddm_tpu.models.moe import MoEMLP

        shard = self.tp_axis is not None
        sp = self.sequence_parallel and shard
        B, N, D = x.shape  # N is the LOCAL token count under sp
        moe = MoEMLP(
            self.dim, int(self.dim * self.mlp_ratio), self.moe_experts,
            capacity_factor=self.moe_capacity,
            group_size=self.moe_group_size, topk=self.moe_topk, tp=self.tp,
            tp_axis=self.tp_axis, sequence_parallel=self.sequence_parallel,
            dtype=self.dtype, name="moe",
        )
        if self.tp_axis is None and self.tp == 1:
            # replicated path: hand LN2's params to MoEMLP so the fused
            # Pallas prologue (LN + router + dispatch) can engage, and
            # declare the residual stream to be the module input itself
            # (the "rows" sentinel) — the combine epilogue then performs
            # the block's fp32 residual add in-kernel and the backward's
            # residual-cotangent join runs inside the dispatch kernel.
            # Same {scale, bias} tree as nn.LayerNorm; x is already
            # self.dtype between blocks, so the astype is an identity and
            # the module reproduces the fp32 add this block used to do.
            s2, b2 = _LNParams(self.dim, name="norm2")()
            out = moe(x.astype(self.dtype).reshape(B * N, D),
                      ln_scale=s2, ln_bias=b2, residual="rows")
            return out.reshape(B, N, D).astype(self.dtype)
        if sp:
            from ddm_tpu.parallel.tp import tp_region_enter

            # SP+EP path: the residual stream is TOKEN-sharded. LN2 runs
            # on the local shard (per-token op; params replicated but
            # consumed on a shard, so their cotangents are partials —
            # f-wrap reassembles them, same as the dense SP norm1), then
            # MoEMLP routes the local tokens and ships capacity-sliced
            # all_to_alls across the expert axis. Residual adds locally;
            # the output stays token-sharded for the next block.
            s2, b2 = _LNParams(self.dim, name="norm2")()
            h = _layernorm(
                x,
                tp_region_enter(s2, self.tp_axis),
                tp_region_enter(b2, self.tp_axis),
            ).astype(self.dtype)
            out = moe(h.reshape(B * N, D))
            out = (x.astype(jnp.float32)
                   + out.astype(jnp.float32).reshape(B, N, D))
            return out.astype(self.dtype)
        # EP path: LN outside (replicated compute), einsum dispatch
        # with the f/g collective discipline, residual added here
        h = nn.LayerNorm(dtype=jnp.float32,
                         name="norm2")(x).astype(self.dtype)
        out = moe(h.reshape(B * N, D))
        out = x.astype(jnp.float32) + out.astype(jnp.float32).reshape(B, N, D)
        return out.astype(self.dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.tp > 1:
            return self._tp_call(x)
        fuse_attn = self.attention_impl != "xla" and self.fused_mlp
        B, N, D = x.shape

        if fuse_attn:
            from ddm_tpu.ops.attention import fused_attention_block

            s1, b1 = _LNParams(self.dim, name="norm1")()
            wqkv, bqkv, wproj, bproj = _AttnParams(self.dim, name="attn")()
            x = fused_attention_block(
                x.astype(self.dtype), s1, b1, wqkv, bqkv, wproj, bproj,
                self.num_heads,
            )
        else:
            h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
            x = x + MultiheadSelfAttention(
                self.dim, self.num_heads, dtype=self.dtype,
                attention_impl=self.attention_impl, name="attn",
            )(h)

        if self.moe_experts > 1:
            return self._moe_half(x)

        hidden = int(self.dim * self.mlp_ratio)
        if self.fused_mlp:
            from ddm_tpu.ops.mlp_block import fused_mlp_block

            s2, b2 = _LNParams(self.dim, name="norm2")()
            w1, bb1 = _DenseParams(self.dim, hidden, name="ff_in")()
            w2, bb2 = _DenseParams(hidden, self.dim, name="ff_out")()
            out = fused_mlp_block(
                x.astype(self.dtype).reshape(B * N, D), s2, b2, w1, bb1, w2,
                bb2, persist=self.mlp_persist,
            )
            return out.reshape(B, N, D)

        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = nn.Dense(hidden, dtype=self.dtype, name="ff_in")(h)
        if fast_gelu_enabled():  # keep XLA path consistent with the kernels
            from ddm_tpu.ops.mlp_block import _gelu_fast
            h = _gelu_fast(h)
        else:
            h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="ff_out")(h)
        return x + h

    def _tp_call(self, x: jnp.ndarray) -> jnp.ndarray:
        """Tensor-parallel block body (``tp > 1``).

        Attention: LN (XLA) -> :class:`_TPAttention` (Pallas attention core
        on local heads, one psum). MLP: the fused Pallas *partial* half-
        block per shard (``ddm_tpu.ops.mlp_block.fused_mlp_partial`` — LN +
        ff_in + GELU + ff_out partial product, fp32), one psum, then bias +
        residual added once. With ``tp_axis=None`` the same code runs with
        full weights and no collectives (the replicated oracle).
        """
        from ddm_tpu.ops.mlp_block import fused_mlp_partial

        shard = self.tp_axis is not None
        sp = self.sequence_parallel and shard
        B, N, D = x.shape  # N is the LOCAL token count under sp

        if sp:
            from ddm_tpu.parallel.tp import tp_region_enter

            # LN on the local token shard (the SP payoff: 1/tp the LN
            # compute and no full-sequence activation on the residual
            # path). The norm params are replicated but consumed on a
            # token shard, so their per-shard cotangents are partial —
            # f-wrap reassembles them.
            s1, b1 = _LNParams(self.dim, name="norm1")()
            h = _layernorm(
                x,
                tp_region_enter(s1, self.tp_axis),
                tp_region_enter(b1, self.tp_axis),
            ).astype(self.dtype)
            # gather the full sequence for the column-parallel q/k/v; the
            # gather transpose (psum_scatter) owns dL/dh reassembly.
            h = jax.lax.all_gather(h, self.tp_axis, axis=1, tiled=True)
        else:
            h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = _TPAttention(
            self.dim, self.num_heads, tp=self.tp, tp_axis=self.tp_axis,
            dtype=self.dtype, attention_impl=self.attention_impl,
            sequence_parallel=sp, name="attn",
        )(h, x)

        if self.moe_experts > 1:
            # expert parallelism: E/tp experts per model shard, one psum
            return self._moe_half(x)

        hidden = int(self.dim * self.mlp_ratio)
        hidden_local = hidden // self.tp if shard else hidden
        s2, b2 = _LNParams(self.dim, name="norm2")()
        w1, bb1 = _DenseParams(self.dim, hidden_local, name="ff_in")()
        w2, bb2 = _DenseParams(hidden_local, self.dim, name="ff_out")()

        if sp:
            from ddm_tpu.parallel.tp import tp_region_enter

            # Gather the token-sharded residual PRE-LN and let the fused
            # partial kernel normalise the full rows in-kernel (redundantly
            # per shard, like TP) — keeps the single-kernel MLP half-block.
            # LN-param and output-bias cotangents are per-token-shard
            # partials: f-wrap them; the two gathers' transposes handle the
            # activation cotangents.
            xg = jax.lax.all_gather(x, self.tp_axis, axis=1, tiled=True)
            nf = xg.shape[1]
            part = fused_mlp_partial(
                xg.astype(self.dtype).reshape(B * nf, D),
                tp_region_enter(s2, self.tp_axis),
                tp_region_enter(b2, self.tp_axis),
                w1, bb1, w2,
            )
            part = jax.lax.psum_scatter(
                part.reshape(B, nf, D), self.tp_axis,
                scatter_dimension=1, tiled=True,
            )
            bb2 = tp_region_enter(bb2, self.tp_axis)
            out = (x.astype(jnp.float32) + part + bb2).astype(self.dtype)
            return out

        rows = x.astype(self.dtype).reshape(B * N, D)
        if shard:
            from ddm_tpu.parallel.tp import tp_region_enter, tp_region_exit

            # the LayerNorm runs INSIDE the kernel on every shard, so its
            # input and params all get partial cotangents that the f
            # operator must reassemble (the residual path stays outside)
            rows_in = tp_region_enter(rows, self.tp_axis)
            s2 = tp_region_enter(s2, self.tp_axis)
            b2 = tp_region_enter(b2, self.tp_axis)
        else:
            rows_in = rows
        part = fused_mlp_partial(rows_in, s2, b2, w1, bb1, w2)
        if shard:
            part = tp_region_exit(part, self.tp_axis)
        out = (rows.astype(jnp.float32) + part + bb2).astype(self.dtype)
        return out.reshape(B, N, D)


class DDDMDiT(nn.Module):
    """Distributional diffusion denoiser with a DiT backbone for images.

    Call signature (the framework-wide denoiser contract):
        ``model(xt, t, xi) -> x0_hat``
    with ``xt``/``xi`` images of identical shape and ``t`` of shape ``[B]``.

    Attributes mirror the reference constructor
    (``/root/reference/dddm/model.py:183-196``); defaults are DiT-S/4 on
    32x32 images. ``in_channels`` counts the *concatenated* [xt, xi] input
    (6 for RGB), matching the reference convention.
    """

    img_size: int = 32
    patch_size: int = 4
    in_channels: int = 6
    out_channels: int = 3
    embed_dim: int = 384
    depth: int = 8
    num_heads: int = 6
    time_embed_dim: int = 256
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    data_format: str = "NCHW"  # public API layout; internal compute is NHWC
    attention_impl: str = "auto"
    fused_mlp: bool = True
    remat: bool = False  # checkpoint each block: trade FLOPs for HBM
                         # (needed for DiT-B+ widths at the paper's B*m=2048)
    # Hybrid persist-residuals MLP backward (ROOFLINE §4): the FIRST
    # ``mlp_persist_blocks`` blocks run their MLP half-block as plain XLA
    # with autodiff-saved residuals (no forward recompute in the backward,
    # a measured 2.6 ms/block at DiT-B) at ~0.43 GiB HBM per persisted
    # block (measured; XLA remats the elementwise chains in-fusion); the
    # rest keep the kernel-forward + recompute backward. Measured sweep:
    # DiT-B b256 persist 0->12 = 409.7->430.2 img/s, DiT-L b128 persist
    # 24 = 132.4 (repo best). 0 = all recompute (memory-safe default).
    # Incompatible with remat (remat discards the residuals, paying both
    # costs).
    mlp_persist_blocks: int = 0
    # Tensor parallelism (Megatron layout; see _TPAttention). tp > 1 selects
    # separate column-parallel q/k/v projections; tp_axis names the mesh
    # axis when running inside shard_map on local weight shards, None keeps
    # full weights (init / sampling / replicated oracle).
    tp: int = 1
    tp_axis: Optional[str] = None
    # Megatron sequence parallelism on top of TP (DiTBlock.sequence_parallel):
    # between blocks the residual stream is token-sharded (B, N/tp, D) over
    # the model axis; the embed output enters through an f-wrapped token
    # slice and the last block's output leaves through sp_region_exit
    # (all-gather forward, slice-own-shard backward). Activation memory and
    # LN compute in the block stack scale 1/tp at identical comm volume.
    # Inert when tp_axis is None (init / sampling / replicated oracle).
    sequence_parallel: bool = False
    # Mixture-of-Experts MLP halves (ddm_tpu.models.moe): > 1 replaces
    # every block's dense MLP with top-1-routed expert FFNs; with tp > 1
    # the experts shard over the model axis (expert parallelism).
    moe_experts: int = 0
    moe_capacity: float = 1.25
    # routing group size (ddm_tpu.models.moe.MoEMLP.group_size): 0 = one
    # group (exact; dispatch quadratic in rows — unit-test shapes only);
    # set a few hundred for training shapes.
    moe_group_size: int = 0
    # routed experts per token: 1 = Switch, 2 = GShard top-2
    moe_topk: int = 1

    def setup(self):
        if self.img_size % self.patch_size != 0:
            raise ValueError("Image size must be divisible by patch size")
        if self.tp > 1:
            hidden = int(self.embed_dim * self.mlp_ratio)
            if (self.embed_dim % self.tp or self.num_heads % self.tp
                    or hidden % self.tp):
                raise ValueError(
                    "tp must divide embed_dim, num_heads, and the MLP hidden "
                    f"size (got tp={self.tp}, dim={self.embed_dim}, "
                    f"heads={self.num_heads}, hidden={hidden})"
                )
        grid = self.img_size // self.patch_size
        self.num_patches = grid * grid
        if self.sequence_parallel:
            if self.tp <= 1:
                raise ValueError("sequence_parallel requires tp > 1")
            if self.num_patches % self.tp:
                raise ValueError(
                    f"sequence_parallel needs the token count "
                    f"({self.num_patches}) divisible by tp={self.tp}"
                )
        if self.moe_experts > 1:
            if self.moe_experts % self.tp:
                raise ValueError(
                    f"moe_experts ({self.moe_experts}) must be divisible "
                    f"by tp ({self.tp}) for expert parallelism"
                )
            if self.mlp_persist_blocks:
                raise ValueError(
                    "mlp_persist_blocks applies to the dense MLP half, "
                    "which moe_experts replaces"
                )
        self.patch_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="patch_proj")
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, self.num_patches, self.embed_dim),
            jnp.float32,
        )
        self.time_mlp = [
            nn.Dense(self.embed_dim, dtype=self.dtype, name="time_mlp_0"),
            nn.Dense(self.embed_dim, dtype=self.dtype, name="time_mlp_1"),
        ]
        if self.remat and self.mlp_persist_blocks:
            raise ValueError(
                "mlp_persist_blocks is incompatible with remat: the block "
                "checkpoint discards the persisted residuals, paying both "
                "the HBM and the recompute cost"
            )
        block_cls = nn.remat(DiTBlock) if self.remat else DiTBlock
        self.blocks = [
            block_cls(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                dtype=self.dtype,
                attention_impl=self.attention_impl,
                fused_mlp=self.fused_mlp,
                tp=self.tp,
                tp_axis=self.tp_axis,
                mlp_persist=i < self.mlp_persist_blocks,
                sequence_parallel=self.sequence_parallel,
                moe_experts=self.moe_experts,
                moe_capacity=self.moe_capacity,
                moe_group_size=self.moe_group_size,
                moe_topk=self.moe_topk,
                name=f"block_{i}",
            )
            for i in range(self.depth)
        ]
        self.final_norm = nn.LayerNorm(dtype=jnp.float32, name="final_norm")
        self.unembed = nn.Dense(
            self.out_channels * self.patch_size * self.patch_size,
            dtype=self.dtype,
            name="unembed",
        )

    def _patchify(self, x: jnp.ndarray) -> jnp.ndarray:
        """NHWC image -> (B, N, p*p*C) patch tokens (pure reshape)."""
        return patchify_images(x, self.patch_size)

    def _unpatchify(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """(B, N, p*p*C_out) patch tokens -> NHWC image (pure reshape)."""
        B, N, _ = tokens.shape
        p = self.patch_size
        g = self.img_size // p
        if N != g * g:
            raise ValueError("Token count does not match image dimensions")
        x = tokens.reshape(B, g, g, p, p, self.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, g, p, g, p, C)
        return x.reshape(B, self.img_size, self.img_size, self.out_channels)

    def tokens(self, xt: jnp.ndarray, t: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
        """Denoiser output as PATCH TOKENS ``(B, N, p*p*C_out)`` in fp32 —
        ``__call__`` minus the final unpatchify.

        Training-loss fast path: the energy score reduces a sum of squared
        differences over the flattened data axis, which is permutation-
        invariant, so the loss can consume tokens directly (with the target
        run through :func:`patchify_images` for the matching permutation)
        and skip the unpatchify transposes + fp32 image-layout copies in
        both the forward and backward pass (~3 ms/step measured at the
        CIFAR DiT-S shape). Values are bit-identical to flattening
        ``__call__``'s output: unpatchify is a pure permutation applied
        after the same bf16 rounding.
        """
        h = self.embed_tokens(xt, t, xi)
        sp = self.sequence_parallel and self.tp_axis is not None
        if sp:
            from ddm_tpu.parallel.tp import tp_region_enter

            # Enter the token-sharded region: the embed output is
            # replicated over the model axis but each shard consumes only
            # its token block, so f-wrap (psum backward) BEFORE the slice —
            # the slice transpose zero-pads and the psum reassembles the
            # full cotangent, keeping the replicated embed grads correct.
            nl = self.num_patches // self.tp
            h = tp_region_enter(h, self.tp_axis)
            i = jax.lax.axis_index(self.tp_axis)
            h = jax.lax.dynamic_slice_in_dim(h, i * nl, nl, 1)
        for block in self.blocks:
            h = block(h)
        if sp:
            from ddm_tpu.parallel.tp import sp_region_exit

            h = sp_region_exit(h, self.tp_axis, 1)
        return self.head_tokens(h)

    def embed_tokens(
        self, xt: jnp.ndarray, t: jnp.ndarray, xi: jnp.ndarray
    ) -> jnp.ndarray:
        """Everything before the block stack: ``(xt, t, xi) -> (B, N, D)``.

        Exposed as a separate method (``apply(..., method="embed_tokens")``)
        so the pipeline-parallel runner (:mod:`ddm_tpu.parallel.pipeline`)
        can compute the embedding outside the staged block loop. Touches only
        the patch/time/pos parameters, so it can be applied with a param tree
        that carries no ``block_*`` subtrees.
        """
        if xt.shape != xi.shape:
            raise ValueError("xt and xi must have the same shape")
        if xt.ndim != 4:
            raise ValueError("Expecting image tensors of rank 4")
        if self.data_format == "NCHW":
            xt = xt.transpose(0, 2, 3, 1)
            xi = xi.transpose(0, 2, 3, 1)

        x = jnp.concatenate([xt, xi], axis=-1).astype(self.dtype)
        h = self.patch_proj(self._patchify(x))  # (B, N, D)

        temb = sinusoidal_time_embedding(
            t.reshape(-1).astype(jnp.float32), self.time_embed_dim
        ).astype(self.dtype)
        temb = self.time_mlp[1](nn.silu(self.time_mlp[0](temb)))

        return h + temb[:, None, :] + self.pos_embed.astype(self.dtype)

    def head_tokens(self, h: jnp.ndarray) -> jnp.ndarray:
        """Everything after the block stack: ``(B, N, D) -> fp32 tokens``.

        Counterpart of :meth:`embed_tokens` for the pipeline-parallel runner;
        touches only ``final_norm`` and ``unembed``.
        """
        h = self.final_norm(h).astype(self.dtype)
        return self.unembed(h).astype(jnp.float32)

    def __call__(self, xt: jnp.ndarray, t: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
        out = self._unpatchify(self.tokens(xt, t, xi))
        if self.data_format == "NCHW":
            out = out.transpose(0, 3, 1, 2)
        return out
