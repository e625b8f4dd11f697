"""Megatron-style tensor-parallel region operators (shard_map bodies).

Inside ``shard_map`` with ``check_vma=False`` (required: XLA cannot infer
varying-axes metadata through ``pallas_call``), JAX transposes ``psum`` the
pmap-historical way, which over-counts cotangents crossing the collective
and under-counts cotangents of replicated values consumed by sharded
branches. The classic fix is Megatron's pair of conjugate operators with
explicit transposes (Shoeybi et al. 2019, §3):

  * :func:`tp_region_enter` — the **f** operator. Identity forward; psum
    backward. Wrap the replicated activation feeding a column-parallel
    matmul (q/k/v, ff_in): each model shard's backward contributes only its
    own columns' cotangent, and the psum reassembles the full dL/dx.
  * :func:`tp_region_exit` — the **g** operator. psum forward; identity
    backward. Wrap the partial products of a row-parallel matmul (proj,
    ff_out): the forward allreduce replicates the activation, and because
    everything downstream is replicated across the model axis, the incoming
    cotangent already equals the true dL/d(partial) on every shard.

With both in place, every activation outside a sharded region has
replicated cotangents, so replicated parameters (LayerNorms, embeddings,
patch/unembed) receive full, correct gradients per shard with NO extra
gradient collectives over the model axis; model-sharded parameters get
their correct local shard gradients. The DP ``pmean`` over the data axis is
the only gradient collective the training step needs.

The reference has no parallelism of any kind (SURVEY §2); this module backs
the multi-chip capability mandated by BASELINE.json.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["tp_region_enter", "tp_region_exit", "sp_region_exit"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_region_enter(x, axis_name: str):
    """Identity forward / psum backward (Megatron's f operator)."""
    return x


def _enter_fwd(x, axis_name: str):
    return x, None


def _enter_bwd(axis_name: str, _, ct):
    return (jax.lax.psum(ct, axis_name),)


tp_region_enter.defvjp(_enter_fwd, _enter_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_region_exit(x, axis_name: str):
    """psum forward / identity backward (Megatron's g operator)."""
    return jax.lax.psum(x, axis_name)


def _exit_fwd(x, axis_name: str):
    return jax.lax.psum(x, axis_name), None


def _exit_bwd(axis_name: str, _, ct):
    return (ct,)


tp_region_exit.defvjp(_exit_fwd, _exit_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def sp_region_exit(x, axis_name: str, axis: int = 1):
    """Sequence-parallel exit: all-gather forward / slice-own-shard backward.

    Leaves a Megatron-SP region (token-sharded residual stream) into
    replicated downstream compute (final norm, unembed, loss — all computed
    identically on every model shard). The raw ``jax.lax.all_gather``
    transpose is ``psum_scatter``, which is correct only when each shard's
    cotangent is a *partial* contribution; here the downstream is
    replicated, so every shard already holds the FULL cotangent and the
    psum_scatter would over-count it ``tp``-fold (measured exactly tp x on
    the 4-device harness). The correct transpose is therefore to take back
    only this shard's own token slice — the conjugate of
    :func:`tp_region_exit` for gathers instead of psums.

    Entering an SP region from replicated activations needs no new
    operator: wrap with :func:`tp_region_enter` (f) and ``dynamic_slice``
    the local token block — the slice transpose zero-pads and the f psum
    reassembles the full cotangent.
    """
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=True)


def _sp_exit_fwd(x, axis_name: str, axis: int):
    return (
        jax.lax.all_gather(x, axis_name, axis=axis, tiled=True),
        x.shape[axis],
    )


def _sp_exit_bwd(axis_name: str, axis: int, n_local, ct):
    i = jax.lax.axis_index(axis_name)
    return (jax.lax.dynamic_slice_in_dim(ct, i * n_local, n_local, axis),)


sp_region_exit.defvjp(_sp_exit_fwd, _sp_exit_bwd)
