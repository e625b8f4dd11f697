"""Shared dispatch policy for the Pallas kernels.

Every fused op (attention, MLP half-block, energy score) gates on
:func:`kernels_enabled`: the real Mosaic kernels run on TPU, and setting
``DDM_TPU_PALLAS_INTERPRET=1`` runs them in Pallas *interpret mode* on any
backend. Interpret mode executes the same kernel bodies (index maps, block
specs, accumulation order) as pure jnp ops, which is what lets CPU tests —
including shard_map tensor-parallel tests on the 8-device virtual mesh —
assert that the KERNEL path (not the XLA fallback) produces oracle-exact
values and gradients.
"""

from __future__ import annotations

import os

import jax

__all__ = ["interpret_mode", "kernels_enabled", "fast_gelu_enabled"]


def interpret_mode() -> bool:
    """True when kernels should run via the Pallas interpreter."""
    return os.environ.get("DDM_TPU_PALLAS_INTERPRET", "0") == "1"


def kernels_enabled() -> bool:
    """True when the fused-kernel paths may be selected at all."""
    return jax.default_backend() == "tpu" or interpret_mode()


def fast_gelu_enabled() -> bool:
    """Opt-in sigmoid-approximated GELU (``DDM_TPU_FAST_GELU=1``).

    Replaces the exact-erf GELU with ``x * sigmoid(1.702 x)`` in BOTH the
    fused MLP kernels and the XLA/jnp fallbacks (so fused and unfused
    paths stay numerically consistent with each other). This CHANGES the
    model function vs the reference (max |Δ| ≈ 0.02 around |x| ≈ 2) in
    exchange for less VPU work — the erf-free ceiling measures
    −0.79 ms/block fwd+bwd at the DiT-S production shape (kbench). Off by
    default; the reference-parity path is exact erf. Read at TRACE time:
    flip it before jit-compiling, not between steps of a compiled loop.
    """
    return os.environ.get("DDM_TPU_FAST_GELU", "0") == "1"
