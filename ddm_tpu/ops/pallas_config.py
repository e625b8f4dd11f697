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

__all__ = ["interpret_mode", "kernels_enabled"]


def interpret_mode() -> bool:
    """True when kernels should run via the Pallas interpreter."""
    return os.environ.get("DDM_TPU_PALLAS_INTERPRET", "0") == "1"


def kernels_enabled() -> bool:
    """True when the fused-kernel paths may be selected at all."""
    return jax.default_backend() == "tpu" or interpret_mode()
