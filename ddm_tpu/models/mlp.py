"""Toy 2-D distributional denoiser ``x_hat_theta(t, x_t, xi)`` (Flax).

TPU-native re-implementation of the reference's ``TimeFeat`` and ``DDDMMLP``
(``/root/reference/dddm/model.py:29-67``): fixed (non-trainable) Fourier time
features with frequencies ``linspace(1, n, n) * 2*pi``, then a 4-hidden-layer
SiLU MLP over the concatenation ``[x_t (2), xi (2), timefeat (time_dim)]``
producing a 2-D ``x_hat_0``.

The denoiser interface contract shared by every backbone in this framework is

    ``apply(params, xt, t, xi) -> x0_hat``

with ``xt``/``xi`` of identical shape and ``t`` of shape ``[B]`` — consumed by
the training step and the ``lax.scan`` sampler alike (reference consumers:
``training.py:74``, ``sampling.py:28``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["fourier_time_features", "DDDMMLP"]


def fourier_time_features(t: jnp.ndarray, n: int) -> jnp.ndarray:
    """Fixed Fourier features ``[sin(2*pi*k*t), cos(2*pi*k*t)]_{k=1..n}``.

    Args:
        t: times, shape ``[B]``.
        n: number of frequencies; output dim is ``2 * n``.

    Reference parity: ``TimeFeat`` at ``/root/reference/dddm/model.py:29-38``
    (frequencies are linspace(1, n, n), not powers of two).
    """
    freqs = jnp.linspace(1.0, float(n), n, dtype=t.dtype)
    f = freqs[None, :] * (2.0 * math.pi) * t[:, None]
    return jnp.concatenate([jnp.sin(f), jnp.cos(f)], axis=-1)


class DDDMMLP(nn.Module):
    """MLP distributional denoiser for 2-D toy data.

    Attributes:
        time_dim: total time-feature dimension (``time_dim // 2`` frequencies).
        hidden: hidden width of all four SiLU layers.
        out_dim: data dimensionality (2 for the toy GMM).
        dtype: computation dtype (params stay float32).
    """

    time_dim: int = 32
    hidden: int = 128
    out_dim: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xt: jnp.ndarray, t: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
        t = t.reshape(-1).astype(self.dtype)
        xt = xt.astype(self.dtype)
        xi = xi.astype(self.dtype)
        tf = fourier_time_features(t, self.time_dim // 2)
        h = jnp.concatenate([xt, xi, tf], axis=-1)
        for _ in range(4):
            h = nn.Dense(self.hidden, dtype=self.dtype)(h)
            h = nn.silu(h)
        out = nn.Dense(self.out_dim, dtype=self.dtype)(h)
        return out.astype(jnp.float32)
