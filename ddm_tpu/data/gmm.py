"""Synthetic Gaussian-mixture data sources (pure jnp, explicit PRNG keys).

TPU-native re-implementation of the reference's toy data layer
(``/root/reference/dddm/data.py:17-167``):

  * :func:`sample_gmm` — the bimodal 2-D mixture both the toy trainer and the
    toy eval actually use (``data.py:35-47``), as a jittable function of an
    explicit PRNG key so fresh batches are generated *on device* inside the
    compiled training step (no host->device transfer per step).
  * :class:`GMM2D` — the infinite-iterator API of the reference's
    ``IterableDataset`` (``data.py:17-32``), kept for API parity.
  * :class:`GMM` — the general n-component isotropic GMM with ``log_prob`` /
    ``sample`` / ``test_set`` (``data.py:51-167``; dead code in the
    reference, ported for API completeness).
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["sample_gmm", "GMM2D", "GMM"]


def sample_gmm(
    key: jax.Array,
    batch: int,
    mu1: Sequence[float] = (3.0, 3.0),
    mu2: Sequence[float] = (-3.0, 3.0),
    sigma: float = 0.5,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Draw ``batch`` samples from the bimodal 2-D mixture (Section 6.1).

    Bernoulli(0.5) component pick + isotropic Gaussian noise, matching
    ``/root/reference/dddm/data.py:35-47``. Jittable; runs entirely on
    device.
    """
    kb, kn = jax.random.split(key)
    mus = jnp.stack(
        [jnp.asarray(mu1, dtype=dtype), jnp.asarray(mu2, dtype=dtype)], axis=0
    )
    pick = jax.random.bernoulli(kb, 0.5, (batch,)).astype(jnp.int32)
    noise = jax.random.normal(kn, (batch, mus.shape[-1]), dtype=dtype)
    return mus[pick] + sigma * noise


class GMM2D:
    """Infinite iterator over single bimodal-GMM samples (API parity).

    Mirrors the reference ``IterableDataset`` (``data.py:17-32``) without the
    torch dependency. Prefer :func:`sample_gmm` for anything hot — this class
    exists so reference users migrating code that iterates sample-by-sample
    find the same surface.
    """

    def __init__(
        self,
        mu1: Sequence[float] = (3.0, 3.0),
        mu2: Sequence[float] = (-3.0, 3.0),
        sigma: float = 0.5,
        seed: int = 0,
    ) -> None:
        self.mu1 = jnp.asarray(mu1, dtype=jnp.float32)
        self.mu2 = jnp.asarray(mu2, dtype=jnp.float32)
        self.sigma = float(sigma)
        self._key = jax.random.PRNGKey(seed)

    def __iter__(self) -> Iterator[jnp.ndarray]:
        key = self._key
        while True:
            key, kb, kn = jax.random.split(key, 3)
            which = jax.random.bernoulli(kb, 0.5)
            mu = jnp.where(which, self.mu1, self.mu2)
            yield mu + self.sigma * jax.random.normal(kn, (2,))


class GMM:
    """General n-component GMM with diagonal (softplus-scaled) covariance.

    Functional-core port of the reference's ``GMM`` module
    (``/root/reference/dddm/data.py:51-167``): random component means in
    ``[-loc_scaling, loc_scaling]^dim``, per-component scale
    ``softplus(log_var_scaling)``, uniform mixture weights. ``log_prob``
    applies the same -1e4 clipping-to--inf stabilisation.
    """

    def __init__(
        self,
        dim: int,
        n_mixes: int,
        loc_scaling: float,
        log_var_scaling: float = 0.1,
        seed: int = 0,
        n_test_set_samples: int = 1000,
    ) -> None:
        self.dim = dim
        self.n_mixes = n_mixes
        self.n_test_set_samples = n_test_set_samples
        key = jax.random.PRNGKey(seed)
        self.locs = (jax.random.uniform(key, (n_mixes, dim)) - 0.5) * 2 * loc_scaling
        self.scale = jax.nn.softplus(jnp.full((n_mixes, dim), log_var_scaling))
        self.log_weights = jnp.full((n_mixes,), -jnp.log(n_mixes))

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.asarray(x)
        # (batch, n_mixes) per-component diagonal-Gaussian log densities.
        diff = (x[..., None, :] - self.locs) / self.scale
        comp = -0.5 * jnp.sum(diff * diff, axis=-1) - jnp.sum(
            jnp.log(self.scale), axis=-1
        ) - 0.5 * self.dim * jnp.log(2 * jnp.pi)
        lp = jax.scipy.special.logsumexp(comp + self.log_weights, axis=-1)
        return jnp.where(lp < -1e4, -jnp.inf, lp)

    def sample(self, key: jax.Array, shape: Tuple[int, ...] = (1,)) -> jnp.ndarray:
        kc, kn = jax.random.split(key)
        idx = jax.random.categorical(
            kc, jnp.broadcast_to(self.log_weights, shape + (self.n_mixes,))
        )
        noise = jax.random.normal(kn, shape + (self.dim,))
        return self.locs[idx] + self.scale[idx] * noise

    def test_set(self, key: jax.Array) -> jnp.ndarray:
        return self.sample(key, (self.n_test_set_samples,))
