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

__all__ = ["sample_gmm", "GMM2D", "GMM", "plot_contours", "plot_MoG40"]


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


def plot_contours(
    log_prob_func,
    samples=None,
    ax=None,
    bounds=(-25.0, 25.0),
    grid_width_n_points: int = 100,
    n_contour_levels=None,
    log_prob_min: float = -1000.0,
    plot_marginal_dims=(0, 1),
    s: int = 2,
    alpha: float = 0.6,
    title=None,
    plt_show: bool = True,
    xy_tick: bool = True,
):
    """Contours of a 2-D log-density with optional sample overlay.

    Port of the reference plot helper (``/root/reference/dddm/data.py:259-316``):
    evaluates ``log_prob_func`` on a square grid, clamps at ``log_prob_min``,
    contours it, and scatters clipped samples on top. The torch-specific
    ``device`` argument is dropped (jnp arrays are accepted directly).
    """
    import itertools

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    if ax is None:
        _, ax = plt.subplots(1)

    x_points = np.linspace(bounds[0], bounds[1], grid_width_n_points)
    grid_points = jnp.asarray(
        list(itertools.product(x_points, x_points)), dtype=jnp.float32
    )
    log_p_x = np.asarray(log_prob_func(grid_points))
    log_p_x = np.clip(log_p_x, log_prob_min, None)
    log_p_x = log_p_x.reshape(grid_width_n_points, grid_width_n_points)

    gp = np.asarray(grid_points)
    x1 = gp[:, 0].reshape(grid_width_n_points, grid_width_n_points)
    x2 = gp[:, 1].reshape(grid_width_n_points, grid_width_n_points)

    if n_contour_levels:
        ax.contour(x1, x2, log_p_x, levels=n_contour_levels)
    else:
        ax.contour(x1, x2, log_p_x)

    if samples is not None:
        samples = np.clip(np.asarray(samples), bounds[0], bounds[1])
        ax.scatter(
            samples[:, plot_marginal_dims[0]],
            samples[:, plot_marginal_dims[1]],
            s=s,
            alpha=alpha,
        )
        if xy_tick:
            ax.set_xticks([bounds[0], 0, bounds[1]])
            ax.set_yticks([bounds[0], 0, bounds[1]])
        ax.tick_params(axis="both", which="major", labelsize=15)

    if title:
        ax.set_title(title, fontsize=15)
    if plt_show:
        plt.show()


def plot_MoG40(log_prob_function, samples, file_name=None, title=None):
    """MoG-40-style density contours with overlaid samples.

    Port of ``/root/reference/dddm/data.py:319-338`` (bounds ±45,
    30 contour levels, 200-point grid).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if file_name is None:
        plot_contours(log_prob_function, samples=samples, bounds=(-45, 45),
                      n_contour_levels=30, grid_width_n_points=200,
                      title=title, plt_show=True)
    else:
        plot_contours(log_prob_function, samples=samples, bounds=(-45, 45),
                      n_contour_levels=30, grid_width_n_points=200,
                      title=title, plt_show=False)
        plt.savefig(file_name)
        plt.close()
