"""Tests for the lax.scan reverse sampler (Algorithm 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from ddm_tpu.models.mlp import DDDMMLP
from ddm_tpu.ops.schedules import gaussian_bridge_mu_sigma
from ddm_tpu.sampling import sample_dddm, sample_dddm_batched


def _mlp():
    model = DDDMMLP(hidden=16)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 2))
    params = model.init(key, dummy, jnp.zeros((1,)), dummy)
    return model, params


def test_sampler_shape_and_finiteness(key):
    model, params = _mlp()
    x = sample_dddm(model.apply, params, key, n_samples=32, steps=5)
    assert x.shape == (32, 2)
    assert np.all(np.isfinite(np.asarray(x)))


def test_sampler_deterministic_under_fixed_key(key):
    model, params = _mlp()
    x1 = sample_dddm(model.apply, params, key, n_samples=16, steps=4, eps_churn=0.0)
    x2 = sample_dddm(model.apply, params, key, n_samples=16, steps=4, eps_churn=0.0)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_sampler_matches_python_loop(key):
    """The scan body implements exactly the reference per-step update,
    including the argument-order contract: the *prediction* fills the
    bridge's x0 slot (reference sampling.py:29)."""
    model, params = _mlp()
    B, steps = 8, 4
    got = sample_dddm(model.apply, params, key, n_samples=B, steps=steps,
                      eps_churn=0.7)

    # replicate the sampler's RNG layout with a hand-written python loop
    t_grid = jnp.linspace(0.0, 1.0, steps + 1)
    k, kx = jax.random.split(key)
    x = jax.random.normal(kx, (B, 2))
    for kk in reversed(range(steps)):
        s, t = t_grid[kk], t_grid[kk + 1]
        k, kxi, kz = jax.random.split(k, 3)
        xi = jax.random.normal(kxi, x.shape)
        xhat0 = model.apply(params, x, jnp.full((B,), t), xi)
        mu, std = gaussian_bridge_mu_sigma(s, t, xhat0, x, eps_churn=0.7)
        x = mu + std * jax.random.normal(kz, x.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_sampler_custom_data_shape(key):
    model = DDDMMLP(hidden=16, out_dim=3)

    def apply_img(params, xt, t, xi):
        # wrap the MLP as an image denoiser over flattened (1,1,3) "images"
        out = model.apply(params, xt.reshape(-1, 3), t, xi.reshape(-1, 3))
        return out.reshape(xt.shape)

    dummy = jnp.zeros((1, 3))
    params = model.init(jax.random.PRNGKey(0), dummy, jnp.zeros((1,)), dummy)
    x = sample_dddm(apply_img, params, key, n_samples=4, steps=3,
                    data_shape=(1, 1, 3))
    assert x.shape == (4, 1, 1, 3)


def test_batched_sampler_consistency(key):
    model, params = _mlp()
    x = sample_dddm_batched(model.apply, params, key, 10, steps=3, chunk_size=4)
    assert x.shape == (10, 2)
    assert np.all(np.isfinite(np.asarray(x)))


def test_sharded_sampler_matches_per_device_draws(key):
    """DP-sharded sampling (the serving path) equals concatenating each
    device's independent local draw with the same per-device key fold —
    i.e. sharding adds parallelism, not different samples."""
    from ddm_tpu.parallel import make_mesh
    from ddm_tpu.sampling import sample_dddm_sharded

    model, params = _mlp()
    mesh = make_mesh(tp=1)  # 8 virtual devices (conftest)
    dp = mesh.shape["data"]
    n = 4 * dp

    got = sample_dddm_sharded(
        model.apply, params, key, n, mesh=mesh, steps=3, eps_churn=0.5)
    keys = jax.random.split(key, dp)
    want = jnp.concatenate([
        sample_dddm(model.apply, params, keys[i], n_samples=n // dp,
                    steps=3, eps_churn=0.5)
        for i in range(dp)
    ])
    assert got.shape == (n, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-7)


def test_sharded_sampler_rejects_ragged_n(key):
    from ddm_tpu.parallel import make_mesh
    from ddm_tpu.sampling import sample_dddm_sharded

    model, params = _mlp()
    mesh = make_mesh(tp=1)
    import pytest

    with pytest.raises(ValueError, match="divide"):
        sample_dddm_sharded(model.apply, params, key,
                            mesh.shape["data"] + 1, mesh=mesh, steps=2)
