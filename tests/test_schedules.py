"""Golden-value tests for the schedule/bridge math core.

Expected values are computed by an independent numpy transcription of the
paper equations (eqs. (2)-(4)) as catalogued in SURVEY §2 row 1, including
the corrected linear-ratio bridge coefficients and the documented
deterministic-limit identity (reference ``schedules.py:51-57``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddm_tpu.ops.schedules import (
    alpha_sigma,
    forward_marginal_sample,
    gaussian_bridge_mu_sigma,
)


def np_bridge(s, t, x0, xt, eps_churn):
    """Independent numpy oracle for eq. (4) with linear sigma ratios."""
    a_s, sig_s = 1.0 - s, s
    a_t, sig_t = 1.0 - t, t
    guard = 1e-8
    ratio = sig_s / (sig_t + guard)
    alpha_ratio = a_t / (a_s + guard)
    e2 = eps_churn**2
    coef_xt = e2 * alpha_ratio * ratio**2 + (1 - e2) * ratio
    coef_x0 = a_s * (1 - e2 * alpha_ratio * ratio**2 - (1 - e2) * alpha_ratio * ratio)
    mu = coef_xt * xt + coef_x0 * x0
    inner = e2 * alpha_ratio * ratio + (1 - e2)
    var = sig_s**2 * np.clip(1 - inner**2, 0, None)
    return mu, np.sqrt(var)


def test_alpha_sigma_linear_schedule():
    t = jnp.array([0.0, 0.25, 0.5, 1.0])
    a, s = alpha_sigma(t)
    np.testing.assert_allclose(a, [1.0, 0.75, 0.5, 0.0])
    np.testing.assert_allclose(s, [0.0, 0.25, 0.5, 1.0])


def test_forward_marginal_matches_equation():
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(4, 3, 2)).astype(np.float32)
    eps = rng.normal(size=(4, 3, 2)).astype(np.float32)
    t = np.array([0.1, 0.4, 0.7, 0.95], dtype=np.float32)
    got = forward_marginal_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(eps))
    want = (1 - t)[:, None, None] * x0 + t[:, None, None] * eps
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_forward_marginal_scalar_t_broadcasts():
    x0 = jnp.ones((5, 2))
    eps = jnp.zeros((5, 2))
    out = forward_marginal_sample(x0, 0.25, eps)
    np.testing.assert_allclose(out, 0.75 * np.ones((5, 2)), rtol=1e-6)


@pytest.mark.parametrize("eps_churn", [0.0, 0.3, 1.0])
def test_bridge_matches_numpy_oracle(eps_churn):
    rng = np.random.default_rng(2)
    x0 = rng.normal(size=(6, 2)).astype(np.float32)
    xt = rng.normal(size=(6, 2)).astype(np.float32)
    s, t = 0.3, 0.5
    mu, std = gaussian_bridge_mu_sigma(s, t, jnp.asarray(x0), jnp.asarray(xt), eps_churn)
    mu_np, std_np = np_bridge(s, t, x0, xt, eps_churn)
    np.testing.assert_allclose(mu, mu_np, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.broadcast_to(std, mu.shape),
                               np.broadcast_to(std_np, mu_np.shape),
                               rtol=1e-5, atol=1e-6)


def test_bridge_deterministic_limit_identity():
    """eps_churn=0: mu = (sig_s/sig_t) x_t + (a_s - (sig_s/sig_t) a_t) x0, std = 0.

    This is the corrected-coefficient identity recorded in the reference
    comment (schedules.py:51-57); the build must match the corrected math.
    """
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=(8, 2)).astype(np.float32)
    xt = rng.normal(size=(8, 2)).astype(np.float32)
    s, t = 0.4, 0.6
    mu, std = gaussian_bridge_mu_sigma(s, t, jnp.asarray(x0), jnp.asarray(xt), 0.0)
    ratio = s / (t + 1e-8)
    want = ratio * xt + ((1 - s) - ratio * (1 - t)) * x0
    np.testing.assert_allclose(mu, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), 0.0, atol=1e-6)


def test_bridge_batched_times():
    rng = np.random.default_rng(4)
    B = 5
    x0 = rng.normal(size=(B, 2)).astype(np.float32)
    xt = rng.normal(size=(B, 2)).astype(np.float32)
    s = np.linspace(0.1, 0.5, B).astype(np.float32)
    t = s + 0.2
    mu, std = gaussian_bridge_mu_sigma(
        jnp.asarray(s), jnp.asarray(t), jnp.asarray(x0), jnp.asarray(xt), 0.7
    )
    mu_np, std_np = np_bridge(s[:, None], t[:, None], x0, xt, 0.7)
    np.testing.assert_allclose(mu, mu_np, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(std, std_np, rtol=1e-5, atol=1e-6)


def test_bridge_is_jittable_and_gradable():
    f = jax.jit(lambda s, t, x0, xt: gaussian_bridge_mu_sigma(s, t, x0, xt, 0.5)[0].sum())
    g = jax.grad(f, argnums=2)(0.2, 0.4, jnp.ones((3, 2)), jnp.ones((3, 2)))
    assert g.shape == (3, 2)
    assert np.all(np.isfinite(np.asarray(g)))
