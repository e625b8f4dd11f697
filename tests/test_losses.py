"""Golden tests for the generalized energy-score terms and time weight.

Oracles are independent numpy transcriptions of the loss definitions in
SURVEY §2 row 2 (confinement / interaction terms with the beta/2 power on
squared distances and off-diagonal masking; logistic w(t))."""

import jax.numpy as jnp
import numpy as np
import pytest

from ddm_tpu.ops.losses import (
    generalized_energy_terms,
    pairwise_sqdist,
    sigmoid_weight,
)


def np_energy_terms(x0hats, x0, beta):
    B, m, D = x0hats.shape
    diff = x0[:, None, :] - x0hats
    d2 = (diff**2).sum(-1)
    conf = d2.mean() if beta == 2.0 else ((d2 + 1e-12) ** (beta / 2)).mean()
    pd2 = ((x0hats[:, :, None, :] - x0hats[:, None, :, :]) ** 2).sum(-1)
    mask = ~np.eye(m, dtype=bool)
    vals = pd2[:, mask]  # (B, m*(m-1))
    inter = vals.mean() if beta == 2.0 else ((vals + 1e-12) ** (beta / 2)).mean()
    return conf, inter


def test_pairwise_sqdist_matches_direct():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 5, 7)).astype(np.float32)
    got = pairwise_sqdist(jnp.asarray(x))
    want = ((x[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("beta", [0.1, 1.0, 2.0])
def test_energy_terms_match_numpy_oracle(beta):
    rng = np.random.default_rng(1)
    B, m, D = 4, 8, 6
    x0hats = rng.normal(size=(B, m, D)).astype(np.float32)
    x0 = rng.normal(size=(B, D)).astype(np.float32)
    conf, inter = generalized_energy_terms(jnp.asarray(x0hats), jnp.asarray(x0), beta)
    conf_np, inter_np = np_energy_terms(x0hats, x0, beta)
    np.testing.assert_allclose(float(conf), conf_np, rtol=1e-5)
    np.testing.assert_allclose(float(inter), inter_np, rtol=1e-5)


def test_energy_terms_beta2_fast_path_consistency():
    """beta=2 fast path equals the generic path evaluated at beta=2."""
    rng = np.random.default_rng(2)
    x0hats = jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    conf_fast, inter_fast = generalized_energy_terms(x0hats, x0, 2.0)
    conf_gen, inter_gen = generalized_energy_terms(x0hats, x0, 2.0 + 1e-12)
    np.testing.assert_allclose(float(conf_fast), float(conf_gen), rtol=1e-4)
    np.testing.assert_allclose(float(inter_fast), float(inter_gen), rtol=1e-4)


@pytest.mark.parametrize("beta", [0.1, 2.0])
def test_chunked_interaction_matches_direct(beta):
    """The anchor-row-streamed interaction (used past the 1 GB direct-
    tensor threshold, e.g. m=32 at CIFAR scale) matches the direct form in
    value AND gradient — same stabiliser, same off-diagonal mean."""
    import jax

    from ddm_tpu.ops.losses import _interaction_mean_chunked

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 32, 6)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))

    def direct_inter(xh):
        _, inter = generalized_energy_terms(xh, x0, beta)
        return inter

    got = float(_interaction_mean_chunked(x, beta))
    want = float(direct_inter(x))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    g_got = jax.grad(lambda xh: _interaction_mean_chunked(xh, beta))(x)
    g_want = jax.grad(direct_inter)(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-6)


def test_m32_image_scale_exact_shape():
    """The exact (bb=8, m=32, D=3072) sweep-point slice (VERDICT r2 item 4
    done-criterion): the auto-selected chunked route agrees with the
    directly-materialised form in value and gradient. (A full-batch
    B=256 value+grad smoke runs memory-bounded on the real chip:
    PARITY.md eval section.)"""
    import jax

    from ddm_tpu.ops.losses import _interaction_mean_chunked

    rng = np.random.default_rng(5)
    B, m, D = 8, 32, 3072
    x = jnp.asarray(rng.normal(size=(B, m, D)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    # this shape is over the 1 GB-at-B=256 threshold scaled down — force
    # nothing; just compare the two implementations directly
    def total(fn):
        return lambda xh: fn(xh, 0.1)

    def direct(xh, beta):
        pd2 = ((xh[:, :, None, :] - xh[:, None, :, :]) ** 2).sum(-1)
        powed = jnp.power(pd2 + 1e-12, beta / 2.0)
        off = 1.0 - jnp.eye(m)
        return jnp.sum(powed * off) / (B * m * (m - 1))

    got = float(_interaction_mean_chunked(x, 0.1))
    want = float(direct(x, 0.1))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    g1 = jax.grad(total(_interaction_mean_chunked))(x)
    g2 = jax.grad(total(direct))(x)
    sc = float(jnp.abs(g2).max()) + 1e-12
    assert float(jnp.abs(g1 - g2).max()) / sc < 1e-4


def test_large_m_routes_to_chunked_interaction(monkeypatch):
    """Past _DIRECT_PAIR_ELEMS the loss must stream the interaction term
    (VERDICT r2 weak-item 6: m=32 at image scale used to materialise
    ~3.2 GB). Lower the threshold to force the route at test sizes and pin
    that both routes agree."""
    import ddm_tpu.ops.losses as L

    rng = np.random.default_rng(4)
    x0hats = jnp.asarray(rng.normal(size=(2, 20, 8)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    direct = generalized_energy_terms(x0hats, x0, 0.1)
    monkeypatch.setattr(L, "_DIRECT_PAIR_ELEMS", 1)
    chunked = generalized_energy_terms(x0hats, x0, 0.1)
    np.testing.assert_allclose(float(direct[0]), float(chunked[0]), rtol=1e-6)
    np.testing.assert_allclose(float(direct[1]), float(chunked[1]), rtol=1e-5)


def test_interaction_excludes_diagonal():
    """Identical predictions -> interaction exactly stabiliser^(beta/2)."""
    x0hats = jnp.ones((2, 4, 3))
    x0 = jnp.zeros((2, 3))
    _, inter = generalized_energy_terms(x0hats, x0, 0.5)
    np.testing.assert_allclose(float(inter), (1e-12) ** 0.25, rtol=1e-3)


def test_sigmoid_weight_matches_formula():
    t = np.array([0.1, 0.5, 0.9], dtype=np.float32)
    a, s = 1 - t, t
    z = np.log((a * a) / (s * s + 1e-12) + 1e-12)
    for bias in (0.0, 1.5):
        want = 1 / (1 + np.exp(-(z - bias)))
        got = sigmoid_weight(jnp.asarray(t), bias=bias)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_pairwise_sqdist_exact_for_close_pairs_with_large_norms():
    """Regression: the loss-path pairwise distance must be cancellation-free.

    The Gram expansion loses ~eps * ||x||^2 absolute accuracy, which biases
    the fractional-power interaction gradient and (empirically) diverges
    training at beta = 0.1. Direct differences are exact at any offset.
    """
    base = np.full((1, 1, 4), 100.0, dtype=np.float32)
    delta = 1.0 / 128.0  # exactly representable offset at this magnitude
    x = np.concatenate([base, base + delta], axis=1)
    got = pairwise_sqdist(jnp.asarray(x))
    want = 4 * delta**2  # 4 coords, each delta apart
    np.testing.assert_allclose(float(got[0, 0, 1]), want, rtol=1e-6)


def test_sigmoid_weight_midpoint_half():
    np.testing.assert_allclose(float(sigmoid_weight(jnp.asarray(0.5))), 0.5, atol=1e-5)
