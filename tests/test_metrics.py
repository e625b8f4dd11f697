"""Tests for MMD and Frechet-distance metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddm_tpu.metrics import (
    KernelMMDLoss,
    compute_activation_statistics,
    compute_image_mmd,
    frechet_distance,
    matrix_sqrt_psd,
    rbf_mmd2,
)


def np_rbf_mmd2(x, y, sigma=1.0):
    def pdist2(a, b):
        return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)

    gamma = 1 / (2 * sigma**2)
    n, m = len(x), len(y)
    kxx = np.exp(-gamma * pdist2(x, x))
    kyy = np.exp(-gamma * pdist2(y, y))
    kxy = np.exp(-gamma * pdist2(x, y))
    kxx = kxx[~np.eye(n, dtype=bool)].mean()
    kyy = kyy[~np.eye(m, dtype=bool)].mean()
    return kxx + kyy - 2 * kxy.mean()


def test_rbf_mmd2_matches_numpy_oracle(rng):
    x = rng.normal(size=(20, 5)).astype(np.float32)
    y = rng.normal(size=(30, 5)).astype(np.float32) + 0.5
    for sigma in (0.5, 1.0, 2.0):
        got = float(rbf_mmd2(jnp.asarray(x), jnp.asarray(y), sigma=sigma))
        np.testing.assert_allclose(got, np_rbf_mmd2(x, y, sigma), rtol=1e-4, atol=1e-6)


def test_rbf_mmd2_unbiasedness(rng):
    """Same-distribution MMD^2 is ~0 in expectation (reference test strategy)."""
    vals = []
    for i in range(20):
        x = rng.normal(size=(64, 4)).astype(np.float32)
        y = rng.normal(size=(64, 4)).astype(np.float32)
        vals.append(float(rbf_mmd2(jnp.asarray(x), jnp.asarray(y))))
    assert abs(np.mean(vals)) < 5e-3


def test_rbf_mmd2_chunked_path_matches_direct(rng):
    """The streaming row-chunked kernel sums (used above
    _MMD_CHUNK_THRESHOLD rows, e.g. the 10k-sample pixel-MMD protocol)
    agree with the materialise-the-kernel path on identical inputs —
    including the off-diagonal masking of kxx/kyy and uneven n != m."""
    from ddm_tpu.metrics import _mmd2_terms, _mmd2_terms_chunked

    x = jnp.asarray(rng.normal(size=(96, 7)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(60, 7)).astype(np.float32) + 0.3)
    for sigma in (0.7, 1.0):
        direct = _mmd2_terms(x, y, sigma)
        chunked = _mmd2_terms_chunked(x, y, sigma)
        for d, c in zip(direct, chunked):
            np.testing.assert_allclose(float(d), float(c), rtol=1e-5,
                                       atol=1e-7)


def test_rbf_mmd2_chunk_rows_divisor():
    from ddm_tpu.metrics import _chunk_rows

    assert _chunk_rows(10000) == 1000
    assert _chunk_rows(4096) == 1024
    assert _chunk_rows(7, target=4) == 1  # prime: falls back to 1
    for n in (96, 60, 50000):
        assert n % _chunk_rows(n) == 0


def test_rbf_mmd2_requires_two_samples():
    with pytest.raises(ValueError, match="at least two"):
        rbf_mmd2(jnp.zeros((1, 3)), jnp.zeros((5, 3)))


def test_rbf_mmd2_flattens_images(rng):
    x = rng.normal(size=(6, 2, 2, 3)).astype(np.float32)
    y = rng.normal(size=(6, 2, 2, 3)).astype(np.float32)
    got = float(rbf_mmd2(jnp.asarray(x), jnp.asarray(y)))
    want = np_rbf_mmd2(x.reshape(6, -1), y.reshape(6, -1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_matrix_sqrt_psd(rng):
    a = rng.normal(size=(8, 8)).astype(np.float32)
    mat = a @ a.T
    root = np.asarray(matrix_sqrt_psd(jnp.asarray(mat)))
    np.testing.assert_allclose(root @ root, mat, rtol=1e-3, atol=1e-3)


def test_frechet_distance_identical_is_zero(rng):
    mu = rng.normal(size=(16,)).astype(np.float32)
    a = rng.normal(size=(16, 16)).astype(np.float32)
    sigma = a @ a.T
    d = float(frechet_distance(mu, sigma, mu, sigma))
    assert d == pytest.approx(0.0, abs=1e-2)


def test_frechet_distance_analytic_gaussian_case():
    """Diagonal case: FD = |mu1-mu2|^2 + sum (sqrt(s1) - sqrt(s2))^2."""
    d = 4
    mu1 = np.zeros(d, np.float32)
    mu2 = np.ones(d, np.float32) * 2.0
    s1 = np.diag([1.0, 2.0, 3.0, 4.0]).astype(np.float32)
    s2 = np.diag([4.0, 3.0, 2.0, 1.0]).astype(np.float32)
    eps = 1e-6
    want = (np.sum((mu1 - mu2) ** 2)
            + np.sum((np.sqrt(np.diag(s1) + eps) - np.sqrt(np.diag(s2) + eps)) ** 2))
    got = float(frechet_distance(mu1, s1, mu2, s2))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_activation_statistics_streaming(rng):
    feats = rng.normal(size=(50, 7)).astype(np.float32)
    loader = [feats[i : i + 16] for i in range(0, 50, 16)]
    mu, cov = compute_activation_statistics(loader, lambda x: jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu), feats.mean(0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), np.cov(feats.T), rtol=1e-3, atol=1e-4)


def test_activation_statistics_max_items_cap(rng):
    feats = rng.normal(size=(50, 3)).astype(np.float32)
    loader = [feats[i : i + 20] for i in range(0, 50, 20)]
    mu, _ = compute_activation_statistics(loader, lambda x: jnp.asarray(x), max_items=25)
    np.testing.assert_allclose(np.asarray(mu), feats[:25].mean(0), rtol=1e-4, atol=1e-5)


def test_compute_image_mmd_truncates_to_common_count(rng):
    fake = [rng.normal(size=(8, 2, 2, 1)).astype(np.float32)]
    real = [(rng.normal(size=(12, 2, 2, 1)).astype(np.float32), np.zeros(12))]
    val = float(compute_image_mmd(fake, real))
    want = np_rbf_mmd2(fake[0].reshape(8, -1), real[0][0][:8].reshape(8, -1))
    np.testing.assert_allclose(val, want, rtol=1e-4, atol=1e-6)


def test_kernel_mmd_loss_zero_for_identical(rng):
    x = rng.normal(size=(16, 4)).astype(np.float32)
    loss = KernelMMDLoss()(jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)


def test_kernel_mmd_loss_positive_for_shifted(rng):
    x = rng.normal(size=(16, 4)).astype(np.float32)
    y = x + 3.0
    assert float(KernelMMDLoss()(jnp.asarray(x), jnp.asarray(y))) > 0.1
