"""Shape/contract and property tests for the denoiser backbones."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddm_tpu.models.dit import DDDMDiT, sinusoidal_time_embedding
from ddm_tpu.models.mlp import DDDMMLP, fourier_time_features


def test_fourier_time_features_values():
    t = jnp.array([0.25])
    n = 4
    feats = fourier_time_features(t, n)
    freqs = np.linspace(1, n, n)
    want = np.concatenate(
        [np.sin(2 * np.pi * freqs * 0.25), np.cos(2 * np.pi * freqs * 0.25)]
    )
    np.testing.assert_allclose(feats[0], want, rtol=1e-5, atol=1e-6)


def test_mlp_denoiser_contract(key):
    model = DDDMMLP()
    B = 5
    xt = jax.random.normal(key, (B, 2))
    xi = jax.random.normal(jax.random.fold_in(key, 1), (B, 2))
    t = jax.random.uniform(jax.random.fold_in(key, 2), (B,))
    params = model.init(key, xt, t, xi)
    out = model.apply(params, xt, t, xi)
    assert out.shape == (B, 2)
    assert out.dtype == jnp.float32


def test_mlp_depends_on_xi(key):
    """The denoiser is stochastic: distinct xi must give distinct outputs."""
    model = DDDMMLP()
    B = 4
    xt = jnp.ones((B, 2))
    t = jnp.full((B,), 0.5)
    params = model.init(key, xt, t, xt)
    out1 = model.apply(params, xt, t, jnp.zeros((B, 2)))
    out2 = model.apply(params, xt, t, jnp.ones((B, 2)))
    assert not np.allclose(out1, out2)


def test_sinusoidal_embedding_properties():
    emb = sinusoidal_time_embedding(jnp.array([0.0]), 8)
    np.testing.assert_allclose(emb[0, :4], 0.0, atol=1e-6)  # sin(0)
    np.testing.assert_allclose(emb[0, 4:], 1.0, atol=1e-6)  # cos(0)
    # odd dim pads one zero
    emb_odd = sinusoidal_time_embedding(jnp.array([0.3]), 7)
    assert emb_odd.shape == (1, 7)
    assert float(emb_odd[0, -1]) == 0.0


@pytest.fixture(scope="module")
def tiny_dit():
    model = DDDMDiT(
        img_size=8, patch_size=2, in_channels=6, out_channels=3,
        embed_dim=32, depth=2, num_heads=2, time_embed_dim=16,
    )
    key = jax.random.PRNGKey(0)
    xt = jnp.zeros((2, 3, 8, 8))
    params = model.init(key, xt, jnp.zeros((2,)), xt)
    return model, params


def test_dit_denoiser_contract(tiny_dit, key):
    model, params = tiny_dit
    B = 2
    xt = jax.random.normal(key, (B, 3, 8, 8))
    xi = jax.random.normal(jax.random.fold_in(key, 1), (B, 3, 8, 8))
    t = jnp.full((B,), 0.5)
    out = model.apply(params, xt, t, xi)
    assert out.shape == (B, 3, 8, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dit_rejects_mismatched_xi(tiny_dit, key):
    model, params = tiny_dit
    xt = jnp.zeros((2, 3, 8, 8))
    with pytest.raises(ValueError, match="same shape"):
        model.apply(params, xt, jnp.zeros((2,)), jnp.zeros((2, 3, 4, 4)))


def test_dit_nhwc_matches_nchw(key):
    """Layout is an internal detail: NHWC model == NCHW model on same params."""
    kwargs = dict(img_size=8, patch_size=2, embed_dim=32, depth=1,
                  num_heads=2, time_embed_dim=16)
    m_nchw = DDDMDiT(data_format="NCHW", **kwargs)
    m_nhwc = DDDMDiT(data_format="NHWC", **kwargs)
    xt = jax.random.normal(key, (2, 3, 8, 8))
    xi = jax.random.normal(jax.random.fold_in(key, 1), (2, 3, 8, 8))
    t = jnp.full((2,), 0.3)
    params = m_nchw.init(key, xt, t, xi)
    out_nchw = m_nchw.apply(params, xt, t, xi)
    out_nhwc = m_nhwc.apply(
        params, xt.transpose(0, 2, 3, 1), t, xi.transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(
        out_nchw, out_nhwc.transpose(0, 3, 1, 2), rtol=1e-5, atol=1e-5
    )


def test_patchify_unpatchify_inverse(key):
    """Patch embed/unembed reshapes are exact inverses (SURVEY §4)."""
    model = DDDMDiT(img_size=8, patch_size=2, out_channels=3, embed_dim=32,
                    depth=1, num_heads=2, data_format="NHWC")
    x = jax.random.normal(key, (2, 8, 8, 3))
    tokens = model._patchify(x)  # works on unbound module (pure reshape)
    assert tokens.shape == (2, 16, 12)
    back = model._unpatchify(tokens)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_dit_remat_matches_plain(key):
    """remat=True is a memory/FLOPs trade, not a numerics change."""
    kwargs = dict(img_size=8, patch_size=2, embed_dim=32, depth=2,
                  num_heads=2, time_embed_dim=16, data_format="NHWC")
    m0 = DDDMDiT(remat=False, **kwargs)
    m1 = DDDMDiT(remat=True, **kwargs)
    xt = jax.random.normal(key, (2, 8, 8, 3))
    t = jnp.full((2,), 0.5)
    params = m0.init(key, xt, t, xt)
    o0 = m0.apply(params, xt, t, xt)
    o1 = m1.apply(params, xt, t, xt)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-6)
    # gradients flow through the checkpointed blocks
    g = jax.grad(lambda p: jnp.sum(m1.apply(p, xt, t, xt) ** 2))(params)
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(g)[0])))


def test_dit_mlp_persist_matches_plain(key):
    """mlp_persist_blocks is a memory/recompute trade, not a numerics
    change; combining it with remat (which would discard the persisted
    residuals and pay both costs) is rejected at construction."""
    import pytest

    kwargs = dict(img_size=8, patch_size=2, embed_dim=32, depth=2,
                  num_heads=2, time_embed_dim=16, data_format="NHWC")
    m0 = DDDMDiT(mlp_persist_blocks=0, **kwargs)
    m1 = DDDMDiT(mlp_persist_blocks=2, **kwargs)
    xt = jax.random.normal(key, (2, 8, 8, 3))
    t = jnp.full((2,), 0.5)
    params = m0.init(key, xt, t, xt)
    np.testing.assert_allclose(
        np.asarray(m0.apply(params, xt, t, xt)),
        np.asarray(m1.apply(params, xt, t, xt)), atol=1e-6,
    )
    g0 = jax.grad(lambda p: jnp.sum(m0.apply(p, xt, t, xt) ** 2))(params)
    g1 = jax.grad(lambda p: jnp.sum(m1.apply(p, xt, t, xt) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    bad = DDDMDiT(remat=True, mlp_persist_blocks=1, **kwargs)
    with pytest.raises(ValueError, match="mlp_persist"):
        bad.init(key, xt, t, xt)


def test_dit_bf16_compute_close_to_fp32(key):
    kwargs = dict(img_size=8, patch_size=2, embed_dim=32, depth=2,
                  num_heads=2, time_embed_dim=16)
    m32 = DDDMDiT(dtype=jnp.float32, **kwargs)
    m16 = DDDMDiT(dtype=jnp.bfloat16, **kwargs)
    xt = jax.random.normal(key, (2, 3, 8, 8))
    xi = jax.random.normal(jax.random.fold_in(key, 1), (2, 3, 8, 8))
    t = jnp.full((2,), 0.5)
    params = m32.init(key, xt, t, xi)
    out32 = m32.apply(params, xt, t, xi)
    out16 = m16.apply(params, xt, t, xi)
    assert out16.dtype == jnp.float32  # outputs promoted back
    np.testing.assert_allclose(out32, out16, atol=0.15, rtol=0.1)
