"""Tests for the Flax Inception-v3 embedder (architecture + converter)."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddm_tpu.models.inception import (
    InceptionEmbedding,
    InceptionV3,
    convert_torch_inception_state_dict,
    preprocess_for_inception,
)


def test_preprocess_protocol():
    """clamp -> [0,1] -> normalize matches the reference formula (no resize)."""
    img = jnp.full((1, 3, 4, 4), 2.0)  # clamps to 1.0 -> maps to 1.0
    out = preprocess_for_inception(img, resize=False)
    want = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], want, rtol=1e-5)
    assert out.shape == (1, 4, 4, 3)  # NCHW accepted, NHWC out


def test_preprocess_resizes_to_299():
    img = jnp.zeros((2, 3, 32, 32))
    out = preprocess_for_inception(img)
    assert out.shape == (2, 299, 299, 3)


@pytest.fixture(scope="module")
def incep():
    model = InceptionV3()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    return model, params


def test_inception_feature_shape(incep):
    model, params = incep
    feats = model.apply(params, jnp.zeros((2, 299, 299, 3)))
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_inception_param_count(incep):
    """Feature tower of torchvision inception_v3: ~21.8M params + BN stats."""
    _, params = incep
    n_weights = sum(
        int(np.prod(p.shape))
        for path, p in jax.tree_util.tree_flatten_with_path(params)[0]
        if "bn_mean" not in str(path) and "bn_var" not in str(path)
    )
    assert 21.5e6 < n_weights < 22.5e6, n_weights


def test_converter_fills_every_param(incep):
    """A synthetic torch-style state_dict (right keys/shapes) must convert to
    exactly the Flax param tree (same structure, transposed conv kernels)."""
    model, params = incep
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    sd = {}
    for path, val in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        scope = [k for k in keys if k != "params"]
        arr = np.asarray(val)
        if scope[-1] == "kernel":  # .../conv/kernel
            torch_key = ".".join(scope[:-1]) + ".weight"
            sd[torch_key] = arr.transpose(3, 2, 0, 1)
        else:
            owner = ".".join(scope[:-1])
            leaf = {
                "bn_scale": "bn.weight",
                "bn_bias": "bn.bias",
                "bn_mean": "bn.running_mean",
                "bn_var": "bn.running_var",
            }[scope[-1]]
            sd[f"{owner}.{leaf}" if owner else leaf] = arr
    sd["fc.weight"] = np.zeros((1000, 2048))  # must be ignored
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1))

    converted = convert_torch_inception_state_dict(sd)
    got_flat = jax.tree_util.tree_flatten_with_path(converted)[0]
    want_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    assert len(got_flat) == len(want_flat)
    for (pa, va), (pb, vb) in zip(sorted(got_flat, key=lambda kv: str(kv[0])),
                                  sorted(want_flat, key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_embedding_random_fallback_warns_and_runs():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        emb = InceptionEmbedding(weights_path="/nonexistent", dtype=jnp.float32)
    assert any("RANDOM features" in str(x.message) for x in w)
    assert emb.pretrained is False
    feats = emb(jnp.zeros((2, 3, 32, 32)))
    assert feats.shape == (2, 2048)
