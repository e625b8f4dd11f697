"""Inception/FID numerical fidelity against torch semantics.

Closes SURVEY §7's #1 hard part ("Inception/FID fidelity") with three
anchors:

1. **Committed golden vectors** (``fixtures/inception_goldens.npz``):
   pool3 features + intermediate taps computed by a torch oracle
   (``inception_oracle.py`` — torchvision-identical module graph and
   state_dict keys) under the reference's exact input protocol
   (``/root/reference/dddm/metrics.py:40-48``). The Flax tower must
   reproduce them without torch in the loop.
2. **Live torch cross-check** (skipped when torch is absent): the same
   comparison against the environment's own torch, plus bilinear-resize
   parity jax.image.resize == F.interpolate(align_corners=False).
3. **Converter schema**: the converter consumes the oracle's REAL
   state_dict (564 torchvision tower keys, incl. num_batches_tracked) —
   not a synthetic dict derived from the Flax tree.

The weights are deterministic (``inception_weights.make_state_dict``), so
every anchor pins the same parameter set.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inception_weights import KEY_SHAPES_PATH, load_key_shapes, make_state_dict

from ddm_tpu.models.inception import (
    InceptionEmbedding,
    InceptionV3,
    convert_torch_inception_state_dict,
    preprocess_for_inception,
)

try:
    import torch
except ImportError:  # pragma: no cover - torch is present in CI
    torch = None

GOLDENS_PATH = os.path.join(
    os.path.dirname(__file__), "fixtures", "inception_goldens.npz"
)
GOLDENS = np.load(GOLDENS_PATH)

# fp32 tolerance through the 94-conv tower: conv algorithms differ between
# XLA:CPU/TPU and torch (measured headroom ~10x below these bounds).
TOWER_MAX_ABS = 2e-3
TOWER_MEAN_ABS = 2e-4


@pytest.fixture(scope="module")
def flax_inception():
    shapes = load_key_shapes()
    sd = make_state_dict(shapes, seed=int(GOLDENS["seed"]))
    params = convert_torch_inception_state_dict(sd)
    return InceptionV3(dtype=jnp.float32), params


def _nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(x_nchw, (0, 2, 3, 1))


def test_key_shapes_fixture_matches_flax_tree(flax_inception):
    """Every committed torchvision key converts; the tree is complete."""
    model, params = flax_inception
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    got = jax.tree_util.tree_structure(params)
    want = jax.tree_util.tree_structure(ref)
    assert got == want
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(ref)[0],
    ):
        assert str(pa) == str(pb)
        assert va.shape == vb.shape, f"{pa}: {va.shape} vs {vb.shape}"


def test_golden_tower_taps_and_features(flax_inception):
    """Raw tower on a fixed 299x299 input matches the torch goldens at
    first-conv, Mixed_5b/6e/7c taps and the 2048-d pool3 output."""
    model, params = flax_inception
    x = jnp.asarray(_nhwc(GOLDENS["x299"]))
    feats, state = model.apply(params, x, capture_intermediates=True)
    taps = state["intermediates"]

    def flax_tap(name):
        out = np.asarray(taps[name]["__call__"][0])
        return np.transpose(out, (0, 3, 1, 2))[:, :8, :8, :8]

    for name, key in [
        ("Conv2d_1a_3x3", "tap_conv1a"),
        ("Mixed_5b", "tap_mixed5b"),
        ("Mixed_6e", "tap_mixed6e"),
        ("Mixed_7c", "tap_mixed7c"),
    ]:
        diff = np.abs(flax_tap(name) - GOLDENS[key])
        assert diff.max() < TOWER_MAX_ABS, f"{name}: max {diff.max()}"

    diff = np.abs(np.asarray(feats) - GOLDENS["feats299"])
    assert diff.max() < TOWER_MAX_ABS, f"pool3 max {diff.max()}"
    assert diff.mean() < TOWER_MEAN_ABS, f"pool3 mean {diff.mean()}"


def test_golden_full_protocol_pool3(flax_inception):
    """clamp -> [0,1] -> bilinear 299 -> normalize -> tower reproduces the
    torch-oracle pool3 vectors for CIFAR-shaped inputs (includes resize)."""
    model, params = flax_inception
    x = preprocess_for_inception(jnp.asarray(GOLDENS["images"]))  # NCHW in
    feats = model.apply(params, x)
    diff = np.abs(np.asarray(feats) - GOLDENS["pool3"])
    assert diff.max() < TOWER_MAX_ABS, f"max {diff.max()}"
    assert diff.mean() < TOWER_MEAN_ABS, f"mean {diff.mean()}"


@pytest.mark.skipif(torch is None, reason="torch not installed")
def test_embedding_loads_real_torch_checkpoint(tmp_path):
    """End-to-end: torch.save'd state_dict -> InceptionEmbedding -> goldens."""
    sd = make_state_dict(load_key_shapes(), seed=int(GOLDENS["seed"]))
    path = str(tmp_path / "inception_v3.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)

    emb = InceptionEmbedding(weights_path=path, dtype=jnp.float32)
    assert emb.pretrained is True
    feats = emb(jnp.asarray(GOLDENS["images"]))
    diff = np.abs(np.asarray(feats) - GOLDENS["pool3"])
    assert diff.max() < TOWER_MAX_ABS, f"max {diff.max()}"


@pytest.mark.skipif(torch is None, reason="torch not installed")
def test_fetch_script_selftest_logic(tmp_path):
    """The --selftest anchor in scripts/fetch_inception_weights.py (live
    torch-oracle vs converted-JAX pool3 on a known image) must PASS when
    fed a correct state_dict — so the first networked run exercises a
    pre-verified code path and any failure it reports is about the real
    weights, not script wiring."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "fetch_inception_weights",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "fetch_inception_weights.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in make_state_dict(load_key_shapes(),
                                      seed=int(GOLDENS["seed"])).items()}
    path = str(tmp_path / "inception_v3.pth")
    torch.save(sd, path)
    mod._selftest(sd, path)  # raises SystemExit on disagreement


@pytest.mark.skipif(torch is None, reason="torch not installed")
def test_oracle_state_dict_keys_match_fixture():
    """Guard against fixture drift: the committed key->shape map IS the
    torch oracle's state_dict schema."""
    from inception_oracle import InceptionV3FeaturesOracle

    net = InceptionV3FeaturesOracle()
    live = {k: tuple(v.shape) for k, v in net.state_dict().items()}
    assert live == load_key_shapes(KEY_SHAPES_PATH)


@pytest.mark.skipif(torch is None, reason="torch not installed")
@pytest.mark.parametrize("hw", [(32, 32), (75, 64)])
def test_resize_parity_vs_torch(hw):
    """jax.image.resize(bilinear, antialias=False) == F.interpolate(
    mode='bilinear', align_corners=False) for the protocol's upsampling."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, *hw)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(299, 299), mode="bilinear",
        align_corners=False,
    ).numpy()
    got = np.transpose(
        np.asarray(
            jax.image.resize(
                jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                (2, 299, 299, 3), method="bilinear", antialias=False,
            )
        ),
        (0, 3, 1, 2),
    )
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=0)


@pytest.mark.skipif(torch is None, reason="torch not installed")
def test_live_torch_oracle_matches_flax(flax_inception):
    """Fresh weights (different seed than the goldens) through BOTH stacks:
    proves parity against the environment's own torch, not just the
    committed numbers."""
    from inception_oracle import InceptionV3FeaturesOracle

    shapes = load_key_shapes()
    sd = make_state_dict(shapes, seed=7)
    net = InceptionV3FeaturesOracle().eval()
    net.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    )
    rng = np.random.default_rng(11)
    x = rng.normal(size=(1, 3, 299, 299)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()

    model, _ = flax_inception
    params = convert_torch_inception_state_dict(sd)
    got = np.asarray(model.apply(params, jnp.asarray(_nhwc(x))))
    diff = np.abs(got - want)
    assert diff.max() < TOWER_MAX_ABS, f"max {diff.max()}"
