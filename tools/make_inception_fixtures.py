"""Generate the committed Inception fidelity fixtures (run once, commit).

Outputs (both under ``tests/fixtures/``):
  * ``inception_key_shapes.json`` — every state_dict key of the torch
    oracle's feature tower with its shape. This IS the torchvision
    ``inception_v3`` tower key set (AuxLogits/fc excluded), so converter
    tests driven by it exercise the real checkpoint schema.
  * ``inception_goldens.npz`` — deterministic inputs in [-1, 1] plus the
    pool3 features and intermediate taps computed by the TORCH oracle under
    the reference input protocol (clamp -> [0,1] -> bilinear 299 -> ImageNet
    normalize -> tower). ``tests/test_inception_fidelity.py`` replays the
    Flax pipeline against these without needing torch at test time.

Usage:  python tools/make_inception_fixtures.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from inception_oracle import InceptionV3FeaturesOracle, embed_reference_protocol
from inception_weights import KEY_SHAPES_PATH, make_state_dict

FIXTURES_DIR = os.path.dirname(KEY_SHAPES_PATH)
GOLDENS_PATH = os.path.join(FIXTURES_DIR, "inception_goldens.npz")

SEED = 0
N_IMAGES = 4


def main() -> None:
    os.makedirs(FIXTURES_DIR, exist_ok=True)
    net = InceptionV3FeaturesOracle().eval()

    key_shapes = {k: list(v.shape) for k, v in net.state_dict().items()}
    with open(KEY_SHAPES_PATH, "w", encoding="utf-8") as f:
        json.dump(key_shapes, f, indent=1, sort_keys=True)
    print(f"wrote {KEY_SHAPES_PATH}: {len(key_shapes)} keys")

    sd_np = make_state_dict({k: tuple(v) for k, v in key_shapes.items()}, SEED)
    net.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()})

    rng = np.random.default_rng(1234)
    # CIFAR-shaped inputs in [-1, 1] with some out-of-range values so the
    # clamp step of the protocol is exercised too.
    images = rng.uniform(-1.2, 1.2, size=(N_IMAGES, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        pool3 = embed_reference_protocol(net, torch.from_numpy(images))
        # raw-tower taps on a fixed 299x299 input (protocol-independent)
        x299 = rng.normal(0.0, 1.0, size=(1, 3, 299, 299)).astype(np.float32)
        feats299, taps = net(torch.from_numpy(x299), return_taps=True)

    np.savez_compressed(
        GOLDENS_PATH,
        seed=np.asarray(SEED),
        images=images,
        pool3=pool3.numpy(),
        x299=x299,
        feats299=feats299.numpy(),
        tap_conv1a=taps["Conv2d_1a_3x3"].numpy()[:, :8, :8, :8],
        tap_mixed5b=taps["Mixed_5b"].numpy()[:, :8, :8, :8],
        tap_mixed6e=taps["Mixed_6e"].numpy()[:, :8, :8, :8],
        tap_mixed7c=taps["Mixed_7c"].numpy()[:, :8, :8, :8],
    )
    size_kb = os.path.getsize(GOLDENS_PATH) / 1024
    print(f"wrote {GOLDENS_PATH} ({size_kb:.0f} KiB)")
    print("pool3 stats:", pool3.mean().item(), pool3.std().item())


if __name__ == "__main__":
    main()
