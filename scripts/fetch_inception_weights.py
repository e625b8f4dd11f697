#!/usr/bin/env python
"""Download + cache torchvision's Inception-v3 IMAGENET1K_V1 weights for FID.

Networked environments only (this repo's CI/bench environment is
air-gapped; there the embedder falls back to random features with a
warning). The file is a plain ``torch.save``d state_dict that
``ddm_tpu.models.inception.InceptionEmbedding`` converts on load.

Usage:
    python scripts/fetch_inception_weights.py [--out PATH] [--selftest]

Default output: ~/.cache/ddm_tpu/inception_v3.pth (the embedder's default
search path).

``--selftest`` is the REAL-WEIGHT fidelity anchor: after fetching, it runs
one deterministic image through BOTH the torch oracle tower
(``tests/inception_oracle.py`` loaded with the downloaded IMAGENET1K_V1
state_dict) and the converted JAX embedder, and fails if the pool3
features disagree beyond fp32 tolerance. The committed golden-vector
tests pin torch *semantics* on deterministic random weights; this
self-test extends the same check to the actual pretrained checkpoint the
FID definition depends on — run it once in any networked environment.
"""

import argparse
import hashlib
import os
import sys

# torchvision naming convention: the filename suffix is the first 8 hex
# chars of the file's sha256 — verified after download.
URL = "https://download.pytorch.org/models/inception_v3_google-0cc3c7bd.pth"
SHA256_PREFIX = "0cc3c7bd"


def _selftest(sd, out_path: str) -> None:
    """Known-image pool3 agreement: torch oracle vs converted JAX tower."""
    import numpy as np
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "..", "tests"))
    from inception_oracle import (
        InceptionV3FeaturesOracle,
        embed_reference_protocol,
    )

    from ddm_tpu.models.inception import InceptionEmbedding

    # deterministic smooth test image in [-1, 1], NCHW 32^2 (CIFAR shape:
    # exercises the full reference protocol incl. the bilinear resize)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 32), np.linspace(-1, 1, 32),
                         indexing="ij")
    img = np.stack([np.sin(3 * xx) * np.cos(2 * yy),
                    xx * yy,
                    np.cos(5 * (xx + yy))]).astype(np.float32)[None]

    oracle = InceptionV3FeaturesOracle()
    missing, unexpected = oracle.load_state_dict(
        {k: v for k, v in sd.items()
         if not k.startswith(("AuxLogits.", "fc."))}, strict=False)
    if unexpected or any(not m.startswith(("AuxLogits.", "fc."))
                         for m in missing):
        raise SystemExit(f"oracle/state_dict mismatch: missing={missing} "
                         f"unexpected={unexpected}")
    oracle.eval()
    with torch.no_grad():
        want = embed_reference_protocol(
            oracle, torch.from_numpy(img)).numpy()

    emb = InceptionEmbedding(weights_path=out_path)
    if not emb.pretrained:
        raise SystemExit("embedder did not pick up the fetched weights")
    got = np.asarray(emb(img))
    err = float(np.max(np.abs(got - want)))
    print(f"selftest: max |pool3_jax - pool3_torch| = {err:.2e} "
          "(loaded checkpoint, full reference protocol)")
    if err > 5e-3:
        raise SystemExit("FAILED: converted real-weight features disagree "
                         "with the torch oracle beyond fp32 tolerance")
    print("selftest PASSED")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--out",
        default=os.path.expanduser("~/.cache/ddm_tpu/inception_v3.pth"),
    )
    p.add_argument("--selftest", action="store_true",
                   help="verify the converted real weights end-to-end "
                        "against the torch oracle on a known image")
    args = p.parse_args()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    import torch

    try:
        sd = torch.hub.load_state_dict_from_url(URL, map_location="cpu")
    except Exception as exc:  # noqa: BLE001
        raise SystemExit(
            f"Download failed ({exc}). This environment may be air-gapped; "
            "copy a torchvision inception_v3 state_dict to "
            f"{args.out} manually."
        ) from exc
    torch.save(sd, args.out)

    # integrity: torchvision files carry their sha256 prefix in the name
    cached = torch.hub.get_dir()
    digest = None
    for rootdir, _, files in os.walk(cached):
        for f in files:
            if f.startswith("inception_v3_google-"):
                with open(os.path.join(rootdir, f), "rb") as fh:
                    digest = hashlib.sha256(fh.read()).hexdigest()
    if digest is not None and not digest.startswith(SHA256_PREFIX):
        raise SystemExit(f"checksum mismatch: sha256 {digest[:8]} != "
                         f"{SHA256_PREFIX} — corrupted download")

    # sanity: the converter must consume it
    from ddm_tpu.models.inception import convert_torch_inception_state_dict

    params = convert_torch_inception_state_dict(sd)
    n = sum(p.size for p in __import__("jax").tree.leaves(params))
    print(f"Saved {args.out} ({n/1e6:.1f}M converted params)")

    if args.selftest:
        _selftest(sd, args.out)


if __name__ == "__main__":
    main()
