#!/usr/bin/env python
"""Download + cache torchvision's Inception-v3 IMAGENET1K_V1 weights for FID.

Networked environments only (this repo's CI/bench environment is
air-gapped; there the embedder falls back to random features with a
warning). The file is a plain ``torch.save``d state_dict that
``ddm_tpu.models.inception.InceptionEmbedding`` converts on load.

Usage:
    python scripts/fetch_inception_weights.py [--out PATH]

Default output: ~/.cache/ddm_tpu/inception_v3.pth (the embedder's default
search path).
"""

import argparse
import os

URL = "https://download.pytorch.org/models/inception_v3_google-0cc3c7bd.pth"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--out",
        default=os.path.expanduser("~/.cache/ddm_tpu/inception_v3.pth"),
    )
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

    # sanity: the converter must consume it
    from ddm_tpu.models.inception import convert_torch_inception_state_dict

    params = convert_torch_inception_state_dict(sd)
    n = sum(p.size for p in __import__("jax").tree.leaves(params))
    print(f"Saved {args.out} ({n/1e6:.1f}M converted params)")


if __name__ == "__main__":
    main()
