#!/usr/bin/env python
"""Convert a reference (PyTorch) checkpoint into a ddm_tpu checkpoint.

Migration path for users of the reference implementation: their trained
``model.pt`` / ``model_final.pt`` (payload ``{"model": state_dict,
"config": ...}``, see ``/root/reference/dddm/training.py:168`` and
``train_cifar10_dit.py:32-37``) becomes a ``.ckpt`` that ``generate.py``
and the library loaders consume directly — no retraining.

Usage:
    python scripts/convert_reference_ckpt.py model_final.pt out.ckpt
    python generate.py --ckpt out.ckpt --n 64 --out samples.png

The reverse direction (``--to-torch``) exports a run trained HERE as a
reference-format ``model.pt`` so it can be evaluated or resumed under the
reference implementation:

    python scripts/convert_reference_ckpt.py --to-torch out/model_final.ckpt model.pt

Architecture (DiT vs toy MLP) is detected from the state_dict/param-tree
keys; the embedded config rides along (the CLI arg names already match
``ddm_tpu.models.factory``).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("src", help="source checkpoint (.pt, or .ckpt with "
                               "--to-torch)")
    p.add_argument("dst", help="output checkpoint (.ckpt, or .pt with "
                               "--to-torch)")
    p.add_argument("--to-torch", action="store_true",
                   help="reverse direction: ddm_tpu .ckpt -> reference "
                        "torch.save({'model', 'config'}) .pt")
    p.add_argument("--allow-pickle", action="store_true",
                   help="permit full pickle deserialisation (needed for the "
                        "toy path's embedded TrainConfig object; executes "
                        "code from the file - trusted checkpoints only)")
    args = p.parse_args(argv)

    import jax

    if args.to_torch:
        from ddm_tpu.utils.checkpoint import load_params
        from ddm_tpu.utils.convert import save_reference_checkpoint

        variables, config = load_params(args.src)
        save_reference_checkpoint(args.dst, variables, config)
        arch = "DDDMDiT" if "patch_proj" in variables["params"] else "DDDMMLP"
        print(f"exported {arch} -> reference-format {args.dst}")
        return

    from ddm_tpu.utils.checkpoint import save_checkpoint
    from ddm_tpu.utils.convert import load_reference_checkpoint

    variables, config = load_reference_checkpoint(
        args.src, allow_pickle=args.allow_pickle
    )
    n_leaves = len(jax.tree.leaves(variables))
    save_checkpoint(args.dst, variables, config)
    arch = "DDDMDiT" if "patch_proj" in variables["params"] else "DDDMMLP"
    print(f"converted {arch} ({n_leaves} tensors) -> {args.dst}")


if __name__ == "__main__":
    main(sys.argv[1:])
