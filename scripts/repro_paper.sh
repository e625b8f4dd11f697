#!/usr/bin/env bash
# One-command paper reproduction (VERDICT r2 item 7): fetch CIFAR-10 and
# the Inception-v3 FID weights, train the paper DiT-S/4 recipe, and emit
# the paper-protocol FID/MMD numbers (50k generated samples, 50k-sample
# FID statistics, 10k-sample pixel MMD) into $OUT/epoch_metrics.json.
#
#   scripts/repro_paper.sh [--dry-run] [train_cifar10_dit.py flags...]
#
#   --dry-run   exercise the ENTIRE pipeline with no network and no
#               training: synthetic data, the --dry-eval protocol
#               rehearsal, and tiny counts. CI-safe; finishes in minutes.
#
# Everything after the optional --dry-run is forwarded to the trainer, so
# e.g. `scripts/repro_paper.sh --epochs 100` runs a shorter-budget repro.
# The first networked run of this script is the measured-FID last mile the
# air-gapped build environment could never produce (ROADMAP gap 1).
set -euo pipefail

here=$(cd -- "$(dirname -- "$0")" && pwd)
root=$(cd -- "$here/.." && pwd)

OUT=${OUT:-"$root/outputs/repro_paper"}
DATA=${DATA:-"$root/data"}

dry=0
if [[ "${1-}" == "--dry-run" ]]; then
  dry=1
  shift
fi

if [[ $dry == 1 ]]; then
  echo "[repro] DRY RUN: synthetic data, no weight fetch, tiny protocol"
  exec python "$root/train_cifar10_dit.py" \
    --synthetic --dry-eval \
    --epochs 1 --batch 32 --embed-dim 64 --depth 2 --heads 2 \
    --eval-batch 32 --eval-samples 64 --fid-samples 64 --mmd-samples 64 \
    --sample-batch 8 --out "$OUT" "$@"
fi

# 1) FID weights (torchvision Inception-v3 IMAGENET1K_V1) into the
#    embedder's default search path, then verify the converted checkpoint
#    end-to-end against the torch oracle on a known image. Idempotent.
python "$root/scripts/fetch_inception_weights.py" --selftest

# 2) CIFAR-10 download happens inside the loader on first use (data.py
#    downloads when the files are absent), so training + the paper eval
#    protocol is one invocation. eval_every=epochs -> one full FID/MMD
#    eval at the end; all protocol counts are the shipped config's
#    (fid_samples=50000, mmd_samples=10000).
python "$root/train_cifar10_dit.py" \
  --config "$root/configs/cifar10_dit.yaml" \
  --data-dir "$DATA" --out "$OUT" "$@"

echo "[repro] done. FID/MMD: $OUT/epoch_metrics.json"
