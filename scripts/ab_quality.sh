#!/usr/bin/env bash
# One-command quality A/B matrix (VERDICT r3 item 7): every shipped
# decision that is blocked on real data, settled in one invocation on the
# first networked machine, emitting a single comparison JSON.
#
#   scripts/ab_quality.sh [--dry-run] [train_cifar10_dit.py flags...]
#
# Arms (each a full train + paper-protocol eval; see PARITY.md for why
# each default is currently what it is):
#   base       exact-erf GELU, fp32 FID tower, reference churn (1.0)
#   fast_gelu  DDM_TPU_FAST_GELU=1 sigmoid-GELU (+10.5% throughput; is the
#              1.4e-5 loss delta visible in FID?)
#   fid_bf16   bf16 Inception tower (2x eval throughput; does the metric move?)
#   churn0     --eps-churn 0 (sampler churn off; reference default is 1.0)
#   moe_top1   shipped MoE config, Switch top-1 routing
#   moe_top2   same, GShard top-2 (2x expert FLOPs for quality?)
#
#   --dry-run  executes the ENTIRE matrix synthetically (no network, no
#              real training, --dry-eval protocol rehearsal) — CI-safe,
#              same contract as repro_paper.sh --dry-run.
#
# Extra flags are forwarded to every arm, so e.g.
# `scripts/ab_quality.sh --epochs 100` runs a shorter-budget matrix.
set -euo pipefail

here=$(cd -- "$(dirname -- "$0")" && pwd)
root=$(cd -- "$here/.." && pwd)

OUT=${OUT:-"$root/outputs/ab_quality"}
DATA=${DATA:-"$root/data"}

dry=0
if [[ "${1-}" == "--dry-run" ]]; then
  dry=1
  shift
fi

common=()
moe_common=()
if [[ $dry == 1 ]]; then
  echo "[ab] DRY RUN: synthetic data, no weight fetch, tiny protocol"
  common=(--synthetic --dry-eval --epochs 1 --batch 32
          --embed-dim 64 --depth 2 --heads 2
          --eval-batch 32 --eval-samples 64 --fid-samples 64
          --mmd-samples 64 --sample-batch 8)
  moe_common=(--moe-experts 4 --moe-group-size 64)
else
  python "$root/scripts/fetch_inception_weights.py" --selftest
  common=(--config "$root/configs/cifar10_dit.yaml" --data-dir "$DATA")
  moe_common=(--config "$root/configs/cifar10_dit_moe.yaml" --data-dir "$DATA")
fi

run_arm() {  # run_arm <name> <env KEY=V or -> <flags...>
  local name=$1 env_kv=$2
  shift 2
  echo "[ab] arm: $name"
  if [[ "$env_kv" == "-" ]]; then
    python "$root/train_cifar10_dit.py" "$@" --out "$OUT/$name"
  else
    env "$env_kv" python "$root/train_cifar10_dit.py" "$@" --out "$OUT/$name"
  fi
}

run_arm base      -                   "${common[@]}" "$@"
run_arm fast_gelu DDM_TPU_FAST_GELU=1 "${common[@]}" --fast-gelu "$@"
run_arm fid_bf16  -                   "${common[@]}" --fid-bf16 "$@"
run_arm churn0    -                   "${common[@]}" --eps-churn 0.0 "$@"
if [[ $dry == 1 ]]; then
  run_arm moe_top1 - "${common[@]}" "${moe_common[@]}" "$@"
  run_arm moe_top2 - "${common[@]}" "${moe_common[@]}" --moe-topk 2 "$@"
else
  run_arm moe_top1 - "${moe_common[@]}" "$@"
  run_arm moe_top2 - "${moe_common[@]}" --moe-topk 2 "$@"
fi

python "$root/scripts/collect_ab.py" "$OUT"
echo "[ab] done. Comparison: $OUT/ab_quality.json"
