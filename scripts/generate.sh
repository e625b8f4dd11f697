#!/usr/bin/env bash
# Sample images from a trained checkpoint (generate.py) — framework-native
# inference surface; no reference counterpart.
#
#   scripts/generate.sh <ckpt-file-or-run-dir> [generate.py flags...]
#
# The leading positional argument (required) is passed as --ckpt; a run
# directory resolves to model_final.ckpt or the latest epoch checkpoint.
set -euo pipefail

here=$(cd -- "$(dirname -- "$0")" && pwd)
root=$(cd -- "$here/.." && pwd)

if [[ $# -lt 1 || ${1} == -* ]]; then
  echo "usage: $0 <ckpt-file-or-run-dir> [generate.py flags...]" >&2
  exit 2
fi
ckpt=$1; shift

exec python "$root/generate.py" --ckpt "$ckpt" "$@"
