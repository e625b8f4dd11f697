#!/usr/bin/env bash
# Run the TPU benchmark harness (bench.py) — prints one JSON line with
# img/s/chip and an audited MFU. Framework-native tooling; no reference
# counterpart.
#
#   scripts/bench.sh [bench.py flags...]          # e.g. --mode sample
set -euo pipefail

here=$(cd -- "$(dirname -- "$0")" && pwd)
root=$(cd -- "$here/.." && pwd)

exec python "$root/bench.py" "$@"
