#!/usr/bin/env bash
# Run the toy m/beta/lambda hyperparameter sweep (sweep_toy.py) —
# framework-native tooling; no reference counterpart.
#
#   scripts/sweep_toy.sh [sweep_toy.py flags...]
set -euo pipefail

here=$(cd -- "$(dirname -- "$0")" && pwd)
root=$(cd -- "$here/.." && pwd)

exec python "$root/sweep_toy.py" "$@"
