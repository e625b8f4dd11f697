#!/usr/bin/env bash
# Launch CIFAR-10 DiT training (train_cifar10_dit.py).
#
#   scripts/run_cifar10.sh [config.yaml] [train_cifar10_dit.py flags...]
#
# A leading non-flag argument selects the YAML config; otherwise the
# shipped paper config configs/cifar10_dit.yaml is used. Everything else
# is forwarded to the entry point verbatim. Behavioral contract mirrors
# the reference wrapper (/root/reference/scripts/run_cifar10.sh), pinned
# by tests/test_scripts.py.
set -euo pipefail

here=$(cd -- "$(dirname -- "$0")" && pwd)
root=$(cd -- "$here/.." && pwd)

cfg="$root/configs/cifar10_dit.yaml"
case "${1-}" in
  "" | -*) ;;      # no positional config: keep the default
  *) cfg=$1; shift ;;
esac

exec python "$root/train_cifar10_dit.py" --config "$cfg" "$@"
