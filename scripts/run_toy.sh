#!/usr/bin/env bash
# Launch the toy 2-D GMM experiment (run_example.py).
#
#   scripts/run_toy.sh [config.yaml] [run_example.py flags...]
#
# A leading non-flag argument selects the YAML config; otherwise the
# shipped configs/toy_gmm.yaml is used. Everything else is forwarded to
# the entry point verbatim. Behavioral contract mirrors the reference
# wrapper (/root/reference/scripts/run_toy.sh), pinned by
# tests/test_scripts.py.
set -euo pipefail

here=$(cd -- "$(dirname -- "$0")" && pwd)
root=$(cd -- "$here/.." && pwd)

cfg="$root/configs/toy_gmm.yaml"
case "${1-}" in
  "" | -*) ;;      # no positional config: keep the default
  *) cfg=$1; shift ;;
esac

exec python "$root/run_example.py" --config "$cfg" "$@"
