#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
for m in baseline gep sst; do
  echo "=== $m ==="
  python -m cfdnn_tpu.apps.channel --config "$m.cfg" "$@"
done
python compare.py
