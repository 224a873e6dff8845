#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
AOA="${1:-0}"
python -m cfdnn_tpu.apps.airfoil --config naca0012.cfg \
  --aoa_deg "$AOA" "${@:2}"
