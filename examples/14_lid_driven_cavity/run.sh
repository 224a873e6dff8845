#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
CFG="${1:-cavity_re100.cfg}"
python -m cfdnn_tpu.apps.cavity --config "$CFG"
