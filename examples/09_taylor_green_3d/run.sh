#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
python -m cfdnn_tpu.apps.taylor_green_3d --config tgv_re1600.cfg "$@"
