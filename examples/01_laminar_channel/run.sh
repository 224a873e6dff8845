#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
python -m cfdnn_tpu.apps.channel --config poiseuille.cfg
python analyze.py
