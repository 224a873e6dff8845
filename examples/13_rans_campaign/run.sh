#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
# Sweep ALL closures on the channel (reference example 13 sweeps 9
# closures x 4 IBM geometries on H100; the IBM geometries run via the
# apps — see README). --quick: ~10 min. Full: drop --quick.
python ../../scripts/run_all_models.py --case channel --quick \
  --output_dir output "$@"
cat output/campaign_channel.md
