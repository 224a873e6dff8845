#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
# Preferred: the Tier-2 driver (time-averaged Re_tau + log-law gates).
# ./run.sh wale | vreman | dynamic_smagorinsky
MODEL="${1:-wale}"
python ../../validation/run_les_channel.py --Re-tau 395 \
  --Nx 96 --Ny 96 --Nz 96 --model "$MODEL" "${@:2}"
