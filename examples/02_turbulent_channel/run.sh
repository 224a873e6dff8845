#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
# 5-model comparison on the Re_tau=180 channel (reference example 02:
# None / Baseline / GEP / NN-MLP / NN-TBNN). --quick keeps it ~5 min on
# CPU; drop it for converged profiles.
python ../../scripts/run_all_models.py --case channel --quick \
  --models none baseline gep nn_mlp nn_tbnn --output_dir output "$@"
cat output/campaign_channel.md
