#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")"
REPO="$(cd ../.. && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
# Fast validation tier: every non-slow test + the QOI gate comparison
# (reference example 04 runs its run_validation.sh; here the CI driver
# IS the validation suite).
bash "$REPO/scripts/ci.sh" fast
python "$REPO/scripts/generate_validation_report.py" \
  "$REPO/artifacts/ci_metrics.json"
