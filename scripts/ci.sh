#!/usr/bin/env bash
# CI driver (reference: scripts/ci.sh — label suites + QOI_JSON collection
# into artifacts/ci_metrics.json + baseline comparison).
#
# Usage: scripts/ci.sh [fast|full] [--update-baseline]
set -euo pipefail
cd "$(dirname "$0")/.."

TIER="${1:-fast}"
mkdir -p artifacts

case "$TIER" in
  fast)  ARGS=(tests/ -q -x --deselect tests/test_convergence.py::test_poiseuille_refinement_rate) ;;
  full)  ARGS=(tests/ -q) ;;
  *) echo "unknown tier $TIER"; exit 2 ;;
esac

LOG=artifacts/ci_${TIER}.log
python -m pytest "${ARGS[@]}" -s 2>&1 | tee "$LOG"
STATUS=${PIPESTATUS[0]}

python scripts/collect_qois.py "$LOG" artifacts/ci_metrics.json
if [[ "${2:-}" == "--update-baseline" ]]; then
  cp artifacts/ci_metrics.json tests/baselines/baseline_tpu.json
  echo "baseline updated"
elif [[ -f tests/baselines/baseline_tpu.json ]]; then
  python scripts/collect_qois.py --compare \
    artifacts/ci_metrics.json tests/baselines/baseline_tpu.json
fi
exit "$STATUS"
