#!/usr/bin/env bash
# CI driver (reference: scripts/ci.sh — label suites + QOI_JSON collection
# into artifacts/ci_metrics.json + gated-baseline comparison).
#
# Usage: scripts/ci.sh [fast|full] [--update-gated]
#
# fast: everything not marked slow (plus the perf sentinel); gated QOIs
#       that ran must be in tolerance (missing ones are fine).
# full: the whole suite; every gated QOI must be present AND in tolerance.
set -euo pipefail
cd "$(dirname "$0")/.."

TIER="${1:-fast}"
mkdir -p artifacts

case "$TIER" in
  fast)  ARGS=(tests/ -q -x -m "not slow" --deselect tests/test_convergence.py::test_poiseuille_refinement_rate)
         REQUIRE_ALL=() ;;
  full)  ARGS=(tests/ -q)
         REQUIRE_ALL=(--require-all) ;;
  *) echo "unknown tier $TIER"; exit 2 ;;
esac

LOG=artifacts/ci_${TIER}.log
STATUS=0
# `|| STATUS=$?` keeps set -e/pipefail from aborting before the QOI
# collection + gated comparison run on a failing suite
python -m pytest "${ARGS[@]}" -s 2>&1 | tee "$LOG" || STATUS=$?

python scripts/collect_qois.py "$LOG" artifacts/ci_metrics.json
GATED=tests/baselines/gated_qois.json
if [[ "${2:-}" == "--update-gated" ]]; then
  python scripts/collect_qois.py --update-gated artifacts/ci_metrics.json "$GATED"
elif [[ -f "$GATED" ]]; then
  python scripts/collect_qois.py --compare \
    artifacts/ci_metrics.json "$GATED" ${REQUIRE_ALL[@]+"${REQUIRE_ALL[@]}"} \
    || STATUS=1
fi
exit "$STATUS"
