#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
case "${1:-re100}" in
  re100)     # confined cylinder, vortex street in a channel
    python -m cfdnn_tpu.apps.cylinder --config cylinder_re100.cfg ;;
  external)  # open-domain unit cylinder: published St ~ 0.165, Cl ~ 0.33
    python -m cfdnn_tpu.apps.cylinder --external "${@:2}" ;;
  re3900)    # subcritical LES benchmark (TPU, ~minutes)
    python ../../validation/run_les_cylinder3900.py "${@:2}" ;;
  *) echo "usage: ./run.sh [re100|external|re3900]"; exit 2 ;;
esac
