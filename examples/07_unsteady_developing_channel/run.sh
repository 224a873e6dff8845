#!/usr/bin/env bash
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}"
# Quick time-accurate laminar transient (~2 min CPU). The DNS configs
# (dns_retau180.cfg, recycling_dns.cfg) are TPU runs — pass one
# explicitly: ./run.sh recycling_dns.cfg
CFG="${1:-laminar.cfg}"
python -m cfdnn_tpu.apps.channel --config "$CFG"
