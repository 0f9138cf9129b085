#!/usr/bin/env bash
# Test entry points (VERDICT r1 item 8: tiered suite).
#
#   scripts/ci.sh         fast tier: unit + golden tests  (< 5 min)
#   scripts/ci.sh all     everything, incl. @slow multiprocess smokes and
#                         train-loop integration tests    (~17 min)
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-fast}" == "all" ]]; then
    exec python -m pytest tests/ -q -m ""
else
    exec python -m pytest tests/ -q
fi
