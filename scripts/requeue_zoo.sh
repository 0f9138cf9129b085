#!/bin/bash
# Re-run zoo legs that failed (wedged-init exit 75 / timeout 124), with
# per-leg retries.  Waits for the current zoo_rebuild chain to finish
# first.  A wedge costs 10 min (watchdog) and the retry usually succeeds;
# caps are sized for steady-state throughput + compile + one wedge.
cd /root/repo

for _ in $(seq 240); do
  grep -q ZOO_REBUILD_DONE logs/zoo_rebuild.log 2>/dev/null && break
  sleep 60
done
grep -q ZOO_REBUILD_DONE logs/zoo_rebuild.log || { echo "PREV_CHAIN_NEVER_FINISHED"; exit 1; }

run_leg() { # key steps cap_minutes
  for attempt in 1 2 3; do
    echo "=== $(date -u +%H:%M:%S) $1 attempt $attempt (cap $3m) ==="
    timeout "$3"m python -u scripts/train_zoo.py --models "$1" --steps "$2" && return 0
    echo "ATTEMPT_FAILED $1 #$attempt (exit $?)"
    sleep 30
  done
  echo "LEG_GAVE_UP $1"
}

run_leg admm4    15000 70
run_leg admm2    15000 65
run_leg shapenet 12000 55
run_leg resunet  12000 50
echo "REQUEUE_DONE $(date -u +%H:%M:%S)"
