#!/bin/bash
# Round-2 on-chip tuning pass: run every sweep sequentially, append to
# exp/r2_tune.log. Resilient to session restarts — launch once in the
# background and read the log. Each step is independently timeout-capped
# so one hung claim can't eat the whole pass.
set -u
cd /root/repo
LOG=exp/r2_tune.log
echo "=== r2_tune pass started $(date -u +%FT%TZ) ===" >> $LOG

run() {
  local name=$1 tmo=$2; shift 2
  echo "--- $name ($(date +%T)) ---" >> $LOG
  timeout "$tmo" "$@" >> $LOG 2>&1
  echo "--- $name exit=$? ($(date +%T)) ---" >> $LOG
}

run headline      1200 python bench.py
run bench_suite   5400 python bench_suite.py
run sweep_walk    2400 python exp/sweep_walk.py 8 16 32
run sweep_frame   3600 python exp/sweep_frame.py
run diag_large    3600 python exp/diag_large.py 3 4
run bwd_probe     3600 python exp/bwd_probe.py
echo "=== r2_tune pass done $(date -u +%FT%TZ) ===" >> $LOG
