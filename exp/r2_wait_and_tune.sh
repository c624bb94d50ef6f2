#!/bin/bash
# Wait (retrying) for the TPU pool to come back, then run the round-2
# tuning pass. The pool can be DOWN (init fails UNAVAILABLE after ~25 min)
# or CONTENDED (init hangs until granted) — loop probes until one
# actually succeeds. Designed to be launched detached:
#   setsid nohup bash exp/r2_wait_and_tune.sh &
set -u
cd /root/repo
LOG=exp/r2_tune.log
echo "=== waiting for TPU pool $(date -u +%FT%TZ) ===" >> $LOG
until python - >> $LOG 2>&1 <<'EOF'
import sys
import time
t0 = time.time()
import jax
try:
    ds = jax.devices()
except Exception as e:
    print("probe failed after %.1fs: %s" % (time.time() - t0, e), flush=True)
    sys.exit(1)
print("claim granted after %.1fs: %s" % (time.time() - t0, ds), flush=True)
EOF
do
  echo "--- pool still down, retry in 120s ($(date +%T)) ---" >> $LOG
  sleep 120
done
bash exp/r2_tune.sh
