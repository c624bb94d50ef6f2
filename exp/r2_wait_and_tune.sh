#!/bin/bash
# Wait (unbounded) for the TPU pool claim to come back, then run the
# round-2 tuning pass. Designed to be launched detached:
#   setsid nohup bash exp/r2_wait_and_tune.sh &
set -u
cd /root/repo
LOG=exp/r2_tune.log
echo "=== waiting for TPU claim $(date -u +%FT%TZ) ===" >> $LOG
python - >> $LOG 2>&1 <<'EOF'
import time
t0 = time.time()
import jax
print("claim granted after %.1fs: %s" % (time.time() - t0, jax.devices()),
      flush=True)
EOF
bash exp/r2_tune.sh
