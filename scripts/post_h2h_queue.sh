#!/bin/bash
# Post-head-to-head measurement queue: waits for the h2h chain (pid file
# /tmp/h2h_chain.pid) to exit so both the TPU tunnel slot and the single
# CPU core are free, then runs the round-3 clean measurements serially:
#   1. phase2_probe       — glue decomposition incl. the flat-Adam win
#   2. bench.py           — uncontaminated headline (the 11:22/12:40
#                           runs raced the torch reference for the core)
#   3. pipeline_quality   — fast-path quality gate after the flat-Adam +
#                           aligned-feature-crossing changes
#   4. e2e_ml_layout      — ML-half e2e with recorded artifacts (CPU)
#
# Usage: nohup bash scripts/post_h2h_queue.sh > /tmp/postq.log 2>&1 &
set -u
REPO=/root/repo
cd "$REPO"
state() { echo "$(date -u +%H:%M:%S) $*"; }

CHAIN_PID=$(cat /tmp/h2h_chain.pid 2>/dev/null || echo "")
if [ -n "$CHAIN_PID" ]; then
  state "waiting on h2h chain pid=$CHAIN_PID"
  while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
fi
state "chain done; probing tunnel"

probe() {
  PYTHONPATH="$REPO:/root/.axon_site" timeout -k 15 90 python -c "
import jax, jax.numpy as jnp
jax.devices()
x = jnp.ones((128, 128), jnp.bfloat16)
(x @ x).block_until_ready()
print('TPU_OK')
" 2>/dev/null | grep -q TPU_OK
}

until probe; do state "tunnel dead; retry in 5 min"; sleep 300; done
state "tunnel live — queue start"

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  state "start $name"
  timeout -k 30 "$to" "$@" > "/tmp/${name}.log" 2>&1
  state "done $name rc=$?"
}

run p2probe_clean 2400 env PYTHONPATH="$REPO:/root/.axon_site" \
  python scripts/phase2_probe.py
run bench_clean 3600 env PYTHONPATH="$REPO:/root/.axon_site" \
  python bench.py
run pq_clean 3600 env PYTHONPATH="$REPO:/root/.axon_site" \
  python scripts/pipeline_quality.py --occupancy --fused
run e2e_ml 5400 env PYTHONPATH="$REPO:/root/.axon_site" \
  python scripts/e2e_ml_layout.py --device tpu
state "queue complete"
