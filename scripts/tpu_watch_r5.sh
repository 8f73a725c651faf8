#!/bin/bash
# Round-5 TPU watcher: poll until the axon pool claim un-wedges, then run
# the round-5 measurement/quality queue serially (ONE TPU process at a
# time). Timing probes run first but are INDICATIVE ONLY while the ref_s2
# CPU run contends the core — re-run key numbers on an idle core before
# quoting. The pipeline_quality runs are quality gates (contention-safe).
#
# Usage: nohup bash scripts/tpu_watch_r5.sh > /tmp/tpu_watch_r5.log 2>&1 &
set -u
REPO=/root/repo
cd "$REPO"
export PYTHONPATH="$REPO:/root/.axon_site"

state() { echo "$(date -u +%H:%M:%S) $*" | tee -a /tmp/tpu_watch_r5_state; }

probe() {
  timeout -k 15 90 python -c "
import jax, jax.numpy as jnp
jax.devices()
x = jnp.ones((256, 256), jnp.bfloat16)
(x @ x).block_until_ready()
print('TPU_OK')
" 2>/dev/null | grep -q TPU_OK
}

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  state "start $name"
  timeout -k 15 "$tmo" "$@" > "/tmp/${name}.log" 2>&1
  local rc=$?
  state "done $name rc=$rc"
  return $rc
}

state "watcher up, polling tunnel"
until probe; do
  state "tunnel wedged, sleeping 240s"
  sleep 240
done
state "tunnel LIVE — running round-5 queue"

run p1decomp_r5 2400 python scripts/phase1_decomp.py
run p2probe_b256_r5 2400 python scripts/phase2_probe.py --batch 256
run pipeq_fast_r5 3600 python scripts/pipeline_quality.py \
    --occupancy --fused
run pipeq_turbo_r5 3600 python scripts/pipeline_quality.py \
    --occupancy --fused --p2_batch 4096 --p2_iters 375 --p2_warmup 25

touch /tmp/tpu_queue_r5_done
state "queue complete"
