#!/bin/bash
# TPU tunnel watcher: poll until the axon pool claim un-wedges, then run the
# round-3 validation queue serially (ONE TPU process at a time — the tunnel
# hangs/HTTP-500s with two clients; see CLAUDE.md "Environment gotchas").
#
# Every TPU invocation is wrapped in `timeout -k 15` so a wedged client is
# always killed — a hung claimant blocks the queue for every later process.
#
# Usage: nohup bash scripts/tpu_watch.sh > /tmp/tpu_watch.log 2>&1 &
# State markers: /tmp/tpu_watch_state (last action), /tmp/tpu_queue_done.
set -u
REPO=/root/repo
cd "$REPO"
export PYTHONPATH="$REPO:/root/.axon_site"

state() { echo "$(date -u +%H:%M:%S) $*" | tee -a /tmp/tpu_watch_state; }

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
  state "tunnel wedged, sleeping 300s"
  sleep 300
done
state "tunnel LIVE — running queue"

run validate_rays_r3 1800 python scripts/validate_rays_tpu.py
run bench_r3_planes 2400 python bench.py
run p2probe_r3 1800 python scripts/phase2_probe.py

touch /tmp/tpu_queue_done
state "queue complete"
