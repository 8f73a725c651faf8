#!/bin/bash
# Head-to-head chain: wait for the torch reference run (pid file
# /tmp/h2h_ref.pid) to finish, then run our side + psnr-eval + score.
# Our run uses the TPU if the tunnel answers a 90s probe, else CPU
# (the ref has exited by then, so the single core is free either way).
#
# Usage: nohup bash scripts/h2h_chain.sh > /tmp/h2h_chain.log 2>&1 &
set -u
REPO=/root/repo
WORK=/root/hth
cd "$REPO"

state() { echo "$(date -u +%H:%M:%S) $*"; }

REF_PID=$(cat /tmp/h2h_ref.pid)
state "waiting on reference run pid=$REF_PID"
while kill -0 "$REF_PID" 2>/dev/null; do sleep 60; done
state "reference run exited; log tail:"
tail -3 "$WORK/ref_run.log" || true

probe() {
  PYTHONPATH="$REPO:/root/.axon_site" timeout -k 15 90 python -c "
import jax, jax.numpy as jnp
jax.devices()
x = jnp.ones((128, 128), jnp.bfloat16)
(x @ x).block_until_ready()
print('TPU_OK')
" 2>/dev/null | grep -q TPU_OK
}

DEV=cpu
# don't contend with the watcher's queue for the single tunnel slot
if [ -f /tmp/tpu_queue_done ] && probe; then DEV=tpu; fi
state "running ours on $DEV"
timeout -k 15 14400 python scripts/headtohead.py run-ours --work "$WORK" --device "$DEV"
state "ours rc=$?"

state "psnr-eval (cpu both sides)"
timeout -k 15 14400 python scripts/headtohead.py psnr-eval --work "$WORK" --device cpu
state "psnr rc=$?"

state "score"
timeout -k 15 1800 python scripts/headtohead.py score --work "$WORK"
state "chain complete (HEADTOHEAD.md written on success)"
