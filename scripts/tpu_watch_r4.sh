#!/bin/bash
# Round-4 TPU watcher: poll until the axon pool claim un-wedges, then run
# the round-4 chip queue serially (ONE TPU process at a time).  Every TPU
# invocation is wrapped in `timeout -k 15` so a wedged client is always
# killed — a hung claimant blocks the queue for every later process.
#
# Queue (VERDICT r3 next-round tasks):
#   1. long_seq_probe 12 / 64 / 64@plan8 frames  (#1 scale, #2 plan win)
#   2. phase1_decomp                              (#2 overhead decomposition)
#   3. e2e_barf_smoke --iters 2000                (#7 BARF quality gate)
#   4. endurance run, wall-capped to END_BY       (#3 full shipped schedule)
#
# Usage: nohup bash scripts/tpu_watch_r4.sh <end_by_epoch_s> > /tmp/tpu_watch_r4.log 2>&1 &
# State: /tmp/tpu_watch_state (append), /tmp/r4_queue_done marker.
set -u
REPO=/root/repo
cd "$REPO"
export PYTHONPATH="$REPO:/root/.axon_site"
END_BY=${1:?end-by epoch seconds required}

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
  state "start $name (tmo ${tmo}s)"
  timeout -k 15 "$tmo" "$@" > "/tmp/${name}.log" 2>&1
  local rc=$?
  state "done $name rc=$rc"
  return $rc
}

state "r4 watcher up, polling tunnel (queue must end by $(date -d @"$END_BY" -u +%H:%M:%S)Z)"
until probe; do
  state "tunnel wedged, sleeping 240s"
  sleep 240
done
state "tunnel LIVE — running r4 queue"

run longseq12 1200 python scripts/long_seq_probe.py 12 120 1 192
run longseq64 2400 python scripts/long_seq_probe.py 64 120 1 192
run longseq64_plan8 2400 python scripts/long_seq_probe.py 64 120 8 192
run phase1_decomp 1200 python scripts/phase1_decomp.py
run barf_gate 2400 python scripts/e2e_barf_smoke.py --iters 2000 \
    --work /tmp/barf_gate_r4

# h2h ours-side reruns on chip (minutes each vs ~30 CPU-min): seed-2024
# rebuild of work/ours/exp (was cleaned; psnr-eval needs the checkpoint)
# + two variance seeds (VERDICT r3 Weak #2)
run h2h_ours 1800 python scripts/headtohead.py run-ours --device tpu
run h2h_ours_s1 1800 python scripts/headtohead.py run-ours --device tpu \
    --seed 1 --variant s1
run h2h_ours_s2 1800 python scripts/headtohead.py run-ours --device tpu \
    --seed 2 --variant s2

# endurance gets whatever wall-clock remains (leave 12 min for the report
# + the driver's round-end bench); skip if under 35 min — a sub-35-min
# "endurance" run proves nothing a pipeline_quality run hasn't
left=$(( END_BY - $(date +%s) ))
if [ "$left" -gt 2100 ]; then
  run endur_prepare 1800 python scripts/endurance.py prepare --work /root/endur \
      --frames 64 --res 256
  run endur_run $(( left )) python scripts/endurance.py run --work /root/endur \
      --max_s $(( left - 720 ))
  run endur_report 600 python scripts/endurance.py report --work /root/endur
else
  state "skipping endurance: only ${left}s left"
fi

touch /tmp/r4_queue_done
state "r4 queue complete"
