#!/bin/bash
# Round-4 chip queue, part 2 (after the long-seq probes): waits for the
# orphaned longseq64_plan8 probe to exit, then runs the remaining items
# serially.  plan_chunk for the endurance run comes from $2 (decided from
# the plan8-vs-plan1 measurement).
# Usage: nohup bash scripts/tpu_queue_r4b.sh <end_by_epoch_s> <plan_chunk> &
set -u
REPO=/root/repo
cd "$REPO"
export PYTHONPATH="$REPO:/root/.axon_site"
END_BY=${1:?end-by epoch seconds required}
PLAN=${2:-1}

state() { echo "$(date -u +%H:%M:%S) $*" | tee -a /tmp/tpu_watch_state; }

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  state "start $name (tmo ${tmo}s)"
  timeout -k 15 "$tmo" "$@" > "/tmp/${name}.log" 2>&1
  local rc=$?
  state "done $name rc=$rc"
  return $rc
}

# wait for the orphaned plan8 probe (single TPU client rule)
state "r4b queue up (plan_chunk=$PLAN), waiting for plan8 probe to exit"
while ps aux | grep "long_seq_probe" | grep -v grep > /dev/null; do
  sleep 20
done
state "plan8 probe done — continuing queue"

run phase1_decomp 1200 python scripts/phase1_decomp.py
run barf_gate 2400 python scripts/e2e_barf_smoke.py --iters 2000 \
    --work /tmp/barf_gate_r4
run h2h_ours 1800 python scripts/headtohead.py run-ours --device tpu
run h2h_ours_s1 1800 python scripts/headtohead.py run-ours --device tpu \
    --seed 1 --variant s1
run h2h_ours_s2 1800 python scripts/headtohead.py run-ours --device tpu \
    --seed 2 --variant s2

left=$(( END_BY - $(date +%s) ))
if [ "$left" -gt 2100 ]; then
  run endur_prepare 1800 python scripts/endurance.py prepare \
      --work /root/endur --frames 64 --res 256 --plan_chunk "$PLAN"
  left=$(( END_BY - $(date +%s) ))
  run endur_run $(( left )) python scripts/endurance.py run \
      --work /root/endur --max_s $(( left - 720 ))
  run endur_report 600 python scripts/endurance.py report --work /root/endur
else
  state "skipping endurance: only ${left}s left"
fi

touch /tmp/r4_queue_done
state "r4b queue complete"
