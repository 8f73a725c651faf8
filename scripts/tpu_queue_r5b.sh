#!/bin/bash
# Round-5 follow-up TPU queue: waits for tpu_watch_r5.sh's marker, then
# runs the 256-frame long-sequence probe (VERDICT r4 Next #5: prove the
# ~300-admission regime; 64 was the proven max).
set -u
REPO=/root/repo
cd "$REPO"
export PYTHONPATH="$REPO:/root/.axon_site"

state() { echo "$(date -u +%H:%M:%S) $*" | tee -a /tmp/tpu_watch_r5_state; }

until [ -f /tmp/tpu_queue_r5_done ]; do sleep 120; done
state "queue-b: start longseq_256"
timeout -k 15 5400 python scripts/long_seq_probe.py 256 120 1 192 \
    > /tmp/longseq_256.log 2>&1
state "queue-b: done longseq_256 rc=$?"
touch /tmp/tpu_queue_r5b_done
