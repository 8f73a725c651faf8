#!/bin/bash
# Round-5 queue D (revised): chained behind queue C. The longseq-256
# rerun was pulled forward (ran manually in the 10:50 idle-chip window).
# TPU items serialized; the ref-side GA probe (CPU) runs alongside
# ref_s1 nice'd (quality values are contention-safe).
set -u
REPO=/root/repo
cd "$REPO"
export PYTHONPATH="$REPO:/root/.axon_site"

state() { echo "$(date -u +%H:%M:%S) $*" | tee -a /tmp/tpu_watch_r5_state; }

until [ -f /tmp/tpu_queue_r5c_done ]; do sleep 60; done

# ref-side gradient-analysis probe in background (CPU, nice'd)
nohup nice -n 19 bash scripts/ref_ga_probe.sh /root/hth/ref_s2 \
    > /tmp/ref_ga_probe.log 2>&1 &

state "queue-d: p2_loop_probe"
timeout -k 15 2400 python scripts/p2_loop_probe.py /tmp/fmov_pipeq_nwtoz0ft \
    1000 > /tmp/p2_loop_probe.log 2>&1
state "queue-d: p2_loop_probe rc=$? — p2probe batch 512"

timeout -k 15 2400 python scripts/phase2_probe.py --batch 512 \
    > /tmp/p2probe_b512.log 2>&1
state "queue-d: p2probe rc=$? — rebatch 1024@1500 quality gate"

timeout -k 15 3600 python scripts/pipeline_quality.py --occupancy --fused \
    --p2_batch 1024 --p2_iters 1500 --p2_lr 7e-4 \
    > /tmp/pipeq_1024.log 2>&1
state "queue-d: rebatch gate rc=$? — done"
touch /tmp/tpu_queue_r5d_done
