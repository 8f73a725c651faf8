#!/bin/bash
# Round-5 queue C: fires in the idle-core window after the 256-frame
# longseq probe (queue b) and the ref seed-2 CPU run both finish.
#   1. bench.py on the idle core/chip (the honest shipped-batch rows)
#   2. phase-1 runner-loop cProfile (the 12 ms residual, VERDICT #2)
#   3. LAUNCH ref seed-1 in nice'd background (VERDICT #3, ~3.5 h CPU)
#   4. ours h2h seed-2024 diagnostic rerun with --gradient_analysis +
#      per-loss log lines (VERDICT #4) — quality run, contention-safe
#   5. ours-side PSNR eval + rescore
set -u
REPO=/root/repo
cd "$REPO"
export PYTHONPATH="$REPO:/root/.axon_site"

state() { echo "$(date -u +%H:%M:%S) $*" | tee -a /tmp/tpu_watch_r5_state; }

until [ -f /tmp/tpu_queue_r5b_done ]; do sleep 60; done
state "queue-c: longseq done, waiting for ref_s2 CPU run"
while pgrep -f run_reference.py > /dev/null; do sleep 60; done
state "queue-c: core idle — bench"

timeout -k 15 2400 python bench.py > /tmp/bench_r5a.log 2>&1
state "queue-c: bench rc=$? — loop profile"

timeout -k 15 2400 python scripts/phase1_loop_profile.py \
    > /tmp/loop_profile_r5.log 2>&1
state "queue-c: loop profile rc=$? — launching ref_s1 (CPU bg)"

nohup nice -n 19 python scripts/headtohead.py run-ref --seed 1 \
    --variant s1 > /tmp/ref_s1.log 2>&1 &
echo $! > /tmp/ref_s1.pid

state "queue-c: ours seed-2024 diagnostic rerun (TPU)"
rm -rf /root/hth/ours/exp
timeout -k 15 3600 python scripts/headtohead.py run-ours --seed 2024 --ga \
    > /tmp/ours_2024.log 2>&1
state "queue-c: ours rerun rc=$? — psnr eval (ours side)"

timeout -k 15 1800 python scripts/headtohead.py psnr-eval --device tpu \
    > /tmp/psnr_eval_r5.log 2>&1
state "queue-c: psnr-eval rc=$? — done"
touch /tmp/tpu_queue_r5c_done
