"""Time each admission (_pro_events) and the step-wall histogram in the
real Runner loop on TPU.

Measured 2026-08-21 (round 5, v5e, idle core): the 14.9 ms/step loop
residual from scripts/phase1_decomp.py is NOT admissions — _pro_events
costs ~26 ms per admission event (80 ms total over a 300-step window).
The per-step dispatch gap is median 2.05 ms / p90 3.36 ms; the residual
lives in a LONG TAIL of blocking stalls (p99 34.8 ms, max 572 ms; three
>50 ms steps summed 1.6 s of a 6.9 s window) — the async dispatch queue
races ~2 ms/step ahead of the device, then drains in bursts at blocking
points. The steady loop averaged 23.0 ms/step while the SAME photo step
measures 5.5 ms device-throughput in isolation; the gap between those
two numbers (and whether it is tunnel H2D backpressure, a per-step sync
hidden in the tail, or genuine extra device work in the mixed
photo/flow stream) is the open question round 6 should attack with a
device profile (FMOV_PROFILE_DIR) of this exact loop."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
import numpy as np
import seg_scan_probe

r = seg_scan_probe.build_runner("True", "True", "False", 512, 32, 0,
                                end_iter=250)
r.train()  # warm/compile
ev = []
orig = r._pro_events

def timed():
    t0 = time.perf_counter()
    orig()
    ev.append((r.iter_step, time.perf_counter() - t0))

r._pro_events = timed

steps = []
orig_plan = r._plan_step

def plan_marked():
    steps.append(time.perf_counter())
    return orig_plan()

r._plan_step = plan_marked
r.end_iter = 250 + 300
t0 = time.perf_counter()
r.train()
wall = time.perf_counter() - t0
d = np.diff(np.array(steps)) * 1e3
print(f"steady: {len(steps)} steps in {wall:.2f}s = {wall/len(steps)*1e3:.2f} ms/step")
print(f"step-gap ms: med {np.median(d):.2f} p90 {np.percentile(d,90):.2f} "
      f"p99 {np.percentile(d,99):.2f} max {d.max():.1f}")
print(f"sum of gaps > 50ms: {d[d>50].sum():.0f} ms over {(d>50).sum()} steps")
for it, dt in ev:
    print(f"admission at iter {it}: {dt*1e3:.1f} ms")
print(f"admission total: {sum(dt for _, dt in ev)*1e3:.0f} ms "
      f"over {len(ev)} events")
