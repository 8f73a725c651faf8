#!/usr/bin/env python
"""Host-side profile of the progressive phase-1 Runner loop.

phase1_decomp.py showed the pipelined photo step costs 5.63 ms wall
(device ~4.8) yet the full Runner loop runs ~10.8 ms/step
(bench phase1_progressive_fused).  This probe cProfiles the steady-state
loop of the exact bench configuration (seg_scan_probe.run shapes) and
prints where the extra host milliseconds go: _plan_step, flow-pair
sampling, dispatch arg processing, profiler ticks, perm regeneration.

Device waits show up inside the jitted step __call__ entries (the loop
blocks there when host runs ahead), so read the OTHER rows — pure host
cost — as the actionable part.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/phase1_loop_profile.py
"""
import cProfile
import io
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import seg_scan_probe  # noqa: E402


def main():
    import time
    import tempfile
    from fmov_pose_tpu.data.synthetic import make_orbit_sequence
    from fmov_pose_tpu.train.runner import Runner

    tmp = tempfile.mkdtemp()
    data_dir = os.path.join(tmp, "SYN_ori")
    make_orbit_sequence(data_dir, n_frames=8, H=128, W=128, span_deg=70)
    conf_path = os.path.join(tmp, "probe.conf")
    with open(conf_path, "w") as f:
        f.write(seg_scan_probe.CONF.format(
            exp_dir=os.path.join(tmp, "exp"), data_dir=data_dir,
            flow_dir=os.path.join(tmp, "matches"), end_iter=250,
            scan="True", fused="True", occ="False", batch=512,
            n_samples=32, n_importance=0))
    r = Runner(conf_path, mode="train", case="SYN_ori", has_global_conf=True)
    r.train()  # warm: compile everything
    r.end_iter = 250 + 300

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    r.train()
    prof.disable()
    dt = time.time() - t0
    print(f"steady 300 iters in {dt:.2f}s = {300 / dt:.1f} it/s "
          f"({dt / 300 * 1e3:.2f} ms/step)")
    s = io.StringIO()
    st = pstats.Stats(prof, stream=s)
    st.sort_stats("cumulative").print_stats(40)
    print(s.getvalue())


if __name__ == "__main__":
    main()
