#!/usr/bin/env python
"""Tiny-schedule wiring smoke of the head-to-head `run-ours` path.

The real ours-side h2h run only starts hours in (after the torch
reference finishes); this catches CLI/conf/scorer wiring bugs up front
by running the exact same code path at toy scale (4 frames @ 64^2,
60+30 iters) on CPU.  Scores are meaningless; only rc/artifacts matter.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
import headtohead as h2h

h2h.N_FRAMES = 4
h2h.RES = 64
h2h.SCHEDULE = {
    "end_iter": (60, 30),
    "warm_up_end": (5, 5),
    "save_freq": (1000000, 1000000),
    "val_freq": (1000000, 1000000),
    "val_mesh_freq": (1000000, 1000000),
    "report_freq": (10, 10),
    "pose_freq": (1000000, 1000000),
    "max_pro_iteration": (12, None),
    "pro_warm_up_end": (6, None),
    "mesh_warmup_step": (8, None),
    "batch_size": (64, 64),
    "validate_resolution_level": (8, 8),
}

work = sys.argv[1] if len(sys.argv) > 1 else "/root/hth_smoke"
h2h.prepare(work)
rc = h2h.run_ours(work, device="cpu")
# the ref side has no trained model here, so psnr_eval's ref half fails
# by construction — only assert the ours half produced a score
h2h.psnr_eval(work, device="cpu", resolution_level=8)
h2h.write_report = lambda *a, **k: None  # don't clobber repo HEADTOHEAD.md
out = h2h.score(work)
assert out["ours"].get("phase1"), f"no phase-1 poses scored: {out}"
assert out["ours"].get("phase2"), f"no phase-2 poses scored: {out}"
# at 60+30 iters the SDF may have no zero crossing -> mesh_chamfer
# legitimately returns None; wiring is proven by the mesh being found
assert out["ours"].get("mesh"), f"no mesh scored: {out}"
assert out["ours"].get("psnr_mean") is not None, f"no psnr scored: {out}"
print("H2H_SMOKE_OK rc=%d" % rc)
sys.exit(rc)
