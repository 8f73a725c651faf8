#!/usr/bin/env python
"""Rays-kernel gate boundary probe at the SHIPPED phase-2 shape.

VERDICT r4 Weak #1 tail: at the conf-shipped batch 512 the final render
holds 512 x (64+64) = 65,536 samples — exactly the fused-rays gate
(`ops/fused_sdf.py:MIN_SAMPLES_RAYS`, `ops/fused_color.py:MIN_SAMPLES`).
The rays variants are a measured WIN at >=262k samples and a measured
REGRESSION at 32k (CLAUDE.md round-3); which side of the crossover
65,536 sits on was never measured.  This probe times the real gfscan
phase-2 step (bench.build_phase2_gf) at batch 512 and 1024 with the
rays kernels (a) engaged as shipped, (b) gated off (flat fused kernels
only) and prints ms/step for each, so the gate default can be set from
data instead of a guess.

ONE TPU process at a time.  Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/gate_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from fmov_pose_tpu.ops import fused_color, fused_sdf


def run_one(batch, occ, rays_on):
    sdf0, col0 = fused_sdf.MIN_SAMPLES_RAYS, fused_color.MIN_SAMPLES
    try:
        if not rays_on:
            fused_sdf.MIN_SAMPLES_RAYS = 1 << 30
            fused_color.MIN_SAMPLES = 1 << 30
        scan, state, n_img, k = bench.build_phase2_gf(batch, occupancy=occ)
        steps_per_sec, _ = bench.time_scan(scan, state, n_img, k)
        return steps_per_sec
    finally:
        fused_sdf.MIN_SAMPLES_RAYS = sdf0
        fused_color.MIN_SAMPLES = col0


def main():
    out = {}
    for batch in (512, 1024):
        for occ in (False, True):
            for rays_on in (True, False):
                tag = (f"b{batch}" + ("_occ" if occ else "")
                       + ("_rays" if rays_on else "_flat"))
                t0 = time.time()
                sps = run_one(batch, occ, rays_on)
                out[tag] = {"ms_per_step": round(1e3 / sps, 2),
                            "rays_per_sec": round(sps * batch)}
                print(f"{tag}: {1e3/sps:7.2f} ms/step "
                      f"{sps*batch:10,.0f} rays/s  (wall {time.time()-t0:.0f}s)",
                      flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
