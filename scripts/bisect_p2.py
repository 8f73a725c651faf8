"""Bisect the phase-2 step regression (128.4 ms -> 147.6 ms) in ONE
TPU process by toggling the round-3 additions and re-timing the full
bench phase-2 step for each combo.

Suspects (added after the 63.8k rays/s measurement):
  - forward-only fused upsample kernel (FMOV_FUSED_UPSAMPLE, call-time)
  - bf16 feature crossing + split last layer (FEAT_DTYPE, import-time)
  - fused color ray kernel (FMOV_FUSED_COLOR_RAY, call-time)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bisect_p2.py
"""

import os
import sys

import jax
import jax.numpy as jnp

import bench
from fmov_pose_tpu.ops import fused_sdf


def time_combo(name, batch=4096):
    photo_step, state, packed = bench.build(
        batch, use_fused_train=True, phase2=True, occupancy=False)
    t_step, state = bench.time_steps(photo_step, state, packed,
                                     warmup=3, iters=10)
    ms = 1e3 / t_step
    rays = 2 * batch * t_step
    print(f"{name:40s} {ms:8.2f} ms  {rays:10,.0f} rays/s", flush=True)
    del photo_step, state
    return ms


def main():
    combos = [
        ("default (all round-3 paths on)", {}),
        ("FMOV_FUSED_UPSAMPLE=0", {"FMOV_FUSED_UPSAMPLE": "0"}),
        ("feat crossing f32", {"_FEAT_F32": "1"}),
        ("FMOV_FUSED_COLOR_RAY=0", {"FMOV_FUSED_COLOR_RAY": "0"}),
        ("upsample=0 + feat f32", {"FMOV_FUSED_UPSAMPLE": "0",
                                   "_FEAT_F32": "1"}),
        ("upsample=0 + color_ray=0", {"FMOV_FUSED_UPSAMPLE": "0",
                                      "FMOV_FUSED_COLOR_RAY": "0"}),
    ]
    saved_feat = fused_sdf.FEAT_DTYPE
    for name, env in combos:
        for k, v in env.items():
            if k == "_FEAT_F32":
                fused_sdf.FEAT_DTYPE = jnp.float32
            else:
                os.environ[k] = v
        try:
            time_combo(name)
        finally:
            fused_sdf.FEAT_DTYPE = saved_feat
            for k in env:
                os.environ.pop(k, None)


if __name__ == "__main__":
    main()
