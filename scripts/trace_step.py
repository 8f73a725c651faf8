#!/usr/bin/env python
"""Trace the phase-2 train step and print a per-op time table.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_step.py
       [--ray 0|1] [--top 30]
"""

import argparse
import glob
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ray", default="1")
    ap.add_argument("--top", type=int, default=35)
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()
    os.environ["FMOV_FUSED_COLOR_RAY"] = args.ray

    import jax
    import bench

    photo_step, state, packed = bench.build(args.batch,
                                            use_fused_train=True,
                                            phase2=True)
    for _ in range(4):
        state, metrics = photo_step(state, packed)
    jax.block_until_ready(metrics["loss"])
    tdir = f"/tmp/trace_ray{args.ray}"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    for _ in range(3):
        state, metrics = photo_step(state, packed)
    jax.block_until_ready(metrics["loss"])
    jax.profiler.stop_trace()

    from jax.profiler import ProfileData
    path = sorted(glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True))[-1]
    pd = ProfileData.from_file(path)
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        print(f"=== plane {plane.name}: lines "
              f"{[ln.name for ln in plane.lines]}")
        for line in plane.lines:
            if line.name not in ("XLA Ops",):
                continue
            times = {}
            for ev in line.events:
                name = ev.name.split(" = ")[0].lstrip("%")
                base = name.rstrip("0123456789.")
                times[base] = times.get(base, 0) + ev.duration_ns
            total = sum(times.values())
            print(f"[{line.name}] total {total/3e6:.2f} ms/step")
            for name, ns in sorted(times.items(),
                                   key=lambda kv: -kv[1])[:args.top]:
                print(f"{ns/3e6:9.3f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
