#!/usr/bin/env python
"""Decompose the progressive phase-1 step time (VERDICT r3 Weak #1).

The honest phase-1 loop ran ~32 ms/step while the step computes in a few
ms — this probe attributes the gap: device compute vs packed-scalar H2D
vs per-dispatch round-trip (a tunnel artifact on this box, near-zero on a
real v5e host) vs host planning, and measures the planned-chunk dispatch
(train.plan_chunk) that amortizes the per-step costs k-fold.

Components (shipped phase-1 shape: seg bank, batch 512, 32+0 samples,
flow cfg, maintain_shape, fused kernels, bf16):
  rtt_ms          dispatch round-trip floor (trivial jitted fn, device arg)
  h2d_ms          one packed-scalar host->device transfer
  step_dev_arg    photo_step loop, packed already on device
  step_np_arg     photo_step loop, packed as numpy (the real loop's form)
  scan_per_step   k-step lax.scan / k  (~pure device compute + 1/k RTT)
  planned_k{K}    planned-chunk dispatch / K (what train.plan_chunk runs)
  plan_host_ms    Runner._plan_step host cost (from seg_scan_probe shapes)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/phase1_decomp.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from fmov_pose_tpu.train import step as step_mod


def timeit_ms(f, n=30, warmup=5, block=lambda out: out):
    for _ in range(warmup):
        out = f()
    jax.block_until_ready(block(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    jax.block_until_ready(block(out))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    B = 512
    out = {}

    # dispatch round-trip floor
    x = jnp.ones((8, 8))
    f_triv = jax.jit(lambda a: a + 1.0)
    f_triv(x).block_until_ready()
    out["rtt_ms"] = round(timeit_ms(lambda: f_triv(x),
                                    block=lambda o: o), 2)

    # one packed-scalar H2D
    packed_np = np.zeros((9 + 3 * 8,), np.float32)
    out["h2d_ms"] = round(timeit_ms(
        lambda: jax.device_put(packed_np), block=lambda o: o), 2)

    # the shipped phase-1 photo step (bench.build: seg bank, flow cfg,
    # maintain_shape, fused, bf16; 8 frames 480^2)
    photo_step, state, packed = bench.build(B, use_fused_train=True,
                                            phase2=False)
    packed_dev = jax.device_put(jnp.asarray(packed))

    st = [state]

    def step_dev():
        s, m = photo_step(st[0], packed_dev)
        st[0] = s
        return m["loss"]

    out["step_dev_arg_ms"] = round(timeit_ms(step_dev), 2)

    def step_np():
        s, m = photo_step(st[0], packed)
        st[0] = s
        return m["loss"]

    out["step_np_arg_ms"] = round(timeit_ms(step_np), 2)

    # flow step — HALF the steady-state steps are flow steps (the loop
    # flips rng.random() < 0.5, runner.py _plan_step), each shipping a
    # [B/2, 4] pixels_pair + running the flow loss; never measured before
    flow_step = step_mod.make_flow_step(photo_step.cfg, *photo_step.data)
    pixels_pair = np.random.default_rng(0).uniform(
        10, 100, size=(B // 2, 4)).astype(np.float32)

    def step_flow():
        s, m = flow_step(st[0], packed, pixels_pair)
        st[0] = s
        return m["loss"]

    out["flow_step_np_arg_ms"] = round(timeit_ms(step_flow), 2)

    # pure device estimate: k-step scan amortizes dispatch + H2D away
    cfg = photo_step.cfg
    images, masks, intr_inv, bbox = photo_step.data
    schedule = {"learning_rate": 5e-4, "learning_rate_alpha": 0.05,
                "warm_up_end": 0, "end_iter": 300000, "anneal_end": 0.0,
                "mask_guided": 1.0}
    K_SCAN = 50
    scan = step_mod.make_scan_photo_steps(cfg, images, masks, intr_inv,
                                          bbox, schedule, K_SCAN)
    n_img = jnp.asarray(8, jnp.int32)

    def scan_call():
        s, m = scan(st[0], n_img)
        st[0] = s
        return m["loss"]

    out["scan_per_step_ms"] = round(timeit_ms(scan_call, n=5, warmup=2)
                                    / K_SCAN, 2)

    # planned-chunk dispatch at a few K (photo rows; flow branch compiled
    # in but not taken — same as a mostly-photo chunk)
    for K in (4, 8, 16):
        planned = step_mod.make_planned_steps(cfg, images, masks, intr_inv,
                                              bbox, K)
        rows = np.stack([packed] * K)
        pixes = np.zeros((K, B // 2, 4), np.float32)
        uses = np.zeros((K,), np.float32)

        def planned_call():
            s, m = planned(st[0], jnp.asarray(rows), jnp.asarray(pixes),
                           jnp.asarray(uses))
            st[0] = s
            return m["loss"]

        out[f"planned_k{K}_per_step_ms"] = round(
            timeit_ms(planned_call, n=10, warmup=2) / K, 2)

    # --- the FULL progressive Runner loop at the same shapes (VERDICT r4
    # Weak #2: the 18 ms loop step vs the 5.6 ms plain step had no
    # ms-level attribution).  seg_scan_probe runs the real Runner
    # (admission curriculum, ~50% flow steps, host planning, perms,
    # packed H2D, report cadence); with the photo/flow device steps
    # measured above, the residual is the host-side loop cost.
    scripts_dir = os.path.dirname(os.path.abspath(__file__))
    if scripts_dir not in sys.path:
        sys.path.insert(0, scripts_dir)
    import seg_scan_probe
    iters, dt = seg_scan_probe.run(
        "True", "True", warm_iter=250, steady_iter=300,
        batch=B, n_samples=32, n_importance=0)
    out["runner_loop_per_step_ms"] = round(dt / iters * 1e3, 2)

    # host planning cost in isolation (the piece shared by per-step AND
    # planned dispatch, which is why plan_chunk measured a wash)
    r = seg_scan_probe.build_runner(batch=B, n_samples=32, n_importance=0)
    r._init_perms()
    r.mesh_warmup_step = 0  # steady-state branch (flow coin live)
    r.current_image = r.dataset.n_images
    t0 = time.perf_counter()
    for _ in range(200):
        r._plan_step()
        r.iter_step += 1
        r._maybe_regen_perms()
    out["plan_host_ms"] = round((time.perf_counter() - t0) / 200 * 1e3, 3)

    photo_flow_avg = 0.5 * (out["step_np_arg_ms"]
                            + out["flow_step_np_arg_ms"])
    out["loop_residual_ms"] = round(
        out["runner_loop_per_step_ms"] - photo_flow_avg, 2)

    print(json.dumps(out))
    resid = out["step_np_arg_ms"] - out["scan_per_step_ms"]
    print(f"# decomposition: device ~{out['scan_per_step_ms']} ms, "
          f"per-step loop overhead ~{resid:.1f} ms "
          f"(rtt {out['rtt_ms']} + h2d {out['h2d_ms']}), planned k8 "
          f"brings the step to ~{out.get('planned_k8_per_step_ms')} ms")
    print(f"# runner loop {out['runner_loop_per_step_ms']} ms/step vs "
          f"0.5*(photo {out['step_np_arg_ms']} + flow "
          f"{out['flow_step_np_arg_ms']}) = {photo_flow_avg:.1f} ms device"
          f" -> loop residual {out['loop_residual_ms']} ms"
          + (f" (host planning {out.get('plan_host_ms')} ms)"
             if "plan_host_ms" in out else ""))


if __name__ == "__main__":
    main()
