#!/usr/bin/env python
"""Measure the PyTorch reference's training throughput and derive a
traceable A100 baseline envelope.

The reference never publishes throughput (BASELINE.md), so the envelope
must be built from measurements. This script:

  1. times the ACTUAL reference implementation (torch CPU, loaded from
     /root/reference) running its phase-1 training step — 512 rays x 32
     samples, full render + 3 active losses + backward + Adam — and the
     phase-2 step (512 x 64+64, 4 up-sample passes);
  2. times our jax stack on CPU on the identical workload (sanity: the
     frameworks should be same-ballpark on the same silicon);
  3. measures this CPU's achieved torch GEMM throughput on the
     workload's dominant matmul shape ([B*N, 256] @ [256, 256]);
  4. derives the A100 envelope as the tighter of two measured bounds:

     (a) FLOP bound:
         cpu_rays_per_sec * (A100_FP32_PEAK / cpu_gemm_tflops)
         — assumes the A100 runs the same FLOP graph at FULL fp32 peak
         while the CPU number uses its *achieved* GEMM rate, i.e. the
         A100 sustains the same relative utilization the CPU did.
         (fp32 is the right ceiling: the reference pins torch 1.9.1 +
         CUDA 10.2, environment.yml:24-25 — no TF32/bf16 path.)
     (b) dispatch bound: the reference is EAGER torch — each iteration
         issues a counted number of ATen kernels (TorchDispatchMode),
         and a CUDA launch + its Python dispatch cannot beat ~8 us/op,
         so  rays_per_iter / (n_ops * 8e-6)  bounds eager throughput.

     Both are generous to the reference (no eager A100 reaches either
     bound), so `vs_baseline` computed against min(a, b) is
     conservative for us.

Writes BASELINE_MEASURED.json at the repo root; bench.py picks it up.

Run:  PYTHONPATH=/root/repo python scripts/measure_baseline.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REPO)

A100_FP32_PEAK_TFLOPS = 19.5  # NVIDIA A100 datasheet, fp32 (non-tensor-core)
CUDA_LAUNCH_SEC = 8e-6  # conservative eager per-op cost (launch + dispatch)

import parity_check as pc  # reuses the reference loaders / loss block


def count_reference_ops(batch, spec):
    """ATen ops issued by ONE reference train iteration (fwd+bwd+Adam)."""
    import torch
    from torch.utils._python_dispatch import TorchDispatchMode

    class Counter(TorchDispatchMode):
        n = 0

        def __torch_dispatch__(self, func, types, args=(), kwargs=None):
            Counter.n += 1
            return func(*args, **(kwargs or {}))

    torch.manual_seed(0)
    t_sdf, t_color, t_nerf, t_var = pc.build_torch_nets()
    ref_r = pc._ref_renderer(t_sdf, t_color, t_nerf, t_var, *spec)
    rays_o, rays_d = pc.fixed_rays(batch, seed=5)
    rng = np.random.default_rng(6)
    true_rgb = torch.from_numpy(
        rng.uniform(0, 1, (batch, 3)).astype(np.float32))
    mask = torch.from_numpy(
        (rng.uniform(0, 1, (batch, 1)) > 0.4).astype(np.float32))
    a = (rays_d ** 2).sum(-1, keepdims=True)
    b = 2.0 * (rays_o * rays_d).sum(-1, keepdims=True)
    mid = 0.5 * (-b) / a
    near, far = torch.from_numpy(mid - 1.0), torch.from_numpy(mid + 1.0)
    rays_o, rays_d = torch.from_numpy(rays_o), torch.from_numpy(rays_d)
    params = (list(t_sdf.parameters()) + list(t_color.parameters())
              + list(t_var.parameters()))
    opt = torch.optim.Adam(params, lr=5e-4)
    with Counter():
        out = ref_r.render(rays_o, rays_d, near, far, perturb_overwrite=0.0,
                           cos_anneal_ratio=1.0)
        losses = pc._torch_losses(out, true_rgb, mask, 0.1, 5.0, 0, 0, None)
        opt.zero_grad()
        losses["loss"].backward()
        opt.step()
    return Counter.n


def time_torch_reference(batch, spec, iters=12, warmup=3):
    """Reference phase-style step: render + losses + backward + Adam."""
    import torch
    torch.manual_seed(0)
    t_sdf, t_color, t_nerf, t_var = pc.build_torch_nets()
    ref_r = pc._ref_renderer(t_sdf, t_color, t_nerf, t_var, *spec)
    rays_o, rays_d = pc.fixed_rays(batch, seed=5)
    rng = np.random.default_rng(6)
    true_rgb = torch.from_numpy(
        rng.uniform(0, 1, (batch, 3)).astype(np.float32))
    mask = torch.from_numpy(
        (rng.uniform(0, 1, (batch, 1)) > 0.4).astype(np.float32))
    a = (rays_d ** 2).sum(-1, keepdims=True)
    b = 2.0 * (rays_o * rays_d).sum(-1, keepdims=True)
    mid = 0.5 * (-b) / a
    near = torch.from_numpy(mid - 1.0)
    far = torch.from_numpy(mid + 1.0)
    rays_o, rays_d = torch.from_numpy(rays_o), torch.from_numpy(rays_d)
    params = (list(t_sdf.parameters()) + list(t_color.parameters())
              + list(t_var.parameters()))
    opt = torch.optim.Adam(params, lr=5e-4)

    def one_step():
        out = ref_r.render(rays_o, rays_d, near, far, perturb_overwrite=0.0,
                           cos_anneal_ratio=1.0)
        losses = pc._torch_losses(out, true_rgb, mask, 0.1, 5.0, 0, 0, None)
        opt.zero_grad()
        losses["loss"].backward()
        opt.step()

    for _ in range(warmup):
        one_step()
    t0 = time.perf_counter()
    for _ in range(iters):
        one_step()
    dt = time.perf_counter() - t0
    return iters / dt


def time_jax_ours(batch, spec, iters=12, warmup=3):
    """Our stack, same workload, jax CPU."""
    import jax
    from fmov_pose_tpu.poses import picture_pose as pp
    from fmov_pose_tpu.train import optim, step as step_mod

    t_sdf, t_color, t_nerf, t_var = pc.build_torch_nets()
    params = pc.build_jax_params(t_sdf, t_color, t_nerf, t_var)
    rays_o, rays_d = pc.fixed_rays(batch, seed=5)
    rng = np.random.default_rng(6)
    true_rgb = rng.uniform(0, 1, (batch, 3)).astype(np.float32)
    mask = (rng.uniform(0, 1, (batch, 1)) > 0.4).astype(np.float32)
    data = np.concatenate([rays_o, rays_d, true_rgb, mask], -1)

    cfg = step_mod.make_step_config(
        pc._jax_model_cfg(*spec), batch_size=batch, H=8, W=8, n_segments=1,
        segment_img_num=1, pose_mode="fixed", pose_cfg=pp.PoseCfg(),
        igr_weight=0.1, mask_weight=5.0)
    scalars = step_mod.StepScalars(
        lr=jax.numpy.asarray(5e-4), cos_anneal=jax.numpy.ones(()),
        main_update=jax.numpy.ones(()), pose_update=jax.numpy.ones(()),
        mask_guided=jax.numpy.ones(()), seg_touch=jax.numpy.ones((1,)),
        seg_freeze=jax.numpy.ones((1,)), seg_lr=jax.numpy.full((1,), 5e-4),
        trans_head_on=jax.numpy.ones(()))

    def loss_fn(p):
        total, m = step_mod._render_and_losses(
            cfg, jax.random.key(0), p, {}, {}, data, scalars)
        return total, m

    @jax.jit
    def step(p, opt_state):
        (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        p2, opt2 = optim.adam_update(grads, opt_state, p, 5e-4)
        return p2, opt2, m["loss"]

    opt = optim.adam_init(params)
    for _ in range(warmup):
        params, opt, loss = step(params, opt)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt, loss = step(params, opt)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return iters / dt


def measure_cpu_gemm_tflops(m=16384, k=256, n=256, iters=20):
    """Achieved torch fp32 GEMM rate at the workload's dominant shape."""
    import torch
    x = torch.randn(m, k)
    w = torch.randn(k, n)
    for _ in range(3):
        y = x @ w
    t0 = time.perf_counter()
    for _ in range(iters):
        y = x @ w
    dt = time.perf_counter() - t0
    del y
    return 2.0 * m * k * n * iters / dt / 1e12


def main():
    pc._setup()  # forces jax CPU, stubs mcubes, adds /root/reference

    specs = {"phase1": (32, 0, 0, 4), "phase2": (64, 64, 0, 4)}
    batch = 512
    out = {"batch": batch,
           "a100_fp32_peak_tflops": A100_FP32_PEAK_TFLOPS,
           "cuda_launch_sec": CUDA_LAUNCH_SEC,
           "method": ("a100_envelope = min(flop bound, dispatch bound); "
                      "flop bound = torch_cpu_measured * (A100_fp32_peak / "
                      "cpu_achieved_gemm_tflops) — assumes the A100 "
                      "sustains the CPU's relative utilization at full "
                      "fp32 peak; dispatch bound = rays_per_iter / "
                      "(counted ATen ops * 8us eager launch cost). Both "
                      "are upper bounds on the eager single-GPU reference, "
                      "so vs_baseline is a LOWER bound on the true "
                      "speedup.")}

    gemm = measure_cpu_gemm_tflops()
    out["cpu_gemm_tflops"] = round(gemm, 3)
    print(f"cpu achieved GEMM: {gemm:.2f} TF/s "
          f"(torch fp32, [16384,256]@[256,256])")

    for tag, spec in specs.items():
        t_ips = time_torch_reference(batch, spec)
        j_ips = time_jax_ours(batch, spec)
        n_ops = count_reference_ops(batch, spec)
        scale = A100_FP32_PEAK_TFLOPS / gemm
        flop_bound = t_ips * batch * scale
        dispatch_bound = batch / (n_ops * CUDA_LAUNCH_SEC)
        a100 = min(flop_bound, dispatch_bound)
        out[tag] = {
            "torch_cpu_it_per_sec": round(t_ips, 3),
            "torch_cpu_rays_per_sec": round(t_ips * batch, 1),
            "jax_cpu_it_per_sec": round(j_ips, 3),
            "jax_cpu_rays_per_sec": round(j_ips * batch, 1),
            "aten_ops_per_iter": n_ops,
            "a100_flop_bound_rays_per_sec": round(flop_bound, 1),
            "a100_dispatch_bound_rays_per_sec": round(dispatch_bound, 1),
            "a100_envelope_rays_per_sec": round(a100, 1),
        }
        print(f"{tag}: torch-cpu {t_ips:.2f} it/s ({t_ips*batch:.0f} rays/s)"
              f" | jax-cpu {j_ips:.2f} it/s ({j_ips*batch:.0f} rays/s)"
              f" | {n_ops} ops/iter"
              f" | A100 envelope {a100:.0f} rays/s "
              f"(flop {flop_bound:.0f}, dispatch {dispatch_bound:.0f})")

    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    # merge-preserve sections owned by other scripts (phase1_progressive
    # comes from scripts/measure_progressive_baseline.py)
    try:
        with open(path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        prev = {}
    prev.update(out)
    with open(path, "w") as f:
        json.dump(prev, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
