"""Sweep FMOV_KERNEL_TILE for the fused Pallas kernels (one TPU process
per tile width — TILE is bound at module import).

Times, at phase-2 scale (1M points):
  * fused SDF fwd+grad
  * fused SDF second-order fwd+bwd (the train-step dominator)
  * fused color fwd+bwd
  * SDF-only fwd (the upsample path)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tile_sweep.py
It re-execs itself with FMOV_KERNEL_TILE in {256, 512, 1024, 2048}.
"""

import json
import os
import subprocess
import sys
import time

TILES = (256, 512, 1024, 2048)


def child(tile: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from fmov_pose_tpu.ops import fused_color, fused_sdf

    model_cfg = ge._model_cfg(n_samples=64, n_importance=64)
    for net in ("sdf", "color"):
        model_cfg[net] = dict(model_cfg[net], compute_dtype="bfloat16")
    params = ge._field_params(jax.random.key(0))
    sdf_cfg, color_cfg = model_cfg["sdf"], model_cfg["color"]

    N = 1 << 20
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(N, 3)) * 0.4, jnp.float32)
    xc = jnp.asarray(rng.normal(size=(N, 289)) * 0.3, jnp.float32)

    def timeit(f, *args, n=20, warmup=3):
        for _ in range(warmup):
            out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    res = {"tile": tile}

    def sdf_fwd(p, x):
        return fused_sdf.sdf_only_fused(p, sdf_cfg, x).sum()

    res["sdf_fwd_ms"] = timeit(jax.jit(sdf_fwd), params["sdf"], pts)

    def sdf_fg(p, x):
        out, grad = fused_sdf.sdf_apply_grad_fused(p, sdf_cfg, x)
        return out.sum() + grad.sum()

    res["sdf_fwdgrad_ms"] = timeit(jax.jit(sdf_fg), params["sdf"], pts)

    def sdf_loss(p, x):
        out, grad = fused_sdf.sdf_apply_grad_fused(p, sdf_cfg, x)
        return out.sum() + ((jnp.linalg.norm(grad, axis=-1) - 1) ** 2).sum()

    res["sdf_2nd_ms"] = timeit(jax.jit(jax.grad(sdf_loss)), params["sdf"], pts)

    def color_loss(p, x):
        return fused_color.color_fused(p, color_cfg, x).sum()

    res["color_bwd_ms"] = timeit(
        jax.jit(jax.grad(color_loss)), params["color"], xc)
    print(json.dumps(res), flush=True)


def main():
    for tile in TILES:
        env = dict(os.environ, FMOV_KERNEL_TILE=str(tile))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(tile)],
            env=env, capture_output=True, text=True, timeout=1800)
        out = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        print(out[-1] if out else f"tile {tile} FAILED: {proc.stderr[-300:]}",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
