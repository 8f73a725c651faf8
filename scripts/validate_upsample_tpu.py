"""Validate + time the whole-upsample-loop kernel on the real chip.

Compares ops/fused_sdf.upsample_fused_rays against the XLA per-round
loop (with fused per-round evals) at the phase-2 workload shape, then
times both.  Run BEFORE flipping FMOV_FUSED_UPSAMPLE_FULL on by default
— interpret-mode tests cannot catch Mosaic lowering failures.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/validate_upsample_tpu.py [--batch 8192]
"""

import argparse
import os
import time

os.environ.setdefault("FMOV_FUSED_UPSAMPLE", "1")

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from fmov_pose_tpu.fields import nets
from fmov_pose_tpu.ops import fused_sdf
from fmov_pose_tpu.render import neus


def timeit(f, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--n0", type=int, default=64)
    ap.add_argument("--imp", type=int, default=64)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()
    B, n0, imp, steps = args.batch, args.n0, args.imp, args.steps

    sdf_cfg = dict(ge.SDF_CFG, use_fused_train=True,
                   compute_dtype="bfloat16")
    params = {"sdf": nets.init_sdf(jax.random.key(0), sdf_cfg)}
    model_cfg = {"sdf": sdf_cfg}

    rng = np.random.default_rng(0)
    o = rng.normal(size=(B, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o + rng.normal(size=(B, 3)) * 0.05
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    near = jnp.asarray(1.0 + rng.random((B, 1)) * 0.2, jnp.float32)
    z0 = near + 2.0 * jnp.linspace(0.0, 1.0, n0)[None, :]

    @jax.jit
    def xla_loop(p, o, d, z_vals):
        sdf = neus._sdf_bn(p, model_cfg, o, d, z_vals)
        for i in range(steps):
            new_z = neus.up_sample(p, model_cfg, o, d, z_vals, sdf,
                                   imp // steps, 64.0 * 2 ** i)
            z_vals, sdf = neus.cat_z_vals(p, model_cfg, o, d, z_vals,
                                          new_z, sdf,
                                          last=(i + 1 == steps))
        return z_vals

    @jax.jit
    def kernel(p, o, d, z0):
        return fused_sdf.upsample_fused_rays(
            p["sdf"], sdf_cfg, o, d, z0, imp, steps)

    z_ref = np.asarray(xla_loop(params, o, d, z0))
    z_ker = np.asarray(kernel(params, o, d, z0))
    diff = np.abs(z_ker - z_ref)
    sorted_ok = bool((z_ker[:, 1:] >= z_ker[:, :-1]).all())
    print(f"max|dz|={diff.max():.3e} mean|dz|={diff.mean():.3e} "
          f"frac>1e-2={float((diff > 1e-2).mean()):.2e} sorted={sorted_ok}")

    t_x = timeit(xla_loop, params, o, d, z0)
    t_k = timeit(kernel, params, o, d, z0)
    print(f"xla loop (fused evals): {t_x*1e3:8.2f} ms")
    print(f"full kernel:            {t_k*1e3:8.2f} ms")
    ok = sorted_ok and diff.max() < 5e-2 and float((diff > 1e-2).mean()) < 1e-3
    print("VALIDATE_UPSAMPLE_" + ("OK" if ok else "FAIL"))


if __name__ == "__main__":
    main()
