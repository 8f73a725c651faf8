#!/usr/bin/env python
"""Attribute the ~28 ms of phase-2 'glue' (full fwd+bwd minus the three
kernel line items) to individual boundary pieces, so round-3 perf work
targets measured cost.  One TPU process at a time.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/glue_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from fmov_pose_tpu.ops import fused_color, fused_sdf
from fmov_pose_tpu.render import neus


def timeit(f, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    B, N = 8192, 128
    M = B * N
    model_cfg = ge._model_cfg(n_samples=64, n_importance=64)
    model_cfg = dict(model_cfg)
    for net in ("sdf", "color", "nerf"):
        model_cfg[net] = dict(model_cfg[net], compute_dtype="bfloat16")
    model_cfg["sdf"]["use_fused_train"] = True
    params = ge._field_params(jax.random.key(0))
    color_cfg = model_cfg["color"]

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(M, 3)) * 0.4, jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    normals = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
    feature = jnp.asarray(rng.normal(size=(M, 256)) * 0.5, jnp.float32)
    weights_in = jnp.asarray(rng.random((B, N)), jnp.float32)

    # 1. raw color kernel fwd+bwd on a prebuilt concat (baseline 18.4)
    xc = jnp.asarray(rng.normal(size=(M, 289)) * 0.3, jnp.float32)

    def raw_loss(p, x):
        return fused_color.color_fused(p, color_cfg, x).sum()

    print(f"color raw kernel fwd+bwd:      "
          f"{timeit(jax.jit(jax.grad(raw_loss)), params['color'], xc):7.2f} ms")

    # 2. featfirst wrapper fwd+bwd (adds assemble + permute + split-vjp)
    def ff_loss(p, a, b, c, f):
        return fused_color.color_fused_featfirst(
            p, color_cfg, a, b, c, f).sum()

    t = timeit(jax.jit(jax.grad(ff_loss, argnums=(0, 1, 2, 3, 4))),
               params["color"], pts, dirs, normals, feature)
    print(f"color featfirst fwd+bwd:       {t:7.2f} ms")

    # 3. featfirst + the actual compositing chain (reshape/mul/sum)
    def ff_comp_loss(p, a, b, c, f, w):
        col = fused_color.color_fused_featfirst(
            p, color_cfg, a, b, c, f).reshape(B, N, 3)
        color = (col * w[..., None]).sum(axis=1)
        return jnp.abs(color - 0.5).sum()

    t = timeit(jax.jit(jax.grad(ff_comp_loss, argnums=(0, 1, 2, 3, 4, 5))),
               params["color"], pts, dirs, normals, feature, weights_in)
    print(f"  + [B,N,3] compositing:       {t:7.2f} ms")

    # 4. sdf fwd+grad kernel alone vs + the consumer-side chains
    sdf_cfg = model_cfg["sdf"]

    def sdf_fg(p, x):
        out, grad = fused_sdf.sdf_apply_grad_fused(p, sdf_cfg, x)
        return out.sum() + grad.sum()

    print(f"sdf fused fwd+grad:            "
          f"{timeit(jax.jit(sdf_fg), params['sdf'], pts):7.2f} ms")

    def sdf_fg_chain(p, x, d):
        out, grad = fused_sdf.sdf_apply_grad_fused(p, sdf_cfg, x)
        sdf_bn = out[:, :1].reshape(B, N)
        true_cos = (d * grad).sum(-1).reshape(B, N)
        gn = jnp.sqrt((grad * grad).sum(-1)).reshape(B, N)
        return sdf_bn.sum() + true_cos.sum() + ((gn - 1.0) ** 2).sum()

    print(f"  + [B,N] consumer chains:     "
          f"{timeit(jax.jit(jax.grad(sdf_fg_chain)), params['sdf'], pts, dirs):7.2f} ms")

    # 5. full alpha/transmittance chain fwd+bwd alone ([B,N] shapes)
    sdf_bn = jnp.asarray(rng.normal(size=(B, N)) * 0.2, jnp.float32)
    cos_bn = jnp.asarray(-rng.random((B, N)), jnp.float32)
    dists = jnp.full((B, N), 2.0 / N, jnp.float32)

    def alpha_chain(s, c):
        est_next = s + c * dists * 0.5
        est_prev = s - c * dists * 0.5
        pc = jax.nn.sigmoid(est_prev * 64.0)
        nc = jax.nn.sigmoid(est_next * 64.0)
        alpha = jnp.clip((pc - nc + 1e-5) / (pc + 1e-5), 0.0, 1.0)
        w = neus._transmittance_weights(alpha)
        return w.sum()

    print(f"alpha+cumprod chain fwd+bwd:   "
          f"{timeit(jax.jit(jax.grad(alpha_chain)), sdf_bn, cos_bn):7.2f} ms")


if __name__ == "__main__":
    main()
