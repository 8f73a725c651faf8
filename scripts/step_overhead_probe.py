#!/usr/bin/env python
"""Locate where the phase-2 train step's non-render overhead lives.

Times (a) the full photo step, (b) value_and_grad of the loss alone on
fixed ray data (no raygen, no optimizer), (c) the loss grad with the
fused-ray color path toggled, so the regression surface between the
render benchmark and the train step is attributable.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/step_overhead_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from fmov_pose_tpu.train import step as step_mod


def timeit(f, *args, n=15, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    B = 4096
    photo_step, state, packed = bench.build(B, use_fused_train=True,
                                            phase2=True)
    t, state = bench.time_steps(photo_step, state, packed, warmup=3, iters=10)
    print(f"full step:            {1e3/t:8.2f} ms")

    # loss+grad only, on fixed data (no raygen, no optimizer/adam)
    cfg = photo_step.cfg if hasattr(photo_step, "cfg") else None
    # rebuild the same StepConfig the bench used
    import __graft_entry__ as ge
    from fmov_pose_tpu.poses import picture_pose as pp
    model_cfg = ge._model_cfg(n_samples=64, n_importance=64)
    model_cfg = dict(model_cfg)
    for net in ("sdf", "color", "nerf"):
        model_cfg[net] = dict(model_cfg[net], compute_dtype="bfloat16")
    model_cfg["sdf"]["use_fused_train"] = True
    pose_cfg = pp.PoseCfg(emphasize_rot=True)
    scfg = step_mod.make_step_config(
        model_cfg, batch_size=B, H=480, W=480, n_segments=8,
        segment_img_num=1, pose_mode="seg", pose_cfg=pose_cfg,
        igr_weight=0.1, mask_weight=5.0, flow_weight=0.1,
        mask_guided_sampling=True, mask_guided_patch_size=10,
        maintain_shape=True, occupancy_sampling=False)

    rng = np.random.default_rng(0)
    n_rays = 2 * B
    o = rng.normal(size=(n_rays, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o + rng.normal(size=(n_rays, 3)) * 0.05
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    data = np.concatenate(
        [o, d, rng.random((n_rays, 3)),
         (rng.random((n_rays, 1)) > 0.4).astype(np.float32)], axis=-1)
    data = jnp.asarray(data, jnp.float32)
    scalars, _, _, _ = step_mod.unpack_scalars(jnp.asarray(packed),
                                               scfg.n_segments)

    def loss_fn(params, bank_train):
        bank = {"train": bank_train, "static": state.pose_bank["static"]}
        total, metrics = step_mod._render_and_losses(
            scfg, jax.random.key(3), params, bank, state.pose_static,
            data, scalars)
        return total

    g = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    t = timeit(g, state.params, state.pose_bank["train"])
    print(f"loss value_and_grad:  {t:8.2f} ms")

    # loss+grad with RAYGEN inside (pose-dependent rays, no optimizer)
    from fmov_pose_tpu.data import rays as raygen_mod
    images = jnp.asarray(rng.random((3, 8, 480, 480)), jnp.float32)
    masks = jnp.asarray((rng.random((8, 480, 480)) > 0.5), jnp.float32)
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 500.0
    intr[0, 2] = intr[1, 2] = 240.0
    intr_inv = jnp.asarray(np.linalg.inv(intr)[None].repeat(8, 0),
                           jnp.float32)
    bbox = jnp.asarray(np.tile([100, 380, 100, 380], (8, 1)), jnp.int32)

    def loss_fn_rg(params, bank_train):
        bank = {"train": bank_train, "static": state.pose_bank["static"]}
        pose0 = step_mod.pose_of_frame(scfg, params, bank,
                                       state.pose_static, 0)
        d0 = raygen_mod.gen_random_rays(
            jax.random.key(5), images, masks, intr_inv, pose0, 0, B,
            bbox, 10, True, 480, 480, mask_guided_active=scalars.mask_guided)
        pose1 = step_mod.pose_of_frame(scfg, params, bank,
                                       state.pose_static, 1)
        d1 = raygen_mod.gen_random_rays(
            jax.random.key(6), images, masks, intr_inv, pose1, 1, B,
            bbox, 10, True, 480, 480, mask_guided_active=scalars.mask_guided)
        total, metrics = step_mod._render_and_losses(
            scfg, jax.random.key(3), params, bank, state.pose_static,
            jnp.concatenate([d0, d1], axis=0), scalars)
        return total

    g2 = jax.jit(jax.grad(loss_fn_rg, argnums=(0, 1)))
    t = timeit(g2, state.params, state.pose_bank["train"])
    print(f"loss+raygen grad:     {t:8.2f} ms")


if __name__ == "__main__":
    main()
