"""Phase-2 step time breakdown on the real chip.

Times the full phase-2 train step (batch 4096, 64+64 samples, fused
kernels) and its components in isolation, so perf work targets the
actual bottleneck. One TPU process at a time.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/phase2_probe.py
       [--batch 4096] [--occ]
Env: FMOV_KERNEL_TILE to vary the Pallas tile width.
"""

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import bench
import __graft_entry__ as ge
from fmov_pose_tpu.data import rays as raygen
from fmov_pose_tpu.fields import nets
from fmov_pose_tpu.ops import fused_color, fused_sdf
from fmov_pose_tpu.poses import picture_pose as pp
from fmov_pose_tpu.render import neus
from fmov_pose_tpu.train import step as step_mod


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
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--occ", action="store_true")
    args = ap.parse_args()
    B = args.batch
    n_rays = 2 * B            # maintain_shape doubles
    n_total = 128             # 64 + 64
    N = n_rays * n_total      # samples in render_core

    # --- full train step (the bench configuration)
    photo_step, state, packed = bench.build(
        B, use_fused_train=True, phase2=True, occupancy=args.occ)
    # photo_step donates its state arg: thread it instead of reusing
    # (reuse of a donated buffer is a runtime error on the TPU backend)
    t_step, state = bench.time_steps(photo_step, state, packed,
                                     warmup=3, iters=10)
    t_step = 1.0 / t_step
    print(f"full step   ({n_rays} rays x {n_total}): {t_step*1e3:8.2f} ms "
          f"-> {n_rays/t_step:,.0f} rays/s")

    # --- glue decomposition: optimizer alone, raygen alone -------------
    cfg = photo_step.cfg
    images, masks, intr_inv_all, bbox_table = photo_step.data
    scalars, img_id, add_img_id, _ = step_mod.unpack_scalars(
        jnp.asarray(packed), cfg.n_segments)

    @jax.jit
    def opt_only(state, g_params, g_bank):
        new_params, new_opt, new_bank, new_pose_opt = step_mod._apply_updates(
            cfg, state, g_params, g_bank, scalars)
        return new_params, new_opt, new_bank, new_pose_opt

    g_params = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-4), state.params)
    g_bank = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-4), state.pose_bank["train"])
    t = timeit(opt_only, state, g_params, g_bank)
    print(f"optimizer (main+seg Adam) alone: {t*1e3:8.2f} ms")

    @jax.jit
    def raygen_only(state, key):
        bank = state.pose_bank
        k1, k2 = jax.random.split(key)
        pose0 = step_mod.pose_of_frame(cfg, state.params, bank,
                                       state.pose_static, img_id)
        data = raygen.gen_random_rays(
            k1, images, masks, intr_inv_all, pose0, img_id, cfg.batch_size,
            bbox_table, cfg.mask_guided_patch_size, cfg.mask_guided_sampling,
            cfg.H, cfg.W, mask_guided_active=scalars.mask_guided)
        pose_a = step_mod.pose_of_frame(cfg, state.params, bank,
                                        state.pose_static, add_img_id)
        add = raygen.gen_random_rays(
            k2, images, masks, intr_inv_all, pose_a, add_img_id,
            cfg.batch_size, bbox_table, cfg.mask_guided_patch_size,
            cfg.mask_guided_sampling, cfg.H, cfg.W,
            mask_guided_active=scalars.mask_guided)
        return jnp.concatenate([data, add], axis=0).sum()

    t = timeit(raygen_only, state, jax.random.key(3))
    print(f"raygen (2x gen_random_rays) fwd: {t*1e3:8.2f} ms")

    # --- glue decomposition, part 2: where does step - render go? ------
    loss_fn = step_mod.make_photo_loss(cfg, images, masks, intr_inv_all,
                                       bbox_table)
    bank_train = state.pose_bank["train"]

    vg_full = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1),
                                         has_aux=True))
    t = timeit(vg_full, state.params, bank_train, state, jax.random.key(4),
               img_id, add_img_id, scalars)
    print(f"value_and_grad(loss) full:       {t*1e3:8.2f} ms")

    vg_params = jax.jit(jax.value_and_grad(loss_fn, argnums=0, has_aux=True))
    t = timeit(vg_params, state.params, bank_train, state, jax.random.key(4),
               img_id, add_img_id, scalars)
    print(f"value_and_grad(loss) params-only:{t*1e3:8.2f} ms")

    fwd_loss = jax.jit(loss_fn)
    t = timeit(fwd_loss, state.params, bank_train, state, jax.random.key(4),
               img_id, add_img_id, scalars)
    print(f"loss fwd only:                   {t*1e3:8.2f} ms")

    # fixed-data variant: rays precomputed outside the grad — removes the
    # pose->raygen forward AND the loss->rays->pose backward entirely
    data_fixed = jax.jit(lambda st, key: jnp.concatenate([
        raygen.gen_random_rays(
            key, images, masks, intr_inv_all,
            step_mod.pose_of_frame(cfg, st.params, st.pose_bank,
                                   st.pose_static, img_id),
            img_id, cfg.batch_size, bbox_table, cfg.mask_guided_patch_size,
            cfg.mask_guided_sampling, cfg.H, cfg.W,
            mask_guided_active=scalars.mask_guided)] * 2, axis=0))(
        state, jax.random.key(5))

    def loss_fixed_rays(params):
        total, _ = step_mod._render_and_losses(
            cfg, jax.random.key(6), params, state.pose_bank,
            state.pose_static, data_fixed, scalars)
        return total

    t = timeit(jax.jit(jax.grad(loss_fixed_rays)), state.params)
    print(f"grad(render+losses) fixed rays:  {t*1e3:8.2f} ms")

    model_cfg = ge._model_cfg(n_samples=64, n_importance=64)
    model_cfg = dict(model_cfg)
    for net in ("sdf", "color", "nerf"):
        model_cfg[net] = dict(model_cfg[net], compute_dtype="bfloat16")
    model_cfg["sdf"]["use_fused_train"] = True
    params = ge._field_params(jax.random.key(0))
    sdf_cfg = model_cfg["sdf"]
    color_cfg = model_cfg["color"]

    rng = np.random.default_rng(0)
    o = rng.normal(size=(n_rays, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o + rng.normal(size=(n_rays, 3)) * 0.05
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(o, jnp.float32)
    rays_d = jnp.asarray(d, jnp.float32)
    near = jnp.full((n_rays, 1), 1.0)
    far = jnp.full((n_rays, 1), 3.0)

    # --- render forward only
    def render_fwd(p):
        out = neus.render(jax.random.key(0), p, model_cfg, rays_o, rays_d,
                          near, far, perturb_overwrite=0.0)
        return out["color_fine"].sum() + out["gradient_error"]

    t = timeit(jax.jit(render_fwd), params)
    print(f"render fwd only:              {t*1e3:8.2f} ms")

    # --- render fwd+bwd (loss-shaped, no optimizer)
    t = timeit(jax.jit(jax.grad(render_fwd)), params)
    print(f"render fwd+bwd:               {t*1e3:8.2f} ms")

    # --- SDF-guided upsampling alone (the no-grad z refinement)
    def upsample_only(p):
        z_lin = jnp.linspace(0.0, 1.0, 64)
        z_vals = near + (far - near) * z_lin[None, :]
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., :, None]
        sdf = neus._sdf_only_fn(model_cfg)(p["sdf"], pts.reshape(-1, 3))
        sdf = sdf.reshape(n_rays, 64)
        for i in range(4):
            new_z = neus.up_sample(p, model_cfg, rays_o, rays_d, z_vals,
                                   sdf, 16, 64.0 * 2**i)
            z_vals, sdf = neus.cat_z_vals(p, model_cfg, rays_o, rays_d,
                                          z_vals, new_z, sdf,
                                          last=(i == 3))
        return z_vals.sum()

    t = timeit(jax.jit(upsample_only), params)
    print(f"upsample (5 sdf fwd + sorts): {t*1e3:8.2f} ms")

    # --- fused SDF fwd+grad at render_core scale
    pts = jnp.asarray(rng.normal(size=(N, 3)) * 0.4, jnp.float32)

    def sdf_fg(p, x):
        out, grad = fused_sdf.sdf_apply_grad_fused(p, sdf_cfg, x)
        return out.sum() + grad.sum()

    t = timeit(jax.jit(sdf_fg), params["sdf"], pts)
    print(f"sdf fused fwd+grad @{N}: {t*1e3:8.2f} ms")

    # --- fused SDF second-order bwd at scale
    def sdf_loss(p, x):
        out, grad = fused_sdf.sdf_apply_grad_fused(p, sdf_cfg, x)
        return out.sum() + ((jnp.linalg.norm(grad, axis=-1) - 1) ** 2).sum()

    t = timeit(jax.jit(jax.grad(sdf_loss)), params["sdf"], pts)
    print(f"sdf fused 2nd-order  @{N}: {t*1e3:8.2f} ms")

    # --- fused color fwd+bwd at scale
    xc = jnp.asarray(rng.normal(size=(N, 289)) * 0.3, jnp.float32)

    def color_loss(p, x):
        return fused_color.color_fused(p, color_cfg, x).sum()

    t = timeit(jax.jit(jax.grad(color_loss)), params["color"], xc)
    print(f"color fused fwd+bwd  @{N}: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
