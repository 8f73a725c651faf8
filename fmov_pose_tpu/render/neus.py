"""NeuS volume renderer as a pure, jittable function (TPU-native).

Re-design of `/root/reference/models/renderer.py:89-498` with XLA-friendly
structure:

* One pure function ``render(key, params, cfg, rays_o, rays_d, near, far, ...)``
  — all state (networks) in the `params` pytree, all randomness via the key.
* The SDF-guided up-sampling loop is a statically-unrolled Python loop
  (`up_sample_steps` is config), each step adding a fixed number of samples:
  static shapes throughout, merged with `jnp.sort`/`take_along_axis`.
* All per-sample math ([B, N] alphas, cumprod transmittance, compositing)
  stays fused by XLA into the MLP matmul pipeline; batch = rays,
  samples flattened into the matmul M dimension for the MXU.

Numerics match the reference exactly: sigmoid-CDF alpha
`(prev_cdf - next_cdf + 1e-5)/(prev_cdf + 1e-5)` clipped to [0, 1]
(`renderer.py:304-314`), cos annealing (`:299-302`), 1e-7 cumprod epsilon,
`inv_s = 64 * 2**i` upsample schedule (`:437`).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from fmov_pose_tpu.core.sampling import merge_sorted, sample_pdf
from fmov_pose_tpu.fields import nets

Params = Dict[str, Any]


class RenderCfg(NamedTuple):
    n_samples: int
    n_importance: int
    n_outside: int
    up_sample_steps: int
    perturb: float


def make_render_cfg(conf: Dict[str, Any]) -> RenderCfg:
    return RenderCfg(
        n_samples=int(conf["n_samples"]),
        n_importance=int(conf["n_importance"]),
        n_outside=int(conf["n_outside"]),
        up_sample_steps=int(conf["up_sample_steps"]),
        perturb=float(conf["perturb"]),
    )


def _sdf_only_fn(model_cfg):
    """Pick the Pallas-fused SDF forward for gradient-free evaluation when
    enabled+supported (ops/fused_sdf.py), else the XLA reference.

    `use_fused_train` also enables it: the SDF-guided upsampling inside the
    train step is gradient-free and at phase-2 scale (~1M points/step) the
    XLA path measured 122 ms vs ~15 ms fused (scripts/phase2_probe.py)."""
    sdf_cfg = model_cfg["sdf"]
    if sdf_cfg.get("use_fused", False) or sdf_cfg.get("use_fused_train", False):
        from fmov_pose_tpu.ops import fused_sdf
        if fused_sdf.supported(sdf_cfg):
            return lambda params, x: fused_sdf.sdf_only_fused(
                params, sdf_cfg, x)
    return lambda params, x: nets.sdf_only(params, sdf_cfg, x)


def _transmittance_weights(alpha: jnp.ndarray) -> jnp.ndarray:
    """weights = alpha * cumprod([1, 1-alpha+1e-7])[:, :-1] (`renderer.py:337-342`)."""
    ones = jnp.ones_like(alpha[..., :1])
    trans = jnp.cumprod(jnp.concatenate([ones, 1.0 - alpha + 1e-7], axis=-1), axis=-1)
    return alpha * trans[..., :-1]


def up_sample(params, model_cfg, rays_o, rays_d, z_vals, sdf, n_importance, inv_s):
    """One SDF-guided importance-sampling pass (`renderer.py:168-220`)."""
    batch_size, n_samples = z_vals.shape
    # |o + z d|^2 expanded: avoids materializing [B, N, 3] points whose
    # 3-wide minor dim pads 42x on TPU (measured ~30 ms/step in phase 2)
    o2 = jnp.sum(rays_o * rays_o, axis=-1, keepdims=True)
    od = jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    d2 = jnp.sum(rays_d * rays_d, axis=-1, keepdims=True)
    radius_sq = o2 + 2.0 * z_vals * od + z_vals * z_vals * d2
    inside_sphere = (radius_sq[:, :-1] < 1.0) | (radius_sq[:, 1:] < 1.0)
    sdf = sdf.reshape(batch_size, n_samples)
    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)

    # use min(cos, prev_cos): robust against double-crossing sections
    prev_cos = jnp.concatenate([jnp.zeros_like(cos_val[:, :1]), cos_val[:, :-1]], axis=-1)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    weights = _transmittance_weights(alpha)
    return sample_pdf(z_vals, weights, n_importance)  # det, no grad needed


def cat_z_vals(params, model_cfg, rays_o, rays_d, z_vals, new_z_vals, sdf, last: bool):
    """Merge-sort new samples into z_vals, re-querying SDF (`renderer.py:222-242`).

    Both inputs are per-ray ascending (sample_pdf draws from a monotone
    CDF), so the argsort becomes a gather-free two-list merge."""
    batch_size, n_samples = z_vals.shape
    _, n_importance = new_z_vals.shape
    if last:
        return merge_sorted(z_vals, new_z_vals), sdf
    pts = rays_o[:, None, :] + rays_d[:, None, :] * new_z_vals[..., :, None]
    new_sdf = _sdf_only_fn(model_cfg)(params["sdf"], pts.reshape(-1, 3))
    new_sdf = new_sdf.reshape(batch_size, n_importance)
    return merge_sorted(z_vals, new_z_vals, sdf, new_sdf)


def render_core_outside(params, model_cfg, rays_o, rays_d, z_vals, sample_dist,
                        background_rgb=None):
    """NeRF++ background shell (`renderer.py:112-166`)."""
    batch_size, n_samples = z_vals.shape
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1],
         jnp.full((batch_size, 1), sample_dist, z_vals.dtype)], axis=-1)
    mid_z = z_vals + dists * 0.5
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., :, None]
    dis_to_center = jnp.clip(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1.0, 1e10)
    pts4 = jnp.concatenate([pts / dis_to_center, 1.0 / dis_to_center], axis=-1)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)

    density, sampled_color = nets.nerf_apply(
        params["nerf"], model_cfg["nerf"], pts4.reshape(-1, 4), dirs.reshape(-1, 3))
    sampled_color = jax.nn.sigmoid(sampled_color).reshape(batch_size, n_samples, 3)
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(density.reshape(batch_size, n_samples)) * dists)
    weights = _transmittance_weights(alpha)
    color = (weights[:, :, None] * sampled_color).sum(axis=1)
    if background_rgb is not None:
        color = color + background_rgb * (1.0 - weights.sum(axis=-1, keepdims=True))
    return {"color": color, "sampled_color": sampled_color, "alpha": alpha,
            "weights": weights}


def render_core(params, model_cfg, rays_o, rays_d, z_vals, sample_dist,
                background_alpha=None, background_sampled_color=None,
                background_rgb=None, cos_anneal_ratio=1.0, eval_mode=False,
                eikonal_parts=False):
    """SDF -> alpha -> composite (`renderer.py:244-372`)."""
    batch_size, n_samples = z_vals.shape
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1],
         jnp.full((batch_size, 1), sample_dist, z_vals.dtype)], axis=-1)
    mid_z_vals = z_vals + dists * 0.5
    m_total = batch_size * n_samples

    sdf_cfg = model_cfg["sdf"]

    use_fused_train = False
    use_rays = False
    if sdf_cfg.get("use_fused_train", False):
        from fmov_pose_tpu.ops import fused_sdf
        use_fused_train = fused_sdf.supported(sdf_cfg)
        use_rays = use_fused_train and fused_sdf.supported_rays(
            sdf_cfg, n_samples, m_total)

    sdf_bn_direct = None
    grad_pl = None          # [3, M] channel-plane gradients (rays path)
    pts = dirs = gradients = pts_pl = None
    if use_rays:
        # rays variant (round 3): PE + its derivative chains live
        # in-kernel and the sdf scalar comes out [B, N] directly, so
        # the [M,39] xe/pe-vjp passes and the [M,257] cotangent
        # assembly never touch HBM (~30 ms/step at 1M samples).
        # Geometry crosses the boundary as [3, M] CHANNEL PLANES: the
        # [M, 3] layout pads 3 -> 128 lanes (42x HBM traffic) on every
        # producer/consumer pass — hlo_dump.py measured 25.5 ms/step of
        # such glue at 1M samples.  Planes are built from three [B, N]
        # fusions (bitwise-identical arithmetic, per element).
        from fmov_pose_tpu.ops import fused_sdf
        pts_pl = jnp.concatenate(
            [(rays_o[:, c:c + 1] + rays_d[:, c:c + 1] * mid_z_vals)
             .reshape(1, -1) for c in range(3)], axis=0)
        sdf_nn, sdf_bn_direct, grad_pl = \
            fused_sdf.sdf_apply_grad_fused_rays(
                params["sdf"], sdf_cfg, pts_pl, n_samples)
    else:
        pts = (rays_o[:, None, :]
               + rays_d[:, None, :] * mid_z_vals[..., :, None]).reshape(-1, 3)
        dirs = jnp.broadcast_to(
            rays_d[:, None, :], (batch_size, n_samples, 3)).reshape(-1, 3)
        if use_fused_train:
            # fully-fused Pallas path: fwd+grad in one kernel, and a
            # fused second-order backward (custom_vjp) — O(batch)
            # memory, ~15% faster than the remat'ed XLA path on v5e
            from fmov_pose_tpu.ops import fused_sdf
            sdf_nn, gradients = fused_sdf.sdf_apply_grad_fused(
                params["sdf"], sdf_cfg, pts)
        else:
            # remat: the outer training grad differentiates through this
            # block's own VJP (second order for the eikonal term).  Without
            # checkpointing, XLA materializes every per-layer activation of
            # both passes — ~25 GB at 1M samples.  Recomputing them in the
            # backward trades ~2x MLP FLOPs for O(batch) memory.
            def _sdf_block(sdf_params, pts_in):
                out = nets.sdf_apply(sdf_params, sdf_cfg, pts_in)
                grads = nets.sdf_gradient(sdf_params, sdf_cfg, pts_in)
                return out, grads

            sdf_nn, gradients = jax.checkpoint(_sdf_block)(
                params["sdf"], pts)
    if sdf_bn_direct is not None:
        sdf = sdf_bn_direct.reshape(-1, 1)
    else:
        sdf = sdf_nn[:, :1]
    feature = sdf_nn[:, 1:]
    if eval_mode:
        if grad_pl is not None:
            grad_pl = jax.lax.stop_gradient(grad_pl)
        else:
            gradients = jax.lax.stop_gradient(gradients)

    color_cfg = model_cfg["color"]
    use_fused_color = False
    use_fused_color_ray = False
    if use_fused_train and color_cfg.get("use_fused_train", True):
        from fmov_pose_tpu.ops import fused_color
        use_fused_color = (fused_color.supported(color_cfg)
                           and m_total >= fused_color.MIN_SAMPLES)
        # ray-level composited kernel (round 3): reads the raw SDF output
        # (no [M,256] feature slice), builds the PE tail in-kernel from
        # [9, M] planes, and composites each ray's samples in VMEM — the
        # [M,289] concat + cotangent, [M,3] color and [B,N,3] composite
        # chains (glue_probe.py: ~22 ms at 1M samples) never touch HBM.
        # Incompatible with NeRF++ background mixing (needs per-sample
        # colors) — falls back to the featfirst path there.  Requires
        # the rays SDF path (plane-form geometry + raw sdf_nn).
        import os
        use_fused_color_ray = (
            use_fused_color and use_rays and background_alpha is None
            and fused_color.supported_ray(color_cfg, n_samples)
            and os.environ.get("FMOV_FUSED_COLOR_RAY", "1") == "1")

    if use_rays and not use_fused_color_ray:
        # rare combo (e.g. NeRF++ background at rays scale): downstream
        # color paths need row-form [M, 3] geometry
        pts = pts_pl.T
        dirs = jnp.broadcast_to(
            rays_d[:, None, :], (batch_size, n_samples, 3)).reshape(-1, 3)
        gradients = grad_pl.T

    if use_fused_color_ray:
        sampled_color = None  # composited in-kernel after weights
    elif use_fused_color:
        # fused Pallas color MLP with feature-FIRST input assembly: the
        # standard [pts|vpe|normals|feat] concat materializes from 3/27-
        # wide pieces (42x lane padding at the pallas boundary, ~24 ms at
        # 1M pts); feature-first + a selection-matmul tail saves ~8 ms.
        # (A fully in-kernel split-input variant measured a wash — the
        # 3-wide inputs DMA 42x-padded from HBM — and was deleted.)
        from fmov_pose_tpu.ops import fused_color
        sampled_color = fused_color.color_fused_featfirst(
            params["color"], color_cfg, pts, dirs, gradients,
            feature).reshape(batch_size, n_samples, 3)
    else:
        def _color_block(color_params, pts_in, grads_in, dirs_in, feat_in):
            return nets.color_apply(color_params, model_cfg["color"], pts_in,
                                    grads_in, dirs_in, feat_in)

        sampled_color = jax.checkpoint(_color_block)(
            params["color"], pts, gradients, dirs, feature
        ).reshape(batch_size, n_samples, 3)

    inv_s = nets.variance_inv_s(params["variance"])

    # the whole cdf/alpha chain runs on [B, N] (N = 32/64/128 -> full
    # 128-lane tiles); the reference's [B*N, 1] column shapes pad 128x
    # per materialized op on TPU. Elementwise only — bitwise identical.
    sdf_bn = (sdf_bn_direct if sdf_bn_direct is not None
              else sdf.reshape(batch_size, n_samples))
    if gradients is None:
        # plane form: three [B, N] fused multiplies, no [M, 3] pass
        g_bn = grad_pl.reshape(3, batch_size, n_samples)
        true_cos = (rays_d[:, 0:1] * g_bn[0] + rays_d[:, 1:2] * g_bn[1]
                    + rays_d[:, 2:3] * g_bn[2])
    else:
        true_cos = (dirs * gradients).sum(-1).reshape(
            batch_size, n_samples)
    # anneal keeps cos "alive" early in training (`renderer.py:297-302`)
    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )

    est_next_sdf = sdf_bn + iter_cos * dists * 0.5
    est_prev_sdf = sdf_bn - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev_sdf * inv_s)
    next_cdf = jax.nn.sigmoid(est_next_sdf * inv_s)
    p = prev_cdf - next_cdf
    c = prev_cdf
    alpha = jnp.clip((p + 1e-5) / (c + 1e-5), 0.0, 1.0)

    # |o + z d|^2 expansion instead of a [B*N, 3] norm (3-wide minor dims
    # pad to 128 lanes on TPU; see up_sample)
    o2 = jnp.sum(rays_o * rays_o, axis=-1, keepdims=True)
    od = jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    d2 = jnp.sum(rays_d * rays_d, axis=-1, keepdims=True)
    pts_norm_sq = o2 + 2.0 * mid_z_vals * od + mid_z_vals * mid_z_vals * d2
    inside_sphere = jax.lax.stop_gradient(
        (pts_norm_sq < 1.0).astype(alpha.dtype))
    relax_inside_sphere = jax.lax.stop_gradient(
        (pts_norm_sq < 1.44).astype(alpha.dtype))

    if background_alpha is not None:
        alpha = alpha * inside_sphere + background_alpha[:, :n_samples] * (1.0 - inside_sphere)
        alpha = jnp.concatenate([alpha, background_alpha[:, n_samples:]], axis=-1)
        sampled_color = (
            sampled_color * inside_sphere[:, :, None]
            + background_sampled_color[:, :n_samples] * (1.0 - inside_sphere)[:, :, None]
        )
        sampled_color = jnp.concatenate(
            [sampled_color, background_sampled_color[:, n_samples:]], axis=1)

    weights = _transmittance_weights(alpha)
    weights_sum = weights.sum(axis=-1, keepdims=True)
    if use_fused_color_ray:
        from fmov_pose_tpu.ops import fused_color
        # [9, M] channel planes: pts/dirs/normals as rows
        dirs_pl = jnp.concatenate(
            [jnp.broadcast_to(rays_d[:, c:c + 1],
                              (batch_size, n_samples)).reshape(1, -1)
             for c in range(3)], axis=0)
        u = jnp.concatenate([pts_pl, dirs_pl, grad_pl], axis=0)
        color = fused_color.color_fused_ray(
            params["color"], color_cfg, sdf_nn, u, weights)
    else:
        color = (sampled_color * weights[..., None]).sum(axis=1)
    if background_rgb is not None:
        color = color + background_rgb * (1.0 - weights_sum)

    # sqrt-of-sum-of-squares over the channel axis — never a [B, N, 3]
    # norm whose 3-wide minor dim pads 42x
    if gradients is None:
        grad_norm = jnp.sqrt((grad_pl * grad_pl).sum(0)).reshape(
            batch_size, n_samples)
    else:
        grad_norm = jnp.sqrt((gradients * gradients).sum(-1)).reshape(
            batch_size, n_samples)
    gradient_error_raw = (grad_norm - 1.0) ** 2
    eik_num = (relax_inside_sphere * gradient_error_raw).sum()
    eik_den = relax_inside_sphere.sum()
    if eikonal_parts:
        # (numerator, denominator) so data-parallel callers can psum both
        gradient_error = (eik_num, eik_den)
    else:
        gradient_error = eik_num / (eik_den + 1e-5)

    return {
        "color": color,
        "sdf": sdf,
        "dists": dists,
        # row-form outputs for eval/aux consumers AND two train losses:
        # train/step.py reads out['pts'] when unit_sphere_weight>0 and in
        # the flow loss.  In the plain photo loss both are unused and XLA
        # dead-code-eliminates the transposes; when those losses run on
        # the rays path (>=64k samples), pts_pl.T materializes the [M,3]
        # 42x-lane-padded layout — if that combination ever matters for
        # perf, feed those consumers plane-form pts (the flow projection
        # matmul can contract the channel axis directly).  Today flow
        # batches sit far below the rays gate, so this is latent only.
        "gradients": (grad_pl.reshape(3, batch_size, n_samples)
                      .transpose(1, 2, 0) if gradients is None
                      else gradients.reshape(batch_size, n_samples, 3)),
        "s_val": 1.0 / inv_s,
        "mid_z_vals": mid_z_vals,
        "weights": weights,
        "cdf": c,
        "gradient_error": gradient_error,
        "inside_sphere": inside_sphere,
        "pts": pts if pts is not None else pts_pl.T,
    }


def render(key, params, model_cfg, rays_o, rays_d, near, far,
           perturb_overwrite: float = -1.0, background_rgb=None,
           cos_anneal_ratio: float = 1.0, eval_mode: bool = False,
           eikonal_parts: bool = False, occ_grid=None):
    """Full hierarchical render (`renderer.py:374-498`). Returns the same
    output dict as the reference (`color_fine`, `depth_fine`, `s_val`, ...)."""
    cfg: RenderCfg = model_cfg["renderer"]
    batch_size = rays_o.shape[0]
    sample_dist = 2.0 / cfg.n_samples
    z_lin = jnp.linspace(0.0, 1.0, cfg.n_samples)
    z_vals = near + (far - near) * z_lin[None, :]

    z_vals_outside = None
    if cfg.n_outside > 0:
        z_vals_outside = jnp.linspace(
            1e-3, 1.0 - 1.0 / (cfg.n_outside + 1.0), cfg.n_outside)

    perturb = cfg.perturb if perturb_overwrite < 0 else perturb_overwrite
    if perturb > 0:
        key, k1, k2 = jax.random.split(key, 3)
        t_rand = jax.random.uniform(k1, (batch_size, 1)) - 0.5
        z_vals = z_vals + t_rand * 2.0 / cfg.n_samples
        if cfg.n_outside > 0:
            mids = 0.5 * (z_vals_outside[1:] + z_vals_outside[:-1])
            upper = jnp.concatenate([mids, z_vals_outside[-1:]])
            lower = jnp.concatenate([z_vals_outside[:1], mids])
            t_rand2 = jax.random.uniform(k2, (batch_size, cfg.n_outside))
            z_vals_outside = lower[None, :] + (upper - lower)[None, :] * t_rand2

    if cfg.n_outside > 0:
        z_vals_outside = far / jnp.flip(
            jnp.atleast_2d(z_vals_outside), axis=-1) + 1.0 / cfg.n_samples

    background_alpha = None
    background_sampled_color = None
    n_samples_total = cfg.n_samples

    if cfg.n_importance > 0 and occ_grid is not None:
        # occupancy-grid guided placement (opt-in, render/occupancy.py):
        # one gather instead of 5 SDF forward passes
        from fmov_pose_tpu.render import occupancy
        key, k_occ = jax.random.split(key)
        z_vals = occupancy.occupancy_importance(
            k_occ, occ_grid, rays_o, rays_d, z_vals, cfg.n_importance)
        n_samples_total = cfg.n_samples + cfg.n_importance
    elif cfg.n_importance > 0:
        # SDF-guided upsampling is gradient-free (`renderer.py:424` no_grad)
        def _upsample(z_vals):
            pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., :, None]
            sdf = _sdf_only_fn(model_cfg)(params["sdf"], pts.reshape(-1, 3))
            sdf = sdf.reshape(batch_size, cfg.n_samples)
            for i in range(cfg.up_sample_steps):
                new_z = up_sample(
                    params, model_cfg, rays_o, rays_d, z_vals, sdf,
                    cfg.n_importance // cfg.up_sample_steps, 64.0 * 2**i)
                z_vals, sdf = cat_z_vals(
                    params, model_cfg, rays_o, rays_d, z_vals, new_z, sdf,
                    last=(i + 1 == cfg.up_sample_steps))
            return z_vals

        z_vals = jax.lax.stop_gradient(_upsample(jax.lax.stop_gradient(z_vals)))
        n_samples_total = cfg.n_samples + cfg.n_importance

    if cfg.n_outside > 0:
        z_vals_feed = jnp.sort(
            jnp.concatenate([z_vals, jnp.broadcast_to(
                z_vals_outside, (batch_size, cfg.n_outside))], axis=-1), axis=-1)
        ret_outside = render_core_outside(
            params, model_cfg, rays_o, rays_d, z_vals_feed, sample_dist)
        background_sampled_color = ret_outside["sampled_color"]
        background_alpha = ret_outside["alpha"]

    ret_fine = render_core(
        params, model_cfg, rays_o, rays_d, z_vals, sample_dist,
        background_alpha=background_alpha,
        background_sampled_color=background_sampled_color,
        background_rgb=background_rgb,
        cos_anneal_ratio=cos_anneal_ratio,
        eval_mode=eval_mode,
        eikonal_parts=eikonal_parts,
    )

    weights = ret_fine["weights"]
    weights_sum = weights.sum(axis=-1, keepdims=True)
    s_val = jnp.broadcast_to(
        ret_fine["s_val"], (batch_size, n_samples_total)).mean(axis=-1, keepdims=True)
    depth_fine = (weights[:, :n_samples_total] * ret_fine["mid_z_vals"]).sum(
        axis=-1, keepdims=True)

    return {
        "color_fine": ret_fine["color"],
        "depth_fine": depth_fine,
        "s_val": s_val,
        "cdf_fine": ret_fine["cdf"],
        "weight_sum": weights_sum,
        "weight_max": jnp.max(weights, axis=-1, keepdims=True),
        "gradients": ret_fine["gradients"],
        "weights": weights,
        "gradient_error": ret_fine["gradient_error"],
        "inside_sphere": ret_fine["inside_sphere"],
        "pts": ret_fine["pts"],
    }
