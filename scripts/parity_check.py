#!/usr/bin/env python
"""CPU numerical-parity harness vs the actual PyTorch reference.

Loads the reference implementation from /root/reference (torch CPU),
injects IDENTICAL weights into both frameworks, and asserts that:

  1. positional encoders match (layout + values),
  2. SDF forward and the eikonal gradient match,
  3. the color (IDR) and background NeRF nets match,
  4. deterministic inverse-CDF sampling (sample_pdf) matches,
  5. the FULL hierarchical render() matches on fixed ray batches —
     phase-1 config (32 uniform samples) and phase-2 config
     (64 + 64 importance, 4 up-sample passes), with and without the
     NeRF++ background, across cos-anneal ratios,
  6. all 6 training-loss values match (color L1 / eikonal / mask BCE /
     bidirectional flow reprojection / unit-sphere / depth),
  7. the LearnPoseGF pose network matches (both output heads),
  8. N full Adam training steps track each other (param divergence).

Run (CPU; the harness forces jax_platforms=cpu before any array op):
    PYTHONPATH=/root/repo python scripts/parity_check.py

Reference entry points being validated against:
  /root/reference/models/fields.py:9-294, renderer.py:54-498,
  picture_pose.py:13-186, exp_runner.py:584-779 (loss block),
  dataset.py:835-842 (near/far).

SURVEY §7 hard-part 6: "build a step-for-step parity harness against
recorded reference traces on CPU before performance work".
"""

import argparse
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

FAILURES = []
RESULTS = []


def _setup():
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")  # before any array op
    jax.config.update("jax_default_matmul_precision", "highest")
    # the reference imports mcubes at module scope; not needed for parity
    if "mcubes" not in sys.modules:
        stub = types.ModuleType("mcubes")
        stub.marching_cubes = None
        sys.modules["mcubes"] = stub
    if "easydict" not in sys.modules:  # camera.py import, dict-alike
        stub = types.ModuleType("easydict")
        stub.EasyDict = dict
        sys.modules["easydict"] = stub
    sys.path.insert(0, REFERENCE)
    import torch
    torch.manual_seed(0)
    torch.set_default_dtype(torch.float32)


def check(name, ref, ours, atol, rtol=1e-4):
    ref = np.asarray(ref, np.float64)
    ours = np.asarray(ours, np.float64)
    if ref.shape != ours.shape:
        FAILURES.append(f"{name}: shape {ref.shape} vs {ours.shape}")
        RESULTS.append((name, float("nan"), float("nan"), "FAIL(shape)"))
        return
    adiff = np.abs(ref - ours)
    max_abs = float(adiff.max()) if adiff.size else 0.0
    denom = np.maximum(np.abs(ref), 1e-8)
    max_rel = float((adiff / denom).max()) if adiff.size else 0.0
    ok = bool(np.all(adiff <= atol + rtol * np.abs(ref)))
    RESULTS.append((name, max_abs, max_rel, "ok" if ok else "FAIL"))
    if not ok:
        FAILURES.append(
            f"{name}: max_abs={max_abs:.3e} max_rel={max_rel:.3e} "
            f"(atol={atol:.1e} rtol={rtol:.1e})")


# ---------------------------------------------------------------------------
# weight transfer: torch modules -> jax param pytrees
# ---------------------------------------------------------------------------


def _t2j(t):
    """torch tensor -> jax array, FORCING a copy: jnp.asarray on a
    torch .numpy() view is zero-copy on the CPU backend, so without the
    copy the jax params would alias torch parameter memory and
    torch's in-place optimizer.step() would silently mutate them."""
    import jax.numpy as jnp
    return jnp.array(np.array(t.detach().numpy(), copy=True))


def _lin_params(lin, weight_norm):
    if weight_norm:
        return {"v": _t2j(lin.weight_v), "g": _t2j(lin.weight_g)[:, 0],
                "b": _t2j(lin.bias)}
    return {"w": _t2j(lin.weight), "b": _t2j(lin.bias)}


def sdf_params_from_torch(net, n_layers, weight_norm=True):
    return {"layers": {f"lin{l}": _lin_params(getattr(net, f"lin{l}"),
                                              weight_norm)
                       for l in range(n_layers + 1)}}


def color_params_from_torch(net, n_layers, weight_norm=True):
    return {"layers": {f"lin{l}": _lin_params(getattr(net, f"lin{l}"),
                                              weight_norm)
                       for l in range(n_layers + 1)}}


def nerf_params_from_torch(net):
    return {
        "pts": {f"lin{i}": _lin_params(net.pts_linears[i], False)
                for i in range(len(net.pts_linears))},
        "views0": _lin_params(net.views_linears[0], False),
        "feature": _lin_params(net.feature_linear, False),
        "alpha": _lin_params(net.alpha_linear, False),
        "rgb": _lin_params(net.rgb_linear, False),
    }


def variance_params_from_torch(net):
    import jax.numpy as jnp
    return {"variance": jnp.array(float(net.variance.detach()))}


def gf_params_from_torch(net, emphasize_rot):
    train = {"lin1": _lin_params(net.lin1, False),
             "lin2": _lin_params(net.lin2, False)}
    if emphasize_rot:
        train["lin3_rot"] = _lin_params(net.lin3_rot, False)
        train["lin3_trans"] = _lin_params(net.lin3_trans, False)
        train["lin3_scale"] = _lin_params(net.lin3_scale, False)
    else:
        train["lin3"] = _lin_params(net.lin3, False)
    static = {"b": _t2j(net.b), "init_c2w": _t2j(net.init_c2w)}
    return {"train": train, "static": static}


# ---------------------------------------------------------------------------
# model configs (phase-2 womask settings, confs/ho3d_global_womask.conf)
# ---------------------------------------------------------------------------

SDF_CFG = {"d_out": 257, "d_in": 3, "d_hidden": 256, "n_layers": 8,
           "skip_in": (4,), "multires": 6, "bias": 0.5, "scale": 1.0,
           "geometric_init": True, "weight_norm": True}
COLOR_CFG = {"d_feature": 256, "mode": "idr", "d_in": 9, "d_out": 3,
             "d_hidden": 256, "n_layers": 4, "weight_norm": True,
             "multires_view": 4, "squeeze_out": True}
NERF_CFG = {"D": 8, "d_in": 4, "d_in_view": 3, "W": 256, "multires": 10,
            "multires_view": 4, "output_ch": 4, "skips": (4,),
            "use_viewdirs": True}


def build_torch_nets():
    from models import fields as rf
    sdf = rf.SDFNetwork(d_in=3, d_out=257, d_hidden=256, n_layers=8,
                        skip_in=[4], multires=6, bias=0.5, scale=1.0,
                        geometric_init=True, weight_norm=True)
    color = rf.RenderingNetwork(d_feature=256, mode="idr", d_in=9, d_out=3,
                                d_hidden=256, n_layers=4, weight_norm=True,
                                multires_view=4, squeeze_out=True)
    nerf = rf.NeRF(D=8, W=256, d_in=4, d_in_view=3, multires=10,
                   multires_view=4, output_ch=4, skips=[4],
                   use_viewdirs=True)
    var = rf.SingleVarianceNetwork(init_val=0.3)
    return sdf, color, nerf, var


def build_jax_params(t_sdf, t_color, t_nerf, t_var):
    return {"sdf": sdf_params_from_torch(t_sdf, 8),
            "color": color_params_from_torch(t_color, 4),
            "nerf": nerf_params_from_torch(t_nerf),
            "variance": variance_params_from_torch(t_var)}


def fixed_rays(batch, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(batch, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    target = rng.normal(size=(batch, 3)) * 0.2
    d = target - o
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------


def stage_embedder():
    import torch
    from models.embedder import get_embedder as ref_get_embedder
    from fmov_pose_tpu.core.embedder import positional_encode
    x = np.random.default_rng(1).normal(size=(64, 3)).astype(np.float32)
    for multires in (4, 6, 10):
        fn, _ = ref_get_embedder(multires, input_dims=3)
        ref = fn(torch.from_numpy(x)).numpy()
        ours = np.asarray(positional_encode(x, multires))
        check(f"embedder_m{multires}", ref, ours, atol=1e-6)


def stage_fields(t_sdf, t_color, t_nerf, t_var, params):
    import torch
    from fmov_pose_tpu.fields import nets
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(256, 3)).astype(np.float32) * 0.8

    ref_out = t_sdf(torch.from_numpy(pts)).detach().numpy()
    ours_out = np.asarray(nets.sdf_apply(params["sdf"], SDF_CFG, pts))
    check("sdf_forward", ref_out, ours_out, atol=2e-6)

    ref_grad = t_sdf.gradient(
        torch.from_numpy(pts).clone()).squeeze(1).detach().numpy()
    ours_grad = np.asarray(nets.sdf_gradient(params["sdf"], SDF_CFG, pts))
    check("sdf_gradient", ref_grad, ours_grad, atol=1e-5)

    normals = ref_grad / np.linalg.norm(ref_grad, axis=-1, keepdims=True)
    dirs = rng.normal(size=(256, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    feats = ref_out[:, 1:].astype(np.float32)
    ref_col = t_color(torch.from_numpy(pts), torch.from_numpy(normals),
                      torch.from_numpy(dirs),
                      torch.from_numpy(feats)).detach().numpy()
    ours_col = np.asarray(nets.color_apply(
        params["color"], COLOR_CFG, pts, normals, dirs, feats))
    check("color_forward", ref_col, ours_col, atol=2e-6)

    pts4 = rng.normal(size=(256, 4)).astype(np.float32)
    ref_a, ref_rgb = t_nerf(torch.from_numpy(pts4), torch.from_numpy(dirs))
    ours_a, ours_rgb = nets.nerf_apply(params["nerf"], NERF_CFG, pts4, dirs)
    check("nerf_alpha", ref_a.detach().numpy(), np.asarray(ours_a), atol=2e-5)
    check("nerf_rgb", ref_rgb.detach().numpy(), np.asarray(ours_rgb),
          atol=2e-5)

    ref_inv_s = t_var(torch.zeros(1, 3)).detach().numpy()[0, 0]
    ours_inv_s = float(nets.variance_inv_s(params["variance"]))
    check("variance_inv_s", ref_inv_s, ours_inv_s, atol=1e-5)


def stage_sample_pdf():
    import torch
    from models.renderer import sample_pdf as ref_sample_pdf
    from fmov_pose_tpu.core.sampling import sample_pdf
    rng = np.random.default_rng(3)
    bins = np.sort(rng.uniform(0, 4, size=(32, 64)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, size=(32, 63)).astype(np.float32)
    ref = ref_sample_pdf(torch.from_numpy(bins), torch.from_numpy(weights),
                         16, det=True).numpy()
    ours = np.asarray(sample_pdf(bins, weights, 16))
    check("sample_pdf_det", ref, ours, atol=1e-5)


def _ref_renderer(t_sdf, t_color, t_nerf, t_var, n_samples, n_importance,
                  n_outside, up_sample_steps):
    from models.renderer import NeuSRenderer
    return NeuSRenderer(t_nerf, t_sdf, t_var, t_color, n_samples,
                        n_importance, n_outside, up_sample_steps,
                        perturb=0.0)


def _jax_model_cfg(n_samples, n_importance, n_outside, up_sample_steps):
    from fmov_pose_tpu.render import neus
    return {"sdf": SDF_CFG, "color": COLOR_CFG, "nerf": NERF_CFG,
            "renderer": neus.RenderCfg(n_samples, n_importance, n_outside,
                                       up_sample_steps, 0.0)}


RENDER_KEYS = ("color_fine", "depth_fine", "s_val", "weight_sum",
               "weight_max", "cdf_fine", "weights", "gradient_error")


def _ref_render_manual_bg(ref_r, rays_o, rays_d, near, far, background_rgb,
                          cos_anneal_ratio):
    """renderer.py:374-498 with perturb=0 and n_outside>0, minus the
    crashing depth_fine line (see caller comment). Returns the reference
    output dict with depth_fine computed over the inside samples only —
    the semantics our renderer implements."""
    import torch
    batch_size = len(rays_o)
    n = ref_r.n_samples
    sample_dist = 2.0 / n
    z_vals = near + (far - near) * torch.linspace(0.0, 1.0, n)[None, :]
    z_vals_outside = torch.linspace(
        1e-3, 1.0 - 1.0 / (ref_r.n_outside + 1.0), ref_r.n_outside)
    z_vals_outside = (far / torch.flip(z_vals_outside, dims=[-1])
                      + 1.0 / n)

    if ref_r.n_importance > 0:
        with torch.no_grad():
            pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., :, None]
            sdf = ref_r.sdf_network.sdf(pts.reshape(-1, 3)).reshape(
                batch_size, n)
            for i in range(ref_r.up_sample_steps):
                new_z = ref_r.up_sample(
                    rays_o, rays_d, z_vals, sdf,
                    ref_r.n_importance // ref_r.up_sample_steps, 64 * 2 ** i)
                z_vals, sdf = ref_r.cat_z_vals(
                    rays_o, rays_d, z_vals, new_z, sdf,
                    last=(i + 1 == ref_r.up_sample_steps))
    n_total = n + ref_r.n_importance

    z_vals_feed, _ = torch.sort(
        torch.cat([z_vals, z_vals_outside], dim=-1), dim=-1)
    ret_outside = ref_r.render_core_outside(
        rays_o, rays_d, z_vals_feed, sample_dist, ref_r.nerf)

    ret_fine = ref_r.render_core(
        rays_o, rays_d, z_vals, sample_dist,
        ref_r.sdf_network, ref_r.deviation_network, ref_r.color_network,
        background_rgb=background_rgb,
        background_alpha=ret_outside["alpha"],
        background_sampled_color=ret_outside["sampled_color"],
        cos_anneal_ratio=cos_anneal_ratio)
    weights = ret_fine["weights"]
    weights_sum = weights.sum(dim=-1, keepdim=True)
    s_val = ret_fine["s_val"].reshape(batch_size, n_total).mean(
        dim=-1, keepdim=True)
    depth_fine = (weights[:, :n_total] * ret_fine["mid_z_vals"]).sum(
        dim=-1, keepdim=True)
    return {
        "color_fine": ret_fine["color"], "depth_fine": depth_fine,
        "s_val": s_val, "cdf_fine": ret_fine["cdf"],
        "weight_sum": weights_sum,
        "weight_max": torch.max(weights, dim=-1, keepdim=True)[0],
        "gradients": ret_fine["gradients"], "weights": weights,
        "gradient_error": ret_fine["gradient_error"],
        "inside_sphere": ret_fine["inside_sphere"], "pts": ret_fine["pts"],
    }


def _run_both_renders(t_sdf, t_color, t_nerf, t_var, params, spec,
                      cos_anneal, background_rgb=None, batch=48):
    import jax
    import torch
    from fmov_pose_tpu.render import neus
    n_s, n_i, n_o, ups = spec
    rays_o, rays_d = fixed_rays(batch)
    near = far = None
    # near/far from sphere, identical math both sides
    a = (rays_d ** 2).sum(-1, keepdims=True)
    b = 2.0 * (rays_o * rays_d).sum(-1, keepdims=True)
    mid = 0.5 * (-b) / a
    near, far = mid - 1.0, mid + 1.0

    ref_r = _ref_renderer(t_sdf, t_color, t_nerf, t_var, n_s, n_i, n_o, ups)
    bg_t = None if background_rgb is None else torch.ones(1, 3)
    if n_o == 0:
        ref_out = ref_r.render(
            torch.from_numpy(rays_o), torch.from_numpy(rays_d),
            torch.from_numpy(near), torch.from_numpy(far),
            perturb_overwrite=0.0, background_rgb=bg_t,
            cos_anneal_ratio=cos_anneal)
    else:
        # The reference's own render() CRASHES when n_outside > 0: its
        # depth_fine line (renderer.py:485) multiplies weights
        # [B, n+n_outside] by mid_z_vals [B, n] — latent dead code (every
        # shipped conf sets n_outside = 0). Reproduce renderer.py:374-483
        # manually so the background math itself can still be validated.
        ref_out = _ref_render_manual_bg(
            ref_r, torch.from_numpy(rays_o), torch.from_numpy(rays_d),
            torch.from_numpy(near), torch.from_numpy(far), bg_t, cos_anneal)

    cfg = _jax_model_cfg(n_s, n_i, n_o, ups)
    bg_j = None if background_rgb is None else np.ones((1, 3), np.float32)
    ours_out = neus.render(jax.random.key(0), params, cfg, rays_o, rays_d,
                           near, far, perturb_overwrite=0.0,
                           background_rgb=bg_j, cos_anneal_ratio=cos_anneal)
    return ref_out, ours_out


def stage_render(t_sdf, t_color, t_nerf, t_var, params):
    specs = {
        "p1": (32, 0, 0, 4),          # phase-1: ho3d_virtual.conf
        "p2": (64, 64, 0, 4),         # phase-2: ho3d_global_womask.conf
        "p2_bg": (64, 64, 32, 4),     # with NeRF++ background + white bkgd
    }
    for tag, spec in specs.items():
        bg = 1.0 if tag.endswith("_bg") else None
        for ca in ((0.4,) if tag != "p2" else (0.0, 0.4, 1.0)):
            ref_out, ours_out = _run_both_renders(
                t_sdf, t_color, t_nerf, t_var, params, spec, ca,
                background_rgb=bg)
            for k in RENDER_KEYS:
                ref_v = ref_out[k].detach().numpy()
                # per-sample weights in importance configs accumulate f32
                # GEMM-order noise through 5 SDF-guided resample passes
                # (inv_s up to 1024 amplifies ~1e-6 sdf diffs); the
                # composited outputs (color/depth/weight_sum) match at
                # 1e-6, so a looser absolute floor is correct here
                atol = 3e-4 if k == "weights" else 5e-5
                check(f"render_{tag}_ca{ca}_{k}", ref_v,
                      np.asarray(ours_out[k]), atol=atol, rtol=5e-4)


def _torch_losses(ref_out, true_rgb, mask, igr_weight, mask_weight,
                  unit_sphere_weight, depth_weight, depth_gt,
                  flow=None, flow_weight=0.1):
    """The reference loss block, verbatim semantics
    (`/root/reference/exp_runner.py:584-779`)."""
    import torch
    import torch.nn.functional as F
    mask_sum = mask.sum() + 1e-5
    color_fine = ref_out["color_fine"]
    color_error = (color_fine - true_rgb) * mask
    color_loss = F.l1_loss(color_error, torch.zeros_like(color_error),
                           reduction="sum") / mask_sum
    psnr = 20.0 * torch.log10(
        1.0 / (((color_fine - true_rgb) ** 2 * mask).sum()
               / (mask_sum * 3.0)).sqrt())
    eikonal_loss = ref_out["gradient_error"]
    mask_loss = F.binary_cross_entropy(
        ref_out["weight_sum"].clip(1e-3, 1.0 - 1e-3), mask)
    losses = {"color_loss": color_loss, "eikonal_loss": eikonal_loss,
              "mask_loss": mask_loss, "psnr": psnr}
    total = color_loss + eikonal_loss * igr_weight + mask_loss * mask_weight

    if unit_sphere_weight > 0:
        pts = ref_out["pts"]
        n_rays = ref_out["weights"].shape[0]
        n_mid = pts.shape[0] // n_rays
        weights = ref_out["weights"][:, :n_mid].reshape(-1, 1)
        outside_mask = (pts.norm(dim=-1) > 1.0).detach()
        w = weights[outside_mask]
        us = F.l1_loss(w, torch.zeros_like(w)) * unit_sphere_weight
        losses["unit_sphere_loss"] = us
        total = total + us

    if depth_weight > 0 and depth_gt is not None:
        depth_fine = ref_out["depth_fine"]
        dm = ((mask > 0.5) & (depth_gt > 0)).reshape(-1)
        df, dg = depth_fine[dm], depth_gt[dm]
        dl = F.l1_loss(df, dg) * depth_weight
        losses["depth_loss"] = dl
        total = total + dl

    if flow is not None:
        pts, weights = ref_out["pts"], ref_out["weights"]
        (pixels_xy, pixels_xy_corr, c2w_1, c2w_0, K) = flow
        n_rays = weights.shape[0]
        n_mid = pts.shape[0] // n_rays
        weights = weights[:, :n_mid]
        pts0 = pts[: pts.shape[0] // 2]
        pts1 = pts[pts.shape[0] // 2:]
        w0 = weights[: n_rays // 2]
        w1 = weights[n_rays // 2:]

        def proj(p, c2w, K):
            hom = torch.cat([p, torch.ones_like(p[:, :1])], -1)
            w2c = torch.inverse(c2w)[:3][None].expand(p.shape[0], -1, -1)
            cam = (w2c @ hom.unsqueeze(-1)).squeeze(-1)
            Ke = K[:3, :3][None].expand(p.shape[0], -1, -1)
            pix = (Ke @ cam.unsqueeze(-1)).squeeze(-1)
            return pix[:, :2] / pix[:, 2:]

        pix0 = proj(pts0, c2w_1, K).reshape(-1, w0.shape[1], 2)
        e0 = ((pix0 - pixels_xy[:, None, :]) * w0[:, :, None]).sum(dim=1)
        fl0 = F.l1_loss(e0, torch.zeros_like(e0)) * flow_weight
        pix1 = proj(pts1, c2w_0, K).reshape(-1, w1.shape[1], 2)
        e1 = ((pix1 - pixels_xy_corr[:, None, :]) * w1[:, :, None]).sum(dim=1)
        fl1 = F.l1_loss(e1, torch.zeros_like(e1)) * flow_weight
        losses["flow_loss"] = fl0 + fl1
        total = total + fl0 + fl1

    losses["loss"] = total
    return losses


def stage_losses(t_sdf, t_color, t_nerf, t_var, params):
    """Full 6-loss objective parity on a fixed photometric + flow batch."""
    import jax
    import torch
    from fmov_pose_tpu.poses import picture_pose as pp
    from fmov_pose_tpu.train import step as step_mod

    batch = 64
    rays_o, rays_d = fixed_rays(batch, seed=7)
    rng = np.random.default_rng(8)
    true_rgb = rng.uniform(0, 1, (batch, 3)).astype(np.float32)
    mask = (rng.uniform(0, 1, (batch, 1)) > 0.4).astype(np.float32)
    depth_gt = rng.uniform(1.2, 2.8, (batch, 1)).astype(np.float32)
    depth_gt[::5] = 0.0

    igr_w, mask_w, us_w, depth_w, flow_w = 0.1, 5.0, 0.3, 0.2, 0.1

    # ---- photometric losses
    spec = (32, 0, 0, 4)
    ca = 0.6
    ref_out, _ = _run_both_renders(t_sdf, t_color, t_nerf, t_var, params,
                                   spec, ca, batch=batch)
    # re-render ref on OUR fixed batch (rays differ in _run_both_renders)
    # -> instead render both on the same rays here:
    a = (rays_d ** 2).sum(-1, keepdims=True)
    b = 2.0 * (rays_o * rays_d).sum(-1, keepdims=True)
    mid = 0.5 * (-b) / a
    near, far = mid - 1.0, mid + 1.0
    ref_r = _ref_renderer(t_sdf, t_color, t_nerf, t_var, *spec)
    ref_out = ref_r.render(torch.from_numpy(rays_o),
                           torch.from_numpy(rays_d),
                           torch.from_numpy(near), torch.from_numpy(far),
                           perturb_overwrite=0.0, cos_anneal_ratio=ca)
    ref_losses = _torch_losses(
        ref_out, torch.from_numpy(true_rgb), torch.from_numpy(mask),
        igr_w, mask_w, us_w, depth_w, torch.from_numpy(depth_gt))

    cfg = step_mod.make_step_config(
        _jax_model_cfg(*spec), batch_size=batch, H=8, W=8, n_segments=1,
        segment_img_num=1, pose_mode="fixed", pose_cfg=pp.PoseCfg(),
        igr_weight=igr_w, mask_weight=mask_w, unit_sphere_weight=us_w,
        depth_weight=depth_w)
    scalars = step_mod.StepScalars(
        lr=jax.numpy.asarray(5e-4), cos_anneal=jax.numpy.asarray(ca),
        main_update=jax.numpy.ones(()), pose_update=jax.numpy.ones(()),
        mask_guided=jax.numpy.ones(()), seg_touch=jax.numpy.ones((1,)),
        seg_freeze=jax.numpy.ones((1,)), seg_lr=jax.numpy.full((1,), 5e-4),
        trans_head_on=jax.numpy.ones(()))
    data = np.concatenate([rays_o, rays_d, true_rgb, mask, depth_gt], -1)
    _, ours_m = step_mod._render_and_losses(
        cfg, jax.random.key(0), params, {}, {}, data, scalars)
    for k in ("loss", "color_loss", "eikonal_loss", "mask_loss",
              "unit_sphere_loss", "depth_loss", "psnr"):
        check(f"loss_{k}", float(ref_losses[k]), float(ours_m[k]),
              atol=5e-5, rtol=5e-4)

    # ---- flow loss (bidirectional reprojection, fixed poses)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 400.0
    K[0, 2] = K[1, 2] = 240.0
    pose0 = np.eye(4, dtype=np.float32)
    pose0[2, 3] = 2.5
    pose1 = pose0.copy()
    pose1[0, 3] = 0.3
    B2 = batch // 2
    pixels_xy = rng.uniform(100, 380, (B2, 2)).astype(np.float32)
    pixels_xy_corr = rng.uniform(100, 380, (B2, 2)).astype(np.float32)

    ref_flow_losses = _torch_losses(
        ref_out, torch.from_numpy(true_rgb), torch.from_numpy(mask),
        igr_w, mask_w, 0.0, 0.0, None,
        flow=(torch.from_numpy(pixels_xy), torch.from_numpy(pixels_xy_corr),
              torch.from_numpy(pose1), torch.from_numpy(pose0),
              torch.from_numpy(K)),
        flow_weight=flow_w)

    cfg_f = step_mod.make_step_config(
        _jax_model_cfg(*spec), batch_size=batch, H=8, W=8, n_segments=1,
        segment_img_num=1, pose_mode="fixed", pose_cfg=pp.PoseCfg(),
        igr_weight=igr_w, mask_weight=mask_w, flow_weight=flow_w)
    pose_static = {"pose_all": np.stack([pose0[:3], pose1[:3]])}
    flow_ctx = (1, 0, pixels_xy, pixels_xy_corr, K, K)
    data_f = np.concatenate([rays_o, rays_d, true_rgb, mask], -1)
    _, ours_f = step_mod._render_and_losses(
        cfg_f, jax.random.key(0), params, {}, pose_static, data_f, scalars,
        flow_ctx=flow_ctx)
    check("loss_flow", float(ref_flow_losses["flow_loss"]),
          float(ours_f["flow_loss"]), atol=5e-5, rtol=5e-4)


def stage_pose_net():
    import torch
    from models import picture_pose as ref_pp
    from fmov_pose_tpu.poses import picture_pose as pp

    n_cams = 6
    init = np.eye(4, dtype=np.float32)[None].repeat(n_cams, 0)
    init[:, 2, 3] = -2.0
    for emph in (False, True):
        t_net = ref_pp.LearnPoseGF(
            n_cams, init_c2w=torch.from_numpy(init.copy()),
            emphasize_rot=emph)
        # randomize the MLP so the parity isn't tested at the zero-init point
        with torch.no_grad():
            for lin in ([t_net.lin1, t_net.lin2]
                        + ([t_net.lin3_rot, t_net.lin3_trans, t_net.lin3_scale]
                           if emph else [t_net.lin3])):
                lin.weight.add_(torch.randn_like(lin.weight) * 0.05)
                lin.bias.add_(torch.randn_like(lin.bias) * 0.05)
        params = gf_params_from_torch(t_net, emph)
        cfg = pp.PoseCfg(emphasize_rot=emph)
        for cam in range(n_cams):
            ref_pose = t_net(torch.tensor(cam)).detach().numpy()[:3]
            ours_pose = np.asarray(pp.gf_apply(params, cfg, cam))
            check(f"pose_gf_emph{int(emph)}_cam{cam}", ref_pose, ours_pose,
                  atol=2e-5)


def stage_camera_math():
    """Quaternion helpers + novel-view oscillation vs `models/camera.py`."""
    import torch
    from models import camera as ref_cam
    from fmov_pose_tpu.core import quaternion as quat

    rng = np.random.default_rng(21)
    from scipy.spatial.transform import Rotation
    R = Rotation.random(32, random_state=4).as_matrix().astype(np.float32)
    ref_q = ref_cam.quaternion.R_to_q(torch.from_numpy(R.copy())).numpy()
    ours_q = np.asarray(quat.R_to_q(R))
    check("quat_R_to_q", ref_q, ours_q, atol=1e-5)
    check("quat_q_to_R",
          ref_cam.quaternion.q_to_R(torch.from_numpy(ref_q)).numpy(),
          np.asarray(quat.q_to_R(ref_q)), atol=1e-6)
    q2 = np.roll(ref_q, 1, axis=0)
    check("quat_product",
          ref_cam.quaternion.product(torch.from_numpy(ref_q),
                                     torch.from_numpy(q2)).numpy(),
          np.asarray(quat.q_product(ref_q, q2)), atol=1e-6)
    check("quat_invert",
          ref_cam.quaternion.invert(torch.from_numpy(ref_q)).numpy(),
          np.asarray(quat.q_invert(ref_q)), atol=1e-6)

    anchor = np.eye(3, 4, dtype=np.float32)
    anchor[2, 3] = 2.0
    ref_novel = ref_cam.get_novel_view_poses(
        None, torch.from_numpy(anchor.copy()), N=16, scale=1.3).numpy()
    ours_novel = np.asarray(quat.get_novel_view_poses(anchor, N=16,
                                                      scale=1.3))
    check("novel_view_poses", ref_novel, ours_novel, atol=1e-5)


def stage_train_steps(n_steps):
    """N full Adam steps on the identical fixed batch; track divergence."""
    import jax
    import torch
    from fmov_pose_tpu.poses import picture_pose as pp
    from fmov_pose_tpu.train import optim, step as step_mod

    t_sdf, t_color, t_nerf, t_var = build_torch_nets()
    params = build_jax_params(t_sdf, t_color, t_nerf, t_var)

    batch = 64
    rays_o, rays_d = fixed_rays(batch, seed=11)
    rng = np.random.default_rng(12)
    true_rgb = rng.uniform(0, 1, (batch, 3)).astype(np.float32)
    mask = (rng.uniform(0, 1, (batch, 1)) > 0.4).astype(np.float32)
    igr_w, mask_w, lr = 0.1, 5.0, 5e-4
    spec = (32, 0, 0, 4)
    ca = 0.8

    # torch side
    a = (rays_d ** 2).sum(-1, keepdims=True)
    b = 2.0 * (rays_o * rays_d).sum(-1, keepdims=True)
    mid = 0.5 * (-b) / a
    near, far = mid - 1.0, mid + 1.0
    ref_r = _ref_renderer(t_sdf, t_color, t_nerf, t_var, *spec)
    t_params = (list(t_sdf.parameters()) + list(t_color.parameters())
                + list(t_var.parameters()))
    t_opt = torch.optim.Adam(t_params, lr=lr)
    t_rgb, t_mask = torch.from_numpy(true_rgb), torch.from_numpy(mask)
    t_losses = []
    t_grads = {}
    for step_i in range(n_steps):
        out = ref_r.render(torch.from_numpy(rays_o),
                           torch.from_numpy(rays_d),
                           torch.from_numpy(near), torch.from_numpy(far),
                           perturb_overwrite=0.0, cos_anneal_ratio=ca)
        l = _torch_losses(out, t_rgb, t_mask, igr_w, mask_w, 0, 0, None)
        t_opt.zero_grad()
        l["loss"].backward()
        if step_i == 0:
            t_grads["sdf"] = np.concatenate(
                [p.grad.detach().numpy().ravel()
                 for p in t_sdf.parameters()])
            t_grads["color"] = np.concatenate(
                [p.grad.detach().numpy().ravel()
                 for p in t_color.parameters()])
            t_grads["variance"] = np.concatenate(
                [p.grad.detach().numpy().ravel()
                 for p in t_var.parameters()])
        t_opt.step()
        t_losses.append(float(l["loss"]))

    # jax side
    cfg = step_mod.make_step_config(
        _jax_model_cfg(*spec), batch_size=batch, H=8, W=8, n_segments=1,
        segment_img_num=1, pose_mode="fixed", pose_cfg=pp.PoseCfg(),
        igr_weight=igr_w, mask_weight=mask_w)
    scalars = step_mod.StepScalars(
        lr=jax.numpy.asarray(lr), cos_anneal=jax.numpy.asarray(ca),
        main_update=jax.numpy.ones(()), pose_update=jax.numpy.ones(()),
        mask_guided=jax.numpy.ones(()), seg_touch=jax.numpy.ones((1,)),
        seg_freeze=jax.numpy.ones((1,)), seg_lr=jax.numpy.full((1,), lr),
        trans_head_on=jax.numpy.ones(()))
    data = np.concatenate([rays_o, rays_d, true_rgb, mask], -1)

    def loss_fn(p):
        total, m = step_mod._render_and_losses(
            cfg, jax.random.key(0), p, {}, {}, data, scalars)
        return total, m

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    opt = optim.adam_init(params)
    j_losses = []
    for step_i in range(n_steps):
        (total, m), grads = grad_fn(params)
        if step_i == 0:
            # GRADIENT parity at the shared starting point: this is the
            # semantic check (fwd + double-backward eikonal + loss bwd).
            # Relative error is measured against each net's grad scale:
            # per-element rel on near-zero grads is just noise ratio.
            for net in ("sdf", "color", "variance"):
                o = np.concatenate(
                    [np.ravel(np.asarray(x)) for x in
                     jax.tree_util.tree_leaves(grads[net])])
                r = t_grads[net]
                scale = max(float(np.abs(r).max()), 1e-12)
                check(f"grads_{net}_at_init_relmax", r / scale, o / scale,
                      atol=2e-4)
        params, opt = optim.adam_update(grads, opt, params, lr)
        j_losses.append(float(total))

    # Short-horizon trajectory: still deterministic enough to compare
    # directly (Adam's ~sign(g) step makes noise-level-gradient params
    # diverge by ±2*lr immediately, but the loss is flat in those).
    check("train_loss_traj_first3", np.asarray(t_losses[:3]),
          np.asarray(j_losses[:3]), atol=1e-3, rtol=1e-2)

    # Long-horizon: trajectories are chaotic (sign-level divergence
    # compounds), so compare the optimization OUTCOME, not the path:
    # both must descend by the same total amount within 20%.
    t_drop = t_losses[0] - float(np.mean(t_losses[-3:]))
    j_drop = j_losses[0] - float(np.mean(j_losses[-3:]))
    check(f"train_loss_drop_{n_steps}steps", t_drop, j_drop,
          atol=0.02 * abs(t_losses[0]), rtol=0.2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20,
                    help="optimizer-parity step count")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    _setup()
    t_sdf, t_color, t_nerf, t_var = build_torch_nets()
    params = build_jax_params(t_sdf, t_color, t_nerf, t_var)

    stage_embedder()
    stage_fields(t_sdf, t_color, t_nerf, t_var, params)
    stage_sample_pdf()
    stage_render(t_sdf, t_color, t_nerf, t_var, params)
    stage_losses(t_sdf, t_color, t_nerf, t_var, params)
    stage_pose_net()
    stage_camera_math()
    if not args.skip_train:
        stage_train_steps(args.steps)

    w = max(len(n) for n, *_ in RESULTS)
    lines = [f"{'check':<{w}}  {'max_abs':>10}  {'max_rel':>10}  status"]
    for name, ma, mr, status in RESULTS:
        lines.append(f"{name:<{w}}  {ma:10.3e}  {mr:10.3e}  {status}")
    n_ok = sum(1 for *_, s in RESULTS if s == "ok")
    print("\n" + "\n".join(lines))
    print(f"\n{n_ok}/{len(RESULTS)} checks passed")

    report = os.path.join(REPO, "PARITY_REPORT.md")
    with open(report, "w") as f:
        f.write(
            "# Numerical parity vs the PyTorch reference (CPU)\n\n"
            "Generated by `scripts/parity_check.py`: identical weights "
            "injected into the actual reference implementation (loaded "
            "from /root/reference, torch CPU) and this framework (jax "
            "CPU), then forward passes, full hierarchical renders, all 6 "
            "training losses, gradients, and Adam training steps "
            "compared.\n\n```\n" + "\n".join(lines)
            + f"\n\n{n_ok}/{len(RESULTS)} checks passed\n```\n")
    print(f"wrote {report}")

    if FAILURES:
        print("\nFAILURES:")
        for f in FAILURES:
            print(" -", f)
        sys.exit(1)
    print("PARITY OK: jax implementation matches the PyTorch reference")


if __name__ == "__main__":
    main()
