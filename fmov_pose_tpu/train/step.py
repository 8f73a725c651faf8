"""Jitted training steps: ray gen -> render -> 6 losses -> masked Adam.

TPU re-design of the reference hot loop (`/root/reference/exp_runner.py:
399-980`).  The per-iteration Python branching of the reference (flow vs
photometric batch, segment freezing, warm-ups, progressive admission)
splits into:

* two compiled step functions (``photo_step``, ``flow_step``) with static
  shapes — chosen host-side per iteration;
* dynamic scalar/vector inputs (frame ids, LR factors, per-segment
  touch/freeze masks, cos-anneal ratio) — so schedule changes never
  recompile;
* everything else (ray sampling, pose evaluation, NeuS render, losses,
  Adam updates) fused into one XLA program per step.

Loss semantics match `exp_runner.py:584-816` exactly: masked L1 color
(sum / mask_sum), eikonal, BCE mask on clipped weight_sum, bidirectional
expected-pixel flow reprojection, unit-sphere weight penalty, and the
`detach_mesh_at_warm_up` zero-grad-but-still-step Adam drift.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from fmov_pose_tpu.core import lie
from fmov_pose_tpu.core import pose as posealg
from fmov_pose_tpu.data import rays as raygen
from fmov_pose_tpu.poses import picture_pose as pp
from fmov_pose_tpu.render import neus
from fmov_pose_tpu.train import optim


class TrainState(NamedTuple):
    params: Any           # fields (+ "pose" leaves for gf / "se3_refine" for se3)
    opt: optim.AdamState
    pose_bank: Any        # seg-mode bank {"train", "static"} or {}
    pose_opt: Any         # SegAdamState or ()
    pose_static: Any      # static pose buffers for gf/se3/fixed modes
    key: jax.Array
    iter_step: jnp.ndarray


@dataclass
class StepConfig:
    """Static (compile-time) configuration of a training step.

    Captured by closure in the step builders (never passed through jit
    boundaries), so it needs no hashability."""
    batch_size: int
    H: int
    W: int
    n_segments: int
    segment_img_num: int
    pose_mode: str                  # "seg" | "gf" | "se3" | "fixed"
    pose_cfg: pp.PoseCfg = pp.PoseCfg()
    igr_weight: float = 0.1
    mask_weight: float = 0.0
    flow_weight: float = 0.0
    depth_weight: float = 0.0
    unit_sphere_weight: float = 0.0
    use_white_bkgd: bool = False
    mask_guided_sampling: bool = False
    mask_guided_patch_size: int = 30
    maintain_shape: bool = False
    detach_ref: bool = False
    detach_flow_on_sdf: bool = False
    only_rotation: bool = False
    occupancy_sampling: bool = False  # occ-grid guided importance (opt-in)
    model_cfg: Dict[str, Any] = field(default=None)
    deep_pose_cfg: Any = None   # DeepPoseCfg for pose_mode == "seg_pixel"


def make_step_config(model_cfg, **kw) -> StepConfig:
    return StepConfig(model_cfg=model_cfg, **kw)


class StepScalars(NamedTuple):
    """Per-iteration dynamic inputs (host-computed, no recompile)."""
    lr: jnp.ndarray              # main Adam LR this step
    cos_anneal: jnp.ndarray
    main_update: jnp.ndarray     # 0/1: detach_mesh_at_warm_up gate
    pose_update: jnp.ndarray     # 0/1: pose nets frozen (mesh warm-up)
    mask_guided: jnp.ndarray     # 0/1: bbox-guided pixel sampling active
    seg_touch: jnp.ndarray       # [S] segments whose Adams step
    seg_freeze: jnp.ndarray      # [S] 1 = trainable, 0 = frozen
    seg_lr: jnp.ndarray          # [S] per-segment LR
    trans_head_on: jnp.ndarray   # 0/1 scale-head gate (disable_trans)


N_SCALAR_FIELDS = 9


def pack_scalars_np(lr, cos_anneal, main_update, pose_update, mask_guided,
                    trans_head_on, img_id, add_img_id, img_id_corr,
                    seg_touch, seg_freeze, seg_lr):
    """One host->device transfer per step instead of ~14 (tunnel/dispatch
    latency dominated the runner's step time otherwise). Frame ids ride in
    the f32 vector (exact below 2^24)."""
    import numpy as _np
    head = _np.array([lr, cos_anneal, main_update, pose_update, mask_guided,
                      trans_head_on, img_id, add_img_id, img_id_corr],
                     _np.float32)
    return _np.concatenate([head, _np.asarray(seg_touch, _np.float32),
                            _np.asarray(seg_freeze, _np.float32),
                            _np.asarray(seg_lr, _np.float32)])


def unpack_scalars(packed, n_segments: int):
    """-> (StepScalars, img_id, add_img_id, img_id_corr)."""
    k = N_SCALAR_FIELDS
    s = n_segments
    scalars = StepScalars(
        lr=packed[0], cos_anneal=packed[1], main_update=packed[2],
        pose_update=packed[3], mask_guided=packed[4], trans_head_on=packed[5],
        seg_touch=packed[k:k + s], seg_freeze=packed[k + s:k + 2 * s],
        seg_lr=packed[k + 2 * s:k + 3 * s])
    ids = packed[6:9].astype(jnp.int32)
    return scalars, ids[0], ids[1], ids[2]


def pose_of_frame(cfg: StepConfig, params, pose_bank, pose_static, cam_id):
    """c2w [3, 4] of a frame under the configured pose model."""
    if cfg.pose_mode == "seg":
        return pp.seg_apply(pose_bank, cfg.pose_cfg, cfg.segment_img_num, cam_id)
    if cfg.pose_mode == "seg_pixel":
        from fmov_pose_tpu.poses import pixel_pose as px
        return px.seg_deep_apply(pose_bank, cfg.deep_pose_cfg,
                                 cfg.segment_img_num, cam_id)
    if cfg.pose_mode == "gf":
        return pp.gf_apply({"train": params["pose"], "static": pose_static},
                           cfg.pose_cfg, cam_id)
    if cfg.pose_mode == "se3":
        refine = lie.se3_exp(params["se3_refine"][cam_id],
                             only_rot=cfg.only_rotation)
        return posealg.compose_pair(refine, pose_static["noise_poses"][cam_id, :3])
    # fixed (GT) poses
    return pose_static["pose_all"][cam_id, :3]


def _flat_bank_masks(pose_train):
    """Static 0/1 vectors over the raveled bank order marking the
    lin3_trans (permanently frozen, `picture_pose.py:52-56`) and
    lin3_scale (trans_head_on-gated) head leaves."""
    import numpy as _np
    trans, scale = [], []

    def visit(path, leaf):
        name = path[0].key if hasattr(path[0], "key") else str(path[0])
        n = int(_np.prod(_np.shape(leaf), dtype=_np.int64))
        trans.append(_np.full(n, 1.0 if name == "lin3_trans" else 0.0,
                              _np.float32))
        scale.append(_np.full(n, 1.0 if name == "lin3_scale" else 0.0,
                              _np.float32))
        return leaf

    jax.tree_util.tree_map_with_path(visit, pose_train)
    return _np.concatenate(trans), _np.concatenate(scale)


# ---------------------------------------------------------------------------
# loss core (shared by photo/flow steps)
# ---------------------------------------------------------------------------


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name else x


def _render_and_losses(cfg: StepConfig, key, params, pose_bank, pose_static,
                       data, scalars: StepScalars, flow_ctx=None,
                       axis_name=None):
    """Render a ray batch and assemble the 6-loss objective.

    With ``axis_name`` set (shard_map data parallelism), every
    ratio-of-sums loss psums its numerator AND denominator, so the
    distributed objective is bitwise-equivalent in expectation to the
    single-chip one.
    """
    rays_o, rays_d = data[:, :3], data[:, 3:6]
    true_rgb, mask = data[:, 6:9], data[:, 9:10]
    depth_gt = data[:, 10:11] if data.shape[1] > 10 else None
    near, far = raygen.near_far_from_sphere(rays_o, rays_d)
    background_rgb = jnp.ones((1, 3)) if cfg.use_white_bkgd else None

    if cfg.mask_weight > 0.0:
        mask = (mask > 0.5).astype(jnp.float32)
    else:
        mask = jnp.ones_like(mask)
    mask_sum = _psum(mask.sum(), axis_name) + 1e-5
    n_rays_total = _psum(jnp.asarray(rays_o.shape[0], jnp.float32), axis_name)

    render_params = {k: v for k, v in params.items()
                     if k in ("sdf", "color", "nerf", "variance")}
    occ_grid = (pose_static.get("occ_grid")
                if cfg.occupancy_sampling and isinstance(pose_static, dict)
                else None)
    out = neus.render(key, render_params, cfg.model_cfg, rays_o, rays_d,
                      near, far, background_rgb=background_rgb,
                      cos_anneal_ratio=scalars.cos_anneal,
                      eikonal_parts=axis_name is not None,
                      occ_grid=occ_grid)
    if axis_name is not None:
        num, den = out["gradient_error"]
        out["gradient_error"] = _psum(num, axis_name) / (
            _psum(den, axis_name) + 1e-5)

    color_fine = out["color_fine"]
    color_error = (color_fine - true_rgb) * mask
    color_loss = _psum(jnp.abs(color_error).sum(), axis_name) / mask_sum
    psnr = 20.0 * jnp.log10(
        1.0 / jnp.sqrt(_psum(((color_fine - true_rgb) ** 2 * mask).sum(),
                             axis_name) / (mask_sum * 3.0)))

    eikonal_loss = out["gradient_error"]

    w_sum = jnp.clip(out["weight_sum"], 1e-3, 1.0 - 1e-3)
    bce = -(mask * jnp.log(w_sum) + (1.0 - mask) * jnp.log(1.0 - w_sum))
    mask_loss = _psum(bce.sum(), axis_name) / n_rays_total

    if cfg.unit_sphere_weight > 0:
        pts = out["pts"]
        weights_flat = out["weights"][:, :pts.shape[0] // rays_o.shape[0]]
        outside = jax.lax.stop_gradient(
            (jnp.linalg.norm(pts, axis=-1) > 1.0).astype(jnp.float32)
        ).reshape(weights_flat.shape)
        denom = _psum(outside.sum(), axis_name) + 1e-8
        unit_sphere_loss = _psum((jnp.abs(weights_flat) * outside).sum(),
                                 axis_name) / denom * cfg.unit_sphere_weight
    else:
        unit_sphere_loss = 0.0

    flow_loss = 0.0
    if flow_ctx is not None:
        flow_loss = _flow_loss(cfg, params, pose_bank, pose_static, out,
                               flow_ctx, axis_name=axis_name)

    depth_loss = 0.0
    if cfg.depth_weight > 0.0 and depth_gt is not None:
        # masked L1 over valid-depth in-mask rays (`exp_runner.py:698-708`);
        # the reference's own depth path was unreleased/broken — this is
        # the working equivalent, static-shape via a validity weight
        valid = jax.lax.stop_gradient(
            ((mask > 0.5) & (depth_gt > 0)).astype(jnp.float32))
        num = _psum((jnp.abs(out["depth_fine"] - depth_gt) * valid).sum(),
                    axis_name)
        den = _psum(valid.sum(), axis_name) + 1e-8
        depth_loss = num / den * cfg.depth_weight

    total = (color_loss + eikonal_loss * cfg.igr_weight
             + mask_loss * cfg.mask_weight + unit_sphere_loss + flow_loss
             + depth_loss)

    metrics = {
        "loss": total, "color_loss": color_loss, "eikonal_loss": eikonal_loss,
        "mask_loss": mask_loss, "flow_loss": flow_loss,
        "unit_sphere_loss": unit_sphere_loss, "depth_loss": depth_loss,
        "psnr": psnr,
        "s_val": out["s_val"].mean(),
        "cdf": (out["cdf_fine"][:, :1] * mask).sum() / mask_sum,
        "weight_max": (out["weight_max"] * mask).sum() / mask_sum,
    }
    return total, metrics


def _project_to_pixels(pts, c2w, K):
    """World pts [N, 3] -> pixel coords [N, 2] through a 3x4 c2w."""
    hi = jax.lax.Precision.HIGHEST
    w2c = posealg.invert(c2w)
    cam = jnp.matmul(pts, w2c[:3, :3].T, precision=hi) + w2c[:3, 3]
    pix = jnp.matmul(cam, K[:3, :3].T, precision=hi)
    return pix[:, :2] / pix[:, 2:]


def _flow_loss(cfg: StepConfig, params, pose_bank, pose_static, render_out,
               flow_ctx, axis_name=None):
    """Bidirectional expected-pixel reprojection loss
    (`exp_runner.py:605-696`)."""
    img_id, img_id_corr, pixels_xy, pixels_xy_corr, K0, K1 = flow_ctx
    n_rays = render_out["weights"].shape[0]
    pts = render_out["pts"].reshape(n_rays, -1, 3)
    n_samples = pts.shape[1]
    weights = render_out["weights"][:, :n_samples]
    if cfg.detach_flow_on_sdf:
        weights = jax.lax.stop_gradient(weights)

    B2 = pixels_xy.shape[0]
    pts0, pts1 = pts[:B2].reshape(-1, 3), pts[B2:2 * B2].reshape(-1, 3)
    w0, w1 = weights[:B2], weights[B2:2 * B2]

    c2w_1 = pose_of_frame(cfg, params, pose_bank, pose_static, img_id)
    c2w_0 = pose_of_frame(cfg, params, pose_bank, pose_static, img_id_corr)
    if cfg.detach_ref:
        c2w_1 = jax.lax.stop_gradient(c2w_1)
        c2w_0 = jax.lax.stop_gradient(c2w_0)

    # corr-frame surface points -> frame img_id's pixels vs match pixels
    pix0 = _project_to_pixels(pts0, c2w_1, K1).reshape(B2, n_samples, 2)
    err0 = ((pix0 - pixels_xy[:, None, :]) * w0[:, :, None]).sum(axis=1)
    # img_id-frame surface points -> corr frame's pixels vs match pixels
    pix1 = _project_to_pixels(pts1, c2w_0, K0).reshape(B2, n_samples, 2)
    err1 = ((pix1 - pixels_xy_corr[:, None, :]) * w1[:, :, None]).sum(axis=1)

    if axis_name is None:
        return (jnp.abs(err0).mean() + jnp.abs(err1).mean()) * cfg.flow_weight
    n = _psum(jnp.asarray(err0.size, jnp.float32), axis_name)
    loss0 = _psum(jnp.abs(err0).sum(), axis_name) / n
    loss1 = _psum(jnp.abs(err1).sum(), axis_name) / n
    return (loss0 + loss1) * cfg.flow_weight


# ---------------------------------------------------------------------------
# optimizer application
# ---------------------------------------------------------------------------


def _flat_gate_masks(params):
    """Static 0/1 vectors over the raveled param order partitioning the
    gated leaf groups: (pose-or-se3 leaves, pose lin3_trans, pose
    lin3_scale).  Built from leaf paths/shapes at trace time — XLA
    constant-folds them into the flat gradient gate."""
    import numpy as _np
    pose, trans, scale = [], [], []

    def visit(path, x):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        name = ""
        if len(path) > 1:
            name = path[1].key if hasattr(path[1], "key") else str(path[1])
        n = int(_np.prod(_np.shape(x), dtype=_np.int64))
        is_pose = top in ("pose", "se3_refine")
        pose.append(_np.full(n, 1.0 if is_pose else 0.0, _np.float32))
        trans.append(_np.full(
            n, 1.0 if top == "pose" and name == "lin3_trans" else 0.0,
            _np.float32))
        scale.append(_np.full(
            n, 1.0 if top == "pose" and name == "lin3_scale" else 0.0,
            _np.float32))
        return x

    jax.tree_util.tree_map_with_path(visit, params)
    return (_np.concatenate(pose), _np.concatenate(trans),
            _np.concatenate(scale))


def _apply_updates(cfg: StepConfig, state: TrainState, grads_params,
                   grads_bank, scalars: StepScalars):
    # main Adam over ONE raveled gradient (see optim.AdamState: the
    # per-leaf tree update cost ~7 ms/step in kernel dispatches).  All
    # gates are exact 0/1 scalars, so folding the sequential per-leaf
    # multiplies into one per-position gate vector is bitwise identical:
    #  - main_update: detach_mesh_at_warm_up zeroes grads but still steps
    #    (moments decay — torch `zero_grad(); step()` drift)
    #  - pose/se3 leaves ride the main optimizer but use the pose gate;
    #    the old sequential form (g*main)/safe*pose zeroed pose grads
    #    whenever main_update == 0, kept here via jnp.where
    #  - gf emphasize_rot: lin3_trans head always 0, lin3_scale head
    #    additionally gated by trans_head_on (`exp_runner.py:793-816`)
    flat_g, _ = ravel_pytree(grads_params)
    gate = scalars.main_update
    if cfg.pose_mode in ("gf", "se3"):
        m_pose, m_trans, m_scale = _flat_gate_masks(state.params)
        pose_gate = jnp.where(scalars.main_update > 0,
                              scalars.pose_update, 0.0)
        gate = scalars.main_update * (1.0 - m_pose) + pose_gate * m_pose
        if cfg.pose_mode == "gf" and cfg.pose_cfg.emphasize_rot:
            gate = (gate * (1.0 - m_trans - m_scale)
                    + pose_gate * scalars.trans_head_on * m_scale)
    new_params, new_opt = optim.adam_update_flat(
        flat_g * gate, state.opt, state.params, scalars.lr)

    if cfg.pose_mode in ("seg", "seg_pixel"):
        # same flattening for the segment bank: per-segment freeze rides
        # a static index gather, the (all 0/1) lin3_trans / lin3_scale
        # leaf gates become static mask vectors — one fused multiply
        # instead of three ~10-leaf tree_maps
        bank_train = state.pose_bank["train"]
        flat_gb, _ = ravel_pytree(grads_bank)
        m_trans_b, m_scale_b = _flat_bank_masks(bank_train)
        seg_gate = (scalars.seg_freeze * scalars.pose_update)[
            optim.seg_index(bank_train)]
        gate_b = (seg_gate * (1.0 - m_trans_b)
                  * ((1.0 - m_scale_b)
                     + scalars.trans_head_on * m_scale_b))
        new_train, new_pose_opt = optim.seg_adam_update_flat(
            flat_gb * gate_b, state.pose_opt, bank_train,
            scalars.seg_touch, scalars.seg_lr)
        new_bank = {"train": new_train, "static": state.pose_bank["static"]}
    else:
        new_bank, new_pose_opt = state.pose_bank, state.pose_opt

    return new_params, new_opt, new_bank, new_pose_opt


# ---------------------------------------------------------------------------
# step builders
# ---------------------------------------------------------------------------


def make_photo_loss(cfg: StepConfig, images, masks, intr_inv_all, bbox_table,
                    depths=None):
    """The photometric loss closure used by make_photo_step — exposed
    separately so perf probes (scripts/phase2_probe.py) can time
    value_and_grad(loss) in isolation from the optimizer."""

    def loss_fn(params, bank_train, state: TrainState, key, img_id,
                add_img_id, scalars):
        bank = ({"train": bank_train, "static": state.pose_bank["static"]}
                if cfg.pose_mode in ("seg", "seg_pixel") else state.pose_bank)
        k1, k2, k3 = jax.random.split(key, 3)
        pose0 = pose_of_frame(cfg, params, bank, state.pose_static, img_id)
        data = raygen.gen_random_rays(
            k1, images, masks, intr_inv_all, pose0, img_id, cfg.batch_size,
            bbox_table, cfg.mask_guided_patch_size,
            cfg.mask_guided_sampling, cfg.H, cfg.W,
            mask_guided_active=scalars.mask_guided, depths=depths)
        if cfg.maintain_shape:
            pose_a = pose_of_frame(cfg, params, bank, state.pose_static,
                                   add_img_id)
            add = raygen.gen_random_rays(
                k2, images, masks, intr_inv_all, pose_a, add_img_id,
                cfg.batch_size, bbox_table, cfg.mask_guided_patch_size,
                cfg.mask_guided_sampling, cfg.H, cfg.W,
                mask_guided_active=scalars.mask_guided, depths=depths)
            data = jnp.concatenate([data, add], axis=0)
        return _render_and_losses(cfg, k3, params, bank, state.pose_static,
                                  data, scalars)

    return loss_fn


def make_photo_step(cfg: StepConfig, images, masks, intr_inv_all, bbox_table,
                    depths=None):
    """Photometric step. Dynamic args: img_id, add_img_id, scalars."""
    loss_fn = make_photo_loss(cfg, images, masks, intr_inv_all, bbox_table,
                              depths=depths)

    def run_one(state: TrainState, scalars: StepScalars, img_id, add_img_id):
        key, sub = jax.random.split(state.key)
        bank_train = (state.pose_bank["train"]
                      if cfg.pose_mode in ("seg", "seg_pixel") else ())
        (loss, metrics), (g_params, g_bank) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, bank_train, state, sub, img_id, add_img_id, scalars)
        new_params, new_opt, new_bank, new_pose_opt = _apply_updates(
            cfg, state, g_params, g_bank, scalars)
        return TrainState(new_params, new_opt, new_bank, new_pose_opt,
                          state.pose_static, key, state.iter_step + 1), metrics

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, packed_scalars):
        scalars, img_id, add_img_id, _ = unpack_scalars(
            packed_scalars, cfg.n_segments)
        return run_one(state, scalars, img_id, add_img_id)

    step.run_one = run_one
    return step


def make_device_scalars(schedule: Dict[str, float], n_segments: int):
    """it_f -> StepScalars for the scan paths: cosine LR
    (`exp_runner.py:1049-1062`), cos-anneal ratio, constant flags — every
    per-step scalar as a pure device function of the iteration."""
    lr0 = schedule["learning_rate"]
    alpha = schedule["learning_rate_alpha"]
    warm_up = schedule["warm_up_end"]
    end_iter = schedule["end_iter"]
    anneal_end = schedule.get("anneal_end", 0.0)
    mask_guided = schedule.get("mask_guided", 1.0)
    S = n_segments

    def device_scalars(it_f):
        warm = it_f / jnp.maximum(warm_up, 1.0)
        progress = (it_f - warm_up) / jnp.maximum(end_iter - warm_up, 1.0)
        cosf = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        lr = lr0 * jnp.where(it_f < warm_up, warm, cosf)
        cos_anneal = (jnp.ones(()) if anneal_end == 0.0
                      else jnp.minimum(1.0, it_f / anneal_end))
        return StepScalars(
            lr=lr, cos_anneal=cos_anneal, main_update=jnp.ones(()),
            pose_update=jnp.ones(()), mask_guided=jnp.asarray(mask_guided),
            seg_touch=jnp.ones((S,)), seg_freeze=jnp.ones((S,)),
            seg_lr=jnp.full((S,), lr0), trans_head_on=jnp.ones(()))

    return device_scalars


def make_scan_photo_steps(cfg: StepConfig, images, masks, intr_inv_all,
                          bbox_table, schedule: Dict[str, float],
                          k_steps: int, depths=None):
    """Run k_steps photometric steps inside ONE jitted lax.scan.

    For the non-progressive phases (GT-pose NeuS, the phase-2 "gf" global
    refinement) every per-step quantity is a pure function of iter_step:
    cosine LR (`exp_runner.py:1049-1062`), cos-anneal ratio, uniform frame
    choice.  Scanning removes the per-step host dispatch, which costs more
    than the compute itself on a tunneled chip (~15 ms/step).

    schedule: learning_rate, learning_rate_alpha, warm_up_end, end_iter,
    anneal_end, mask_guided (0/1).  Frames are drawn iid-uniform from
    [0, n_images_cur) (the reference draws epoch permutations; identical
    marginal distribution).
    """
    base_step = make_photo_step(cfg, images, masks, intr_inv_all, bbox_table,
                                depths=depths)
    run_one = base_step.run_one
    device_scalars = make_device_scalars(schedule, cfg.n_segments)

    @partial(jax.jit, donate_argnums=(0,))
    def scan_steps(state: TrainState, n_images_cur):
        def body(st, _):
            it_f = st.iter_step.astype(jnp.float32)
            scalars = device_scalars(it_f)
            key_img = jax.random.fold_in(st.key, 1)
            img_id = jax.random.randint(key_img, (), 0, n_images_cur)
            st, metrics = run_one(st, scalars, img_id, jnp.zeros((), jnp.int32))
            return st, metrics
        state, metrics = jax.lax.scan(body, state, None, length=k_steps)
        mean_metrics = jax.tree_util.tree_map(
            lambda m: m.mean() if hasattr(m, "mean") else m, metrics)
        return state, mean_metrics

    return scan_steps


def make_planned_steps(cfg: StepConfig, images, masks, intr_inv_all,
                       bbox_table, k_steps: int, depths=None):
    """Run k host-PLANNED steps (mixed photo/flow) in ONE jitted dispatch.

    The progressive phase's per-step host decisions (flow coin, LoFTR
    pair draw, frame perms, per-segment gates/LRs) contain no device
    feedback between steps — device reads happen only at progressive
    events (admission / warm-up end / occ refresh), which the Runner
    places at chunk boundaries.  So the Runner can call `_plan_step` k
    times ahead, stack the packed scalar rows + flow pixel batches, and
    dispatch one lax.scan: the per-step tunnel round-trip (~10-15 ms on
    this box) and the packed-scalar H2D (~5 ms) amortize k-fold, while
    the computed sequence is exactly the per-step loop's (same host RNG
    consumption, same run_one bodies — tests/test_planned.py asserts
    state equality).

    Round-2 history: a coarser "seg-scan" that RE-DERIVED the schedule on
    device was falsified (34.2 vs 39.7 it/s) and deleted; this one keeps
    ALL planning host-side and ships it as data, so semantics cannot
    drift from the per-step loop.

    Inputs per chunk: packed_all [k, 9+3S], pixels_all [k, B/2, 4]
    (zeros on photo rows), use_flow_all [k] (0/1 f32).
    """
    photo = make_photo_step(cfg, images, masks, intr_inv_all, bbox_table,
                            depths=depths).run_one
    flow = (make_flow_step(cfg, images, masks, intr_inv_all,
                           bbox_table).run_one
            if cfg.flow_weight > 0.0 else None)

    @partial(jax.jit, donate_argnums=(0,))
    def run_chunk(state: TrainState, packed_all, pixels_all, use_flow_all):
        def body(st, row):
            packed, pixels, uf = row
            scalars, img_id, add_img_id, img_id_corr = unpack_scalars(
                packed, cfg.n_segments)
            if flow is None:
                return photo(st, scalars, img_id, add_img_id)
            return jax.lax.cond(
                uf > 0.5,
                lambda s: flow(s, scalars, img_id, img_id_corr, add_img_id,
                               pixels),
                lambda s: photo(s, scalars, img_id, add_img_id),
                st)
        state, metrics = jax.lax.scan(
            body, state, (packed_all, pixels_all, use_flow_all),
            length=k_steps)
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return state, last

    return run_chunk


def make_flow_step(cfg: StepConfig, images, masks, intr_inv_all, bbox_table):
    """Flow-pair step: half-batch match rays per frame (+maintain rays)."""

    def loss_fn(params, bank_train, state: TrainState, key, img_id,
                img_id_corr, add_img_id, pixels_xy, pixels_xy_corr, scalars):
        bank = ({"train": bank_train, "static": state.pose_bank["static"]}
                if cfg.pose_mode in ("seg", "seg_pixel") else state.pose_bank)
        k2, k3 = jax.random.split(key)
        pose_corr = pose_of_frame(cfg, params, bank, state.pose_static,
                                  img_id_corr)
        pose1 = pose_of_frame(cfg, params, bank, state.pose_static, img_id)

        ro_c, rv_c = raygen.gen_flow_rays(
            pixels_xy_corr, intr_inv_all[img_id_corr], pose_corr)
        ro_1, rv_1 = raygen.gen_flow_rays(
            pixels_xy, intr_inv_all[img_id], pose1)
        col_c = raygen.gather_rgb(
            images, img_id_corr,
            pixels_xy_corr[:, 1].astype(jnp.int32),
            pixels_xy_corr[:, 0].astype(jnp.int32))
        col_1 = raygen.gather_rgb(
            images, img_id,
            pixels_xy[:, 1].astype(jnp.int32),
            pixels_xy[:, 0].astype(jnp.int32))
        ones = jnp.ones((pixels_xy.shape[0], 1))
        data = jnp.concatenate([
            jnp.concatenate([ro_c, rv_c, col_c, ones], axis=-1),
            jnp.concatenate([ro_1, rv_1, col_1, ones], axis=-1),
        ], axis=0)
        if cfg.maintain_shape:
            pose_a = pose_of_frame(cfg, params, bank, state.pose_static,
                                   add_img_id)
            add = raygen.gen_random_rays(
                k2, images, masks, intr_inv_all, pose_a, add_img_id,
                cfg.batch_size, bbox_table, cfg.mask_guided_patch_size,
                cfg.mask_guided_sampling, cfg.H, cfg.W,
                mask_guided_active=scalars.mask_guided)
            data = jnp.concatenate([data, add], axis=0)
        K0 = intr_inv_all_K(intr_inv_all, img_id_corr)
        K1 = intr_inv_all_K(intr_inv_all, img_id)
        flow_ctx = (img_id, img_id_corr, pixels_xy, pixels_xy_corr, K0, K1)
        return _render_and_losses(cfg, k3, params, bank, state.pose_static,
                                  data, scalars, flow_ctx=flow_ctx)

    def run_one(state: TrainState, scalars: StepScalars, img_id, img_id_corr,
                add_img_id, pixels_pair):
        pixels_xy_corr = pixels_pair[:, 0:2]
        pixels_xy = pixels_pair[:, 2:4]
        key, sub = jax.random.split(state.key)
        bank_train = (state.pose_bank["train"]
                      if cfg.pose_mode in ("seg", "seg_pixel") else ())
        (loss, metrics), (g_params, g_bank) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, bank_train, state, sub, img_id, img_id_corr,
            add_img_id, pixels_xy, pixels_xy_corr, scalars)
        new_params, new_opt, new_bank, new_pose_opt = _apply_updates(
            cfg, state, g_params, g_bank, scalars)
        return TrainState(new_params, new_opt, new_bank, new_pose_opt,
                          state.pose_static, key, state.iter_step + 1), metrics

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, packed_scalars, pixels_pair):
        scalars, img_id, add_img_id, img_id_corr = unpack_scalars(
            packed_scalars, cfg.n_segments)
        return run_one(state, scalars, img_id, img_id_corr, add_img_id,
                       pixels_pair)

    step.run_one = run_one
    return step


def intr_inv_all_K(intr_inv_all, idx):
    """Recover K from the stored inverse intrinsics (cheap 3x3 inverse)."""
    return jnp.linalg.inv(intr_inv_all[idx][:3, :3])
