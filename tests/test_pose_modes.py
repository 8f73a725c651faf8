"""Training-step smoke tests for every pose mode (gf / se3 / seg_pixel).

The seg and fixed modes are covered by the e2e tests; these exercise the
remaining pose models through real jitted steps on tiny shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmov_pose_tpu.fields import nets
from fmov_pose_tpu.poses import picture_pose as pp
from fmov_pose_tpu.poses import pixel_pose as px
from fmov_pose_tpu.render import neus
from fmov_pose_tpu.train import optim, step as step_mod

TINY_SDF = {"d_out": 33, "d_in": 3, "d_hidden": 32, "n_layers": 4,
            "skip_in": (2,), "multires": 4, "bias": 0.5, "scale": 1.0,
            "geometric_init": True, "weight_norm": True}
TINY_COLOR = {"d_feature": 32, "mode": "idr", "d_in": 9, "d_out": 3,
              "d_hidden": 32, "n_layers": 2, "weight_norm": True,
              "multires_view": 2, "squeeze_out": True}
TINY_NERF = {"D": 2, "d_in": 4, "d_in_view": 3, "W": 32, "multires": 2,
             "multires_view": 2, "output_ch": 4, "skips": (1,),
             "use_viewdirs": True}

N_IMAGES, H, W = 4, 24, 24


def build_state(pose_mode, pose_cfg=pp.PoseCfg()):
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "sdf": nets.init_sdf(k1, TINY_SDF),
        "color": nets.init_color(k2, TINY_COLOR),
        "nerf": nets.init_nerf(k3, TINY_NERF),
        "variance": nets.init_variance({"init_val": 0.3}),
    }
    init_pose = np.eye(4, dtype=np.float32)
    init_pose[2, 3] = -2.0
    noise = np.repeat(init_pose[None], N_IMAGES, 0)
    pose_bank, pose_opt, pose_static = {}, (), {}
    n_seg = 1
    deep_cfg = None
    if pose_mode == "gf":
        gf = pp.init_gf(0, pose_cfg, noise)
        params["pose"] = gf["train"]
        pose_static = gf["static"]
    elif pose_mode == "se3":
        params["se3_refine"] = jnp.zeros((N_IMAGES, 6))
        pose_static = {"noise_poses": jnp.asarray(noise)}
    elif pose_mode == "seg_pixel":
        deep_cfg = px.DeepPoseCfg(n_images=N_IMAGES, D=3, W=32,
                                  skips=(1,), x_multires=2, t_multires=2)
        pose_bank = px.init_seg_deep_bank(0, deep_cfg, N_IMAGES, 2, init_pose)
        n_seg = pp.num_segments(N_IMAGES, 2)
        pose_opt = optim.seg_adam_init(pose_bank["train"], n_seg)

    model_cfg = {"sdf": TINY_SDF, "color": TINY_COLOR, "nerf": TINY_NERF,
                 "renderer": neus.RenderCfg(8, 0, 0, 1, 1.0)}
    cfg = step_mod.make_step_config(
        model_cfg, batch_size=16, H=H, W=W, n_segments=n_seg,
        segment_img_num=2, pose_mode=pose_mode, pose_cfg=pose_cfg,
        deep_pose_cfg=deep_cfg, igr_weight=0.1, mask_weight=1.0,
        flow_weight=0.1)
    state = step_mod.TrainState(
        params=params, opt=optim.adam_init(params), pose_bank=pose_bank,
        pose_opt=pose_opt, pose_static=pose_static,
        key=jax.random.key(1), iter_step=jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((3, N_IMAGES, H, W)), jnp.float32)
    masks = jnp.asarray((rng.random((N_IMAGES, H, W)) > 0.4), jnp.float32)
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 30.0
    intr[0, 2] = intr[1, 2] = 12.0
    intr_inv = jnp.asarray(np.linalg.inv(intr)[None].repeat(N_IMAGES, 0))
    bbox = jnp.asarray(np.tile([2, 22, 2, 22], (N_IMAGES, 1)), jnp.int32)
    return cfg, state, (images, masks, intr_inv, bbox), n_seg


def packed(n_seg):
    return jnp.asarray(step_mod.pack_scalars_np(
        5e-4, 1.0, 1.0, 1.0, 0.0, 1.0, 1, 0, 0,
        np.ones(n_seg), np.ones(n_seg), np.full(n_seg, 5e-4)))


@pytest.mark.parametrize("mode", ["gf", "se3", "seg_pixel"])
def test_photo_step_runs_and_updates_pose(mode):
    pose_cfg = pp.PoseCfg(emphasize_rot=(mode == "gf"))
    cfg, state, bufs, n_seg = build_state(mode, pose_cfg)
    step = step_mod.make_photo_step(cfg, *bufs)
    p0 = step_mod.pose_of_frame(cfg, state.params, state.pose_bank,
                                state.pose_static, jnp.asarray(1))
    for _ in range(3):
        state, metrics = step(state, packed(n_seg))
    assert np.isfinite(float(metrics["loss"]))
    p1 = step_mod.pose_of_frame(cfg, state.params, state.pose_bank,
                                state.pose_static, jnp.asarray(1))
    # pose parameters moved (photometric + mask gradients flow into poses)
    assert not np.allclose(np.asarray(p0), np.asarray(p1), atol=1e-7)
    # rotations stay orthonormal
    R = np.asarray(p1)[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


@pytest.mark.parametrize("mode", ["gf", "se3"])
def test_flow_step_runs(mode):
    cfg, state, bufs, n_seg = build_state(mode)
    step = step_mod.make_flow_step(cfg, *bufs)
    rng = np.random.default_rng(1)
    pix = jnp.asarray(rng.integers(2, 22, size=(8, 4)).astype(np.float32))
    state, metrics = step(state, packed(n_seg), pix)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["flow_loss"]) >= 0


def test_se3_only_rotation():
    cfg, state, bufs, n_seg = build_state("se3")
    cfg.only_rotation = True
    wu = jnp.asarray(np.random.default_rng(2).normal(size=(N_IMAGES, 6)) * 0.1)
    state = state._replace(params=dict(state.params, se3_refine=wu))
    pose = step_mod.pose_of_frame(cfg, state.params, state.pose_bank,
                                  state.pose_static, jnp.asarray(0))
    # translation delta suppressed: t stays the noise pose translation
    np.testing.assert_allclose(np.asarray(pose)[:, 3],
                               np.asarray(state.pose_static["noise_poses"])[0, :3, 3],
                               atol=1e-5)


def test_deep_pixel_pose_per_pixel():
    """DeepPixelPose also supports per-pixel conditioning (disable_pts off,
    `pixel_pose.py:72-123`)."""
    cfg = px.DeepPoseCfg(n_images=4, D=3, W=32, skips=(1,), x_multires=2,
                         t_multires=2, disable_pts=False)
    params = px.init_deep_pose(0, cfg, np.eye(4, dtype=np.float32))
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3)), jnp.float32)
    poses = px.deep_pose_apply(params, cfg, 2, input_pts=pts)
    assert poses.shape == (7, 3, 4)
    R = np.asarray(poses)[0, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_deep_pose_cam_encodings():
    for enc in ("position", "fourier", "original_fourier", "embedding"):
        cfg = px.DeepPoseCfg(n_images=4, D=3, W=32, skips=(1,),
                             x_multires=2, t_multires=2,
                             cam_id_encoding=enc)
        params = px.init_deep_pose(0, cfg, np.eye(4, dtype=np.float32))
        pose = px.deep_pose_apply(params, cfg, 1)
        assert pose.shape == (3, 4)
        assert np.isfinite(np.asarray(pose)).all()


def test_deep_pose_output_inits():
    for init in ("zero", "small_weight", "direct"):
        cfg = px.DeepPoseCfg(n_images=4, D=3, W=32, skips=(1,),
                             x_multires=2, t_multires=2, output_init=init)
        init_pose = np.eye(4, dtype=np.float32)
        init_pose[:3, 3] = [0.1, 0.2, -2.0]
        params = px.init_deep_pose(0, cfg, init_pose)
        pose = np.asarray(px.deep_pose_apply(params, cfg, 0))
        assert np.isfinite(pose).all()
        if init == "zero":
            # identity delta composed with init
            np.testing.assert_allclose(pose, init_pose[:3], atol=1e-5)
