"""End-to-end smoke tests: tiny synthetic sequence through the Runner.

Mirrors the reference's minimum slice (GT-pose NeuS, SURVEY §7) plus a
short progressive virtual-camera run exercising the seg pose bank, flow
loss, admission scheduling, and lazy segment init.
"""

import os

import numpy as np
import pytest

from fmov_pose_tpu.data.synthetic import make_orbit_sequence
from fmov_pose_tpu.train.runner import Runner

GT_CONF = """
general {{
    base_exp_dir = {exp_dir}
    recording = [ ./ ]
}}
dataset {{
    data_dir = {data_dir}/
    render_cameras_name = cameras_sphere.npz
    object_cameras_name = cameras_sphere.npz
}}
train {{
    learning_rate = 5e-4
    learning_rate_alpha = 0.05
    end_iter = {end_iter}
    batch_size = {batch}
    validate_resolution_level = 4
    warm_up_end = 20
    anneal_end = 0
    use_white_bkgd = False
    save_freq = 100000
    val_freq = 1000000
    val_mesh_freq = 1000000
    report_freq = 50
    igr_weight = 0.1
    mask_weight = 0.1
}}
model {{
    nerf {{ D = 4, d_in = 4, d_in_view = 3, W = 64, multires = 4,
           multires_view = 2, output_ch = 4, skips=[2], use_viewdirs=True }}
    sdf_network {{ d_out = 65, d_in = 3, d_hidden = 64, n_layers = 4,
                  skip_in = [2], multires = 4, bias = 0.5, scale = 1.0,
                  geometric_init = True, weight_norm = True }}
    variance_network {{ init_val = 0.3 }}
    rendering_network {{ d_feature = 64, mode = idr, d_in = 9, d_out = 3,
                        d_hidden = 64, n_layers = 2, weight_norm = True,
                        multires_view = 2, squeeze_out = True }}
    neus_renderer {{ n_samples = 16, n_importance = 0, n_outside = 0,
                    up_sample_steps = 1, perturb = 1.0 }}
}}
"""

VIRTUAL_CONF = """
general {{
    base_exp_dir = {exp_dir}
    recording = [ ./ ]
}}
dataset {{
    data_dir = {data_dir}/
    render_cameras_name = cameras_sphere.npz
    object_cameras_name = cameras_sphere.npz
    loftr_interval_flow_dir = {flow_dir}
    crop = True
    partial_ann = True
    mask_init = True
}}
train {{
    learning_rate = 5e-4
    learning_rate_alpha = 0.05
    end_iter = {end_iter}
    batch_size = {batch}
    validate_resolution_level = 4
    warm_up_end = 10
    anneal_end = 0
    use_white_bkgd = False
    save_freq = 1000000
    val_freq = 1000000
    val_mesh_freq = 1000000
    report_freq = 20
    pose_freq = 1000000
    igr_weight = 0.1
    mask_weight = 5
    flow_weight = 0.1
    progressive = True
    flow_interval = 3
    pose_lr = 5e-4
    pose_alpha = 0.5
    max_pro_iteration = 15
    pro_warm_up_end = 8
    image_interval = 1
    current_image = 1
    mesh_warmup_step = 10
    emphasize_rot = True
    mask_guided_sampling = True
    mask_guided_patch_size = 5
    reset_based_on_rot = False
    maintain_shape = True
}}
model {{
    pose_type = seg
    barf = True
    nerf {{ D = 4, d_in = 4, d_in_view = 3, W = 64, multires = 4,
           multires_view = 2, output_ch = 4, skips=[2], use_viewdirs=True }}
    sdf_network {{ d_out = 65, d_in = 3, d_hidden = 64, n_layers = 4,
                  skip_in = [2], multires = 4, bias = 0.5, scale = 1.0,
                  geometric_init = True, weight_norm = True }}
    variance_network {{ init_val = 0.3 }}
    rendering_network {{ d_feature = 64, mode = idr, d_in = 9, d_out = 3,
                        d_hidden = 64, n_layers = 2, weight_norm = True,
                        multires_view = 2, squeeze_out = True }}
    neus_renderer {{ n_samples = 12, n_importance = 0, n_outside = 0,
                    up_sample_steps = 1, perturb = 1.0 }}
}}
"""


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    make_orbit_sequence(str(root / "SYN_ori"), n_frames=5, H=48, W=48,
                        span_deg=40)
    return root


def _write_conf(path, template, **kw):
    with open(path, "w") as f:
        f.write(template.format(**kw))
    return str(path)


class Hook:
    losses = None


def test_gt_pose_neus_learns(data_root, tmp_path):
    conf_path = _write_conf(
        tmp_path / "gt.conf", GT_CONF,
        exp_dir=str(tmp_path / "exp"), data_dir=str(data_root / "SYN_ori"),
        end_iter=120, batch=96)
    runner = Runner(conf_path, mode="train", case="SYN_ori",
                    has_global_conf=True)
    losses = []
    orig = runner.photo_step

    def wrapped(*a, **k):
        st, m = orig(*a, **k)
        losses.append(float(m["loss"]))
        return st, m

    runner.photo_step = wrapped
    runner.train()
    assert runner.iter_step == 120
    early = np.mean(losses[:15])
    late = np.mean(losses[-15:])
    assert late < early, f"no learning: {early} -> {late}"
    assert np.isfinite(losses).all()

    # checkpoint roundtrip
    runner.save_checkpoint()
    runner2 = Runner(conf_path, mode="train", case="SYN_ori",
                     has_global_conf=True, is_continue=True)
    assert runner2.iter_step == 120

    # mesh extraction produces a sphere-ish surface
    mesh_path = runner.validate_mesh(resolution=32)
    from fmov_pose_tpu.pipeline.meshio import read_ply
    verts, tris = read_ply(mesh_path)
    assert len(verts) > 50
    radii = np.linalg.norm(verts, axis=-1)
    assert radii.mean() < 0.9  # inside unit sphere


def test_progressive_virtual_training(data_root, tmp_path):
    flow_dir = str(data_root / "matches")
    conf_path = _write_conf(
        tmp_path / "virt.conf", VIRTUAL_CONF,
        exp_dir=str(tmp_path / "exp_virt"),
        data_dir=str(data_root / "SYN_ori"), flow_dir=flow_dir,
        end_iter=100, batch=64)
    runner = Runner(conf_path, mode="train", case="SYN_ori",
                    has_global_conf=True)
    assert runner.pose_mode == "seg"
    assert runner.n_segments == 5
    runner.train()
    # progressive admission: mesh_warmup 10 + 5 frames x 15 iters
    assert runner.current_image == 5
    assert runner.pro_iteration == -1  # all frames admitted -> early return
    assert runner.current_pose_mlp_index == 4
    # later segments got lazily initialized
    assert bool(runner.state.pose_bank["static"]["initialized"].all())
    # all poses are finite and orthonormal-ish
    poses = runner.query_poses(5)
    assert np.isfinite(poses).all()
    for p in poses:
        RtR = p[:3, :3].T @ p[:3, :3]
        np.testing.assert_allclose(RtR, np.eye(3), atol=1e-3)
    # validate_poses computes ATE against synthetic GT
    ate, rpe_t, rpe_r, gt, est = runner.validate_poses()
    assert np.isfinite(ate)


def test_matmul_precision_knob(data_root, tmp_path):
    """train.matmul_precision sets the global contraction precision
    (the short-schedule quality dial, HEADTOHEAD.md precision ablation);
    absent key leaves the process-global config untouched."""
    import jax

    def build(extra):
        conf_path = _write_conf(
            tmp_path / f"prec{len(extra)}.conf",
            GT_CONF.replace("train {{", "train {{\n    " + extra, 1)
            if extra else GT_CONF,
            exp_dir=str(tmp_path / "exp_prec"),
            data_dir=str(data_root / "SYN_ori"),
            end_iter=10, batch=16)
        return Runner(conf_path, mode="train", case="SYN_ori",
                      has_global_conf=True)

    before = jax.config.jax_default_matmul_precision
    try:
        build("")  # no key: untouched
        assert jax.config.jax_default_matmul_precision == before
        build("matmul_precision = highest")
        assert jax.config.jax_default_matmul_precision == "highest"
        with pytest.raises(ValueError, match="matmul_precision"):
            build("matmul_precision = fp8")
    finally:
        jax.config.update("jax_default_matmul_precision", before)
