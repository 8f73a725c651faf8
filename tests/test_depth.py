"""Depth supervision (working implementation of the reference's latent
mono-depth extension, `exp_runner.py:698-712` / `dataset.py:518-523`)."""

import os

import numpy as np
import pytest

from fmov_pose_tpu.data.synthetic import make_orbit_sequence
from fmov_pose_tpu.train.runner import Runner

CONF = """
general {{ base_exp_dir = {exp_dir}
          recording = [ ./ ] }}
dataset {{ data_dir = {data_dir}/
          render_cameras_name = cameras_sphere.npz
          object_cameras_name = cameras_sphere.npz }}
train {{ learning_rate = 5e-4
        learning_rate_alpha = 0.05
        end_iter = 60
        batch_size = 64
        validate_resolution_level = 4
        warm_up_end = 10
        anneal_end = 0
        use_white_bkgd = False
        save_freq = 1000000
        val_freq = 1000000
        val_mesh_freq = 1000000
        report_freq = 20
        scan_steps = False
        igr_weight = 0.1
        mask_weight = 0.5
        depth_weight = 0.5 }}
model {{
    nerf {{ D = 2, d_in = 4, d_in_view = 3, W = 32, multires = 2,
           multires_view = 2, output_ch = 4, skips=[1], use_viewdirs=True }}
    sdf_network {{ d_out = 33, d_in = 3, d_hidden = 32, n_layers = 4,
                  skip_in = [2], multires = 4, bias = 0.5, scale = 1.0,
                  geometric_init = True, weight_norm = True }}
    variance_network {{ init_val = 0.3 }}
    rendering_network {{ d_feature = 32, mode = idr, d_in = 9, d_out = 3,
                        d_hidden = 32, n_layers = 2, weight_norm = True,
                        multires_view = 2, squeeze_out = True }}
    neus_renderer {{ n_samples = 12, n_importance = 0, n_outside = 0,
                    up_sample_steps = 1, perturb = 1.0 }}
}}
"""


def test_depth_supervised_training(tmp_path):
    data_dir = tmp_path / "SYN"
    gt = make_orbit_sequence(str(data_dir), n_frames=4, H=48, W=48,
                             span_deg=40, with_matches=False, with_crop=False)
    os.makedirs(data_dir / "depth", exist_ok=True)
    for i, (_rgb, _mask, depth) in enumerate(gt["frames"]):
        np.save(str(data_dir / "depth" / f"{i:04d}.npy"), depth)

    conf_path = tmp_path / "gt.conf"
    conf_path.write_text(CONF.format(exp_dir=str(tmp_path / "exp"),
                                     data_dir=str(data_dir)))
    runner = Runner(str(conf_path), mode="train", case="SYN",
                    has_global_conf=True)
    assert runner.depths_dev is not None
    assert runner.step_cfg.depth_weight == 0.5

    depth_losses = []
    orig = runner.photo_step

    def wrapped(*a, **k):
        st, m = orig(*a, **k)
        depth_losses.append(float(m["depth_loss"]))
        return st, m

    runner.photo_step = wrapped
    runner.train()
    assert len(depth_losses) == 60
    assert all(np.isfinite(depth_losses))
    assert max(depth_losses) > 0  # the loss is actually active
    # not diverging (60 iters is too short/noisy for a strict decrease)
    assert np.mean(depth_losses[-15:]) < 2.0 * np.mean(depth_losses[:15])


def test_no_depth_dir_is_fine(tmp_path):
    data_dir = tmp_path / "SYN2"
    make_orbit_sequence(str(data_dir), n_frames=3, H=32, W=32,
                        span_deg=30, with_matches=False, with_crop=False)
    conf_path = tmp_path / "gt.conf"
    conf_path.write_text(CONF.format(exp_dir=str(tmp_path / "exp2"),
                                     data_dir=str(data_dir)))
    runner = Runner(str(conf_path), mode="train", case="SYN2",
                    has_global_conf=True)
    # depth requested but no depth/ dir -> gracefully disabled
    assert runner.depths_dev is None
    assert runner.step_cfg.depth_weight == 0.0
