"""Seg-mode scan training: the chunked-dispatch progressive path must be
numerically equivalent to the per-step dispatch path.

Both paths share the host planner (`Runner._plan_step`) and the device
step (`step.make_photo_step/make_flow_step.run_one`); the scan merely
replays planned rows inside `lax.scan`.  With identical seeds, the final
parameters, pose bank, and scheduler counters must match up to XLA
fusion-level float noise.
"""

import numpy as np
import pytest

from fmov_pose_tpu.data.synthetic import make_orbit_sequence
from fmov_pose_tpu.train.runner import Runner

from test_train_e2e import VIRTUAL_CONF, _write_conf


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("segscan")
    make_orbit_sequence(str(root / "SYN_ori"), n_frames=4, H=40, W=40,
                        span_deg=36)
    return root


def _run(data_root, tmp_path, tag, scan_steps):
    conf = VIRTUAL_CONF.format(
        exp_dir=str(tmp_path / f"exp_{tag}"),
        data_dir=str(data_root / "SYN_ori"),
        flow_dir=str(data_root / "matches"),
        end_iter=80, batch=64)
    # single-device comparison: the conftest's 8 virtual CPU devices would
    # auto-enable DP, which (correctly) disables the seg scan path
    conf = conf.replace("mask_guided_sampling = True",
                        "mask_guided_sampling = True\n"
                        "    data_parallel = False\n"
                        f"    seg_scan_steps = {scan_steps}")
    path = _write_conf(tmp_path / f"{tag}.conf", "{c}", c=conf)
    runner = Runner(path, mode="train", case="SYN_ori",
                    has_global_conf=True)
    runner.train()
    return runner


def test_scan_matches_per_step(data_root, tmp_path):
    r_loop = _run(data_root, tmp_path, "loop", "False")
    r_scan = _run(data_root, tmp_path, "scan", "True")

    # the scan path actually engaged (compiled at least one scan fn)
    assert getattr(r_scan, "_seg_scan_fns", {})
    assert not hasattr(r_loop, "_seg_scan_fns")

    # identical curriculum trajectory
    assert r_scan.iter_step == r_loop.iter_step
    assert r_scan.current_image == r_loop.current_image
    assert r_scan.pro_iteration == r_loop.pro_iteration
    assert r_scan.current_pose_mlp_index == r_loop.current_pose_mlp_index
    np.testing.assert_array_equal(r_scan.seg_frozen, r_loop.seg_frozen)

    # identical learned state up to XLA fusion float noise
    import jax
    leaves_a = jax.tree_util.tree_leaves(r_loop.state.params)
    leaves_b = jax.tree_util.tree_leaves(r_scan.state.params)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)

    poses_a = r_loop.query_poses(r_loop.current_image)
    poses_b = r_scan.query_poses(r_scan.current_image)
    np.testing.assert_allclose(poses_a, poses_b, atol=5e-4)
