import numpy as np
import pytest

from fmov_pose_tpu.data import hocon
from fmov_pose_tpu.data.dataset import Dataset
from fmov_pose_tpu.data.synthetic import make_orbit_sequence


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    out = root / "SYN_ori"
    make_orbit_sequence(str(out), n_frames=6, H=64, W=64)
    return str(out)


def _conf(seq_dir, **extra):
    lines = [f"data_dir = {seq_dir}/",
             "render_cameras_name = cameras_sphere.npz",
             "object_cameras_name = cameras_sphere.npz"]
    for k, v in extra.items():
        lines.append(f"{k} = {v}")
    return hocon.parse_string("d {\n" + "\n".join(lines) + "\n}")["d"]


def test_full_annotation_load(seq_dir):
    ds = Dataset(_conf(seq_dir))
    assert ds.n_images == 6
    assert ds.images_np.shape == (6, 64, 64, 3)
    assert ds.gt_poses.shape == (6, 4, 4)
    # c2w orthonormal
    R = ds.gt_poses[0][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    # camera looks at origin from dist ~2.5
    np.testing.assert_allclose(np.linalg.norm(ds.gt_poses[:, :3, 3], axis=-1),
                               2.5, atol=0.05)


def test_decomposition_roundtrip(seq_dir):
    """P = K [R|t] decomposition must recover the synthetic GT camera."""
    from fmov_pose_tpu.data.synthetic import make_orbit_sequence as mk
    ds = Dataset(_conf(seq_dir))
    K = ds.intrinsics_all[0][:3, :3]
    assert abs(K[0, 2] - 32.0) < 1.0  # principal point W/2
    assert K[0, 0] > 10


def test_partial_ann_load(seq_dir):
    ds = Dataset(_conf(seq_dir, partial_ann="True", mask_init="True",
                       crop="True"))
    assert len(ds.avai_ann_frame) == 6
    assert ds.max_mask_pose is not None
    # mask-init pose looks down +z from negative z
    assert ds.max_mask_pose[2, 3] < 0
    assert ds.crop_transforms is not None


def test_loftr_matches_load(seq_dir):
    import os
    flow_dir = os.path.join(os.path.dirname(seq_dir.rstrip("/")), "matches")
    ds = Dataset(_conf(seq_dir, partial_ann="True", crop="True",
                       loftr_interval_flow_dir=flow_dir))
    assert len(ds.flow_pairs) > 0
    name0, name1 = "0000", "0001"
    assert name1 in ds.flow_pairs[name0]
    xs1, ys1, xs2, ys2 = ds.loftr_flows[f"{name0}_{name1}"]
    assert len(xs1) > 50
    # matches live inside the masks
    m = ds.masks_np[0][..., 0]
    assert (m[ys1.astype(int), xs1.astype(int)] > 0.5).all()
    # reversed direction pair exists
    assert f"{name1}_{name0}" in ds.loftr_flows


def test_mask_bboxes(seq_dir):
    ds = Dataset(_conf(seq_dir))
    y0, y1, x0, x1 = ds.mask_bboxes[0]
    assert 0 <= y0 < y1 <= 64 and 0 <= x0 < x1 <= 64
    # sphere projects near the center
    assert 10 < (y0 + y1) / 2 < 54


def test_wo_mask_blacks_background(seq_dir, tmp_path):
    ds = Dataset(_conf(seq_dir, wo_mask="True"))
    outside = ds.masks_np[0] < 0.5
    assert np.abs(ds.images_np[0][outside[..., 0]]).max() == 0.0


def test_synthetic_matches_are_consistent(seq_dir):
    """Analytic matches should reproject with ~0 error under GT poses."""
    import os
    flow_dir = os.path.join(os.path.dirname(seq_dir.rstrip("/")), "matches")
    ds = Dataset(_conf(seq_dir, partial_ann="True", crop="True",
                       loftr_interval_flow_dir=flow_dir))
    xs1, ys1, xs2, ys2 = ds.loftr_flows["0000_0001"]
    assert np.hypot(xs1 - xs2, ys1 - ys2).mean() < 30  # small motion


def test_incomplete_noise_init_raises(seq_dir, tmp_path):
    """Phase-2 crop init must fail loudly when the noise npz covers fewer
    frames than the image dir (incomplete phase-1 alignment export)."""
    import os
    import shutil

    dst = tmp_path / "SYN_partial"
    shutil.copytree(seq_dir, dst)
    np.savez(dst / "noise_cameras_sphere.npz",
             world_mat_0=np.eye(4, dtype=np.float32),
             scale_mat_0=np.eye(4, dtype=np.float32))
    conf = _conf(str(dst), use_crop_init="True")
    with pytest.raises(ValueError, match="covers 1 frames"):
        Dataset(conf, exp_dir=str(dst))


def test_ml_camera_intrinsics_branch(seq_dir, tmp_path):
    """ML layout: fixed K from a camera.txt, identity poses, no ann
    (`models/dataset.py:215-233`, confs/ml_virtual.conf)."""
    ds0 = Dataset(_conf(seq_dir))
    K = np.asarray(ds0.intrinsics_all[0][:3, :3])
    cam_txt = tmp_path / "camera.txt"
    with open(cam_txt, "w") as f:
        for row in K:
            f.write(" ".join(str(v) for v in row) + "\n")
    ds = Dataset(_conf(seq_dir, ml_camera_intrinsics=str(cam_txt),
                       partial_ann="True", mask_init="True", crop="True"))
    assert ds.n_images == 6
    np.testing.assert_allclose(
        np.asarray(ds.intrinsics_all[0][:3, :3]), K, rtol=1e-6)
    # all frames share the txt intrinsics; poses start at identity
    np.testing.assert_allclose(ds.intrinsics_all[0], ds.intrinsics_all[-1])
    np.testing.assert_allclose(
        np.asarray(ds.scale_mats_np[0]), np.eye(4), atol=0)
    inv = ds.intrinsics_all_inv[0]
    np.testing.assert_allclose(inv @ ds.intrinsics_all[0], np.eye(4),
                               atol=1e-5)


def test_unknown_camera_branch(seq_dir, tmp_path):
    """unknown_camera: K.npy in the data dir, identity poses
    (`models/dataset.py:234-248`)."""
    import os
    import shutil
    ddir = tmp_path / "SYNU_ori"
    shutil.copytree(seq_dir, ddir)
    os.remove(ddir / "cameras_sphere.npz")
    ds0 = Dataset(_conf(seq_dir))
    K = np.asarray(ds0.intrinsics_all[0][:3, :3])
    np.save(ddir / "K.npy", K)
    ds = Dataset(_conf(str(ddir), unknown_camera="True"))
    assert ds.n_images == 6
    np.testing.assert_allclose(
        np.asarray(ds.intrinsics_all[0][:3, :3]), K, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ds.scale_mats_np[-1]), np.eye(4), atol=0)


def test_u8_device_transfer_is_bitwise_exact(seq_dir):
    """runner._init_device_buffers ships images/masks as uint8 and
    expands on device; k/256 PNG data must round-trip exactly."""
    ds = Dataset(_conf(seq_dir, wo_mask="True"))
    for arr in (ds.images_np, ds.masks_np):
        u8 = np.round(arr * 256.0).astype(np.uint8)
        back = u8.astype(np.float32) / 256.0
        assert np.array_equal(back, arr)
