"""Pipeline tools: preprocessing, normalization, alignment, texture, IO."""

import os

import numpy as np
import pytest

from fmov_pose_tpu.data.synthetic import (SPHERE_RADIUS, make_orbit_sequence,
                                          render_sphere_frame, look_at_pose)
from fmov_pose_tpu.pipeline import chamfer, meshio
from fmov_pose_tpu.pipeline.preprocess import (get_crop_M, get_crop_M_ori,
                                               preprocess_sequence,
                                               solve_pose_by_pnp)


@pytest.fixture(scope="module")
def seq_with_depth(tmp_path_factory):
    """Synthetic raw sequence incl. depth/ for virtual-cam preprocessing."""
    import cv2 as cv
    root = tmp_path_factory.mktemp("raw")
    out = root / "SEQ"
    gt = make_orbit_sequence(str(out), n_frames=4, H=64, W=64, span_deg=30,
                             with_matches=False, with_crop=False)
    os.makedirs(out / "depth", exist_ok=True)
    for i, (rgb, mask, depth) in enumerate(gt["frames"]):
        np.save(str(out / "depth" / f"{i:04d}.npy"), depth)
    return str(out), gt


def test_crop_matrices():
    mask = np.zeros((64, 64), np.uint8)
    mask[10:30, 40:60] = 255
    M = get_crop_M_ori(mask)
    # centroid (49.5, 19.5) should map to the center (32, 32)
    c = M @ np.array([49.5, 19.5, 1.0])
    np.testing.assert_allclose(c[:2], [32, 32], atol=0.6)
    M2 = get_crop_M(mask, 480, 480, 5)
    assert M2[0, 0] == M2[1, 1] and M2[0, 0] > 1  # upscaling small object
    c2 = M2 @ np.array([49.5, 19.5, 1.0])
    np.testing.assert_allclose(c2[:2], [240, 240], atol=2 * M2[0, 0])


def test_pnp_recovers_pose():
    rng = np.random.default_rng(0)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    c2w = look_at_pose([1.0, 0.5, -2.0])
    w2c = np.linalg.inv(c2w)
    pts3d = rng.normal(size=(100, 3)) * 0.3
    cam = pts3d @ w2c[:3, :3].T + w2c[:3, 3]
    pix = cam @ K.T
    pix = pix[:, :2] / pix[:, 2:]
    R, t, ok = solve_pose_by_pnp(pix, pts3d, K)
    assert ok
    np.testing.assert_allclose(R, w2c[:3, :3], atol=1e-3)
    np.testing.assert_allclose(t, w2c[:3, 3], atol=1e-3)


def test_preprocess_sequence_ori(seq_with_depth):
    seq_dir, gt = seq_with_depth
    new_dir, errs = preprocess_sequence(seq_dir, ori=True, has_gt=True)
    assert new_dir.endswith("_ori")
    assert os.path.exists(os.path.join(new_dir, "cameras_sphere.npz"))
    assert os.path.exists(os.path.join(new_dir, "transform_matrixs.npy"))
    assert len(os.listdir(os.path.join(new_dir, "image"))) == 4
    # PnP reprojection quality gate: sub-pixel on clean synthetic data
    assert len(errs) == 4
    assert np.mean(errs) < 2.0
    # virtual poses keep the object in the unit sphere: decode one pose
    cams = np.load(os.path.join(new_dir, "cameras_sphere.npz"))
    assert "world_mat_0000" in cams.files


def test_meshio_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(50, 3)).astype(np.float32)
    faces = rng.integers(0, 50, size=(30, 3)).astype(np.int32)
    colors = rng.random((50, 3)).astype(np.float32)
    p = str(tmp_path / "m.ply")
    meshio.write_ply(p, verts, faces, vertex_colors=colors)
    v2, f2 = meshio.read_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    # ascii variant
    p2 = str(tmp_path / "m_ascii.ply")
    meshio.write_ply(p2, verts, faces, binary=False)
    v3, f3 = meshio.read_ply(p2)
    np.testing.assert_allclose(v3, verts, atol=1e-4)
    # obj with uvs
    uvs = rng.random((30, 3, 2))
    meshio.write_obj(str(tmp_path / "m.obj"), verts, faces,
                     uvs=uvs.reshape(-1, 2), texture_png="tex.png")
    assert os.path.exists(tmp_path / "m.mtl")


def test_chamfer_metric():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 3))
    cd, ab, ba = chamfer.chamfer_distance(a, a)
    assert cd < 1e-6
    b = a + np.array([0.1, 0, 0])
    cd2, _, _ = chamfer.chamfer_distance(a, b)
    assert 0 < cd2 <= 0.2 + 1e-6


def test_sample_mesh_surface():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [10, 10, 10],
                      [11, 10, 10], [10, 11, 10]], np.float64)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    pts = chamfer.sample_mesh_surface(verts, faces, 1000)
    assert pts.shape == (1000, 3)
    near_origin = (np.linalg.norm(pts, axis=-1) < 2).mean()
    assert 0.3 < near_origin < 0.7  # equal-area triangles -> ~50/50


def test_norm_matrix_on_synthetic(tmp_path):
    """get_normalization recovers an origin-centered unit-ish scale for the
    synthetic sphere (object at origin, radius 0.5)."""
    from fmov_pose_tpu.pipeline.norm import get_normalization
    out = tmp_path / "SEQ"
    gt = make_orbit_sequence(str(out), n_frames=8, H=64, W=64, span_deg=120,
                             with_matches=False, with_crop=False)
    # rewrite cameras with integer keys and NO scale (what norm expects)
    cams = {}
    K = gt["K"]
    for i, pose in enumerate(gt["poses"]):
        w2c = np.linalg.inv(pose)
        wm = np.eye(4)
        wm[:3, :4] = K @ w2c[:3, :4]
        cams[f"world_mat_{i}"] = wm
    np.savez(str(out / "cameras_sphere.npz"), **cams)
    normalization = get_normalization(str(out))
    center = normalization[:3, 3]
    scale = normalization[0, 0]
    assert np.linalg.norm(center) < 0.3
    assert 0.2 < scale < 2.5


def test_textured_atlas():
    from fmov_pose_tpu.pipeline.textured import bake_texture, per_face_uv_atlas
    uvs, cell, grid = per_face_uv_atlas(10, tex_size=256)
    assert uvs.shape == (10, 3, 2)
    assert (uvs >= 0).all() and (uvs <= 1).all()
    # bake with a constant-color render fn on a small mesh
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    normals = np.ones_like(verts)

    def render_fn(o, d, near, far):
        return np.full((len(o), 3), 0.5, np.float32)

    tex, uvs = bake_texture(verts, faces, normals, render_fn, tex_size=64)
    assert tex.shape == (64, 64, 3)
    filled = (tex > 0).any(-1).mean()
    assert filled > 0.3  # a solid chunk of texels rasterized
    assert tex.max() == int(0.5 * 255)
