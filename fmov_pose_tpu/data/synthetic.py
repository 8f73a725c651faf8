"""Synthetic test sequences in the reference's on-disk dataset format.

Generates a small orbit around an analytically-shaded sphere and writes
the exact directory layout the Dataset loader (and the reference repo)
expects: ``image/*.png``, ``mask_obj/*.png``, ``cameras_sphere.npz`` with
IDR-convention ``world_mat_<frame>`` / ``scale_mat_<frame>`` keys, plus
optional ``transform_matrixs.npy`` and LoFTR-style match files — so the
full pipeline (training, alignment, preprocessing) can be exercised
end-to-end without HO3D data.
"""

from __future__ import annotations

import os

import cv2 as cv
import numpy as np

__all__ = ["make_orbit_sequence", "render_sphere_frame", "look_at_pose"]

SPHERE_RADIUS = 0.5


def look_at_pose(cam_pos, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    """OpenCV-convention c2w: +z forward toward target."""
    cam_pos = np.asarray(cam_pos, np.float64)
    fwd = np.asarray(target, np.float64) - cam_pos
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    pose = np.eye(4)
    pose[:3, 0] = right
    pose[:3, 1] = down
    pose[:3, 2] = fwd
    pose[:3, 3] = cam_pos
    return pose.astype(np.float32)


def _sphere_color(pts):
    """Smooth angular texture (deterministic, view-independent)."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    r = np.linalg.norm(pts, axis=-1) + 1e-9
    u, v, w = x / r, y / r, z / r
    col = np.stack(
        [0.5 + 0.5 * np.sin(3 * u + 1.0) * np.cos(2 * v),
         0.5 + 0.5 * np.sin(4 * v) * np.cos(3 * w),
         0.5 + 0.5 * np.sin(5 * w + 0.5)], axis=-1)
    return np.clip(col, 0.0, 1.0)


def render_sphere_frame(K, c2w, H, W, radius=SPHERE_RADIUS):
    """Analytic ray-traced lambertian sphere. Returns (rgb [H,W,3] in [0,1],
    mask [H,W] bool, depth [H,W])."""
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1).astype(np.float64)
    dirs = pix @ np.linalg.inv(K).T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs @ c2w[:3, :3].T
    o = c2w[:3, 3][None, None, :]

    b = 2.0 * (o * dirs).sum(-1)
    c = (o * o).sum() - radius**2
    disc = b * b - 4 * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0, 0.0)
    hit &= t > 0
    pts = o + dirs * t[..., None]
    normal = pts / (np.linalg.norm(pts, axis=-1, keepdims=True) + 1e-9)
    light = np.array([0.5, -0.7, -0.5])
    light /= np.linalg.norm(light)
    lambert = np.clip((normal * light).sum(-1), 0.0, 1.0) * 0.6 + 0.4
    rgb = _sphere_color(pts) * lambert[..., None]
    rgb = np.where(hit[..., None], rgb, 0.0)
    depth = np.where(hit, t, 0.0)
    return rgb.astype(np.float32), hit, depth.astype(np.float32)


def make_orbit_sequence(out_dir, n_frames=8, H=120, W=120, span_deg=60.0,
                        with_matches=True, with_crop=True, cam_dist=2.5,
                        ann_stride=1, elevation_deg=15.0):
    """Write a synthetic sequence dataset; returns dict of ground truth."""
    os.makedirs(os.path.join(out_dir, "image"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "mask_obj"), exist_ok=True)

    f = 0.9 * max(H, W) / (2 * np.tan(np.deg2rad(25)))
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]])

    cam_dict = {}
    poses, names, frames = [], [], []
    el = np.deg2rad(elevation_deg)
    for i in range(n_frames):
        ang = np.deg2rad(span_deg) * i / max(n_frames - 1, 1)
        cam_pos = cam_dist * np.array(
            [np.sin(ang) * np.cos(el), np.sin(el), -np.cos(ang) * np.cos(el)])
        c2w = look_at_pose(cam_pos)
        rgb, mask, depth = render_sphere_frame(K, c2w, H, W)
        name = f"{i:04d}"
        cv.imwrite(os.path.join(out_dir, "image", name + ".png"),
                   (rgb[..., ::-1] * 255).astype(np.uint8))
        cv.imwrite(os.path.join(out_dir, "mask_obj", name + ".png"),
                   (mask * 255).astype(np.uint8))
        poses.append(c2w)
        names.append(name)
        frames.append((rgb, mask, depth))
        if i % ann_stride == 0:
            w2c = np.linalg.inv(c2w)
            world_mat = np.eye(4)
            world_mat[:3, :4] = K @ w2c[:3, :4]
            cam_dict[f"world_mat_{name}"] = world_mat.astype(np.float32)
            cam_dict[f"scale_mat_{name}"] = np.eye(4, dtype=np.float32)
            # integer-indexed aliases for the full-annotation (GT) loader
            cam_dict[f"world_mat_{i}"] = world_mat.astype(np.float32)
            cam_dict[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
    np.savez(os.path.join(out_dir, "cameras_sphere.npz"), **cam_dict)

    if with_crop:
        transforms = {n: np.eye(3, dtype=np.float32) for n in names}
        np.save(os.path.join(out_dir, "transform_matrixs.npy"), transforms)

    if with_matches:
        seq = os.path.basename(os.path.normpath(out_dir)).split("_")[0]
        match_dir = os.path.join(os.path.dirname(os.path.normpath(out_dir)),
                                 "matches", seq)
        os.makedirs(match_dir, exist_ok=True)
        rng = np.random.default_rng(0)
        for i in range(n_frames - 1):
            _write_matches(match_dir, names[i], names[i + 1],
                           frames[i], frames[i + 1], poses[i], poses[i + 1],
                           K, rng)

    return {"K": K, "poses": np.stack(poses), "names": names,
            "frames": frames}


def _write_matches(match_dir, n1, n2, fr1, fr2, c2w1, c2w2, K, rng,
                   n_matches=200):
    """Exact correspondences via the analytic geometry (stand-in for LoFTR)."""
    _, mask1, depth1 = fr1
    _, mask2, _ = fr2
    ys, xs = np.where(mask1)
    if len(ys) == 0:
        return
    sel = rng.choice(len(ys), min(n_matches * 3, len(ys)), replace=False)
    xs, ys = xs[sel], ys[sel]
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float64)
    dirs = pix @ np.linalg.inv(K).T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pts_cam = dirs * depth1[ys, xs][:, None]
    pts_w = pts_cam @ c2w1[:3, :3].T + c2w1[:3, 3]
    w2c2 = np.linalg.inv(c2w2)
    pts_c2 = pts_w @ w2c2[:3, :3].T + w2c2[:3, 3]
    proj = pts_c2 @ K.T
    px2 = proj[:, 0] / proj[:, 2]
    py2 = proj[:, 1] / proj[:, 2]
    H, W = mask2.shape
    keep = ((px2 >= 0) & (px2 < W) & (py2 >= 0) & (py2 < H) & (pts_c2[:, 2] > 0))
    xi, yi = np.clip(px2, 0, W - 1).astype(int), np.clip(py2, 0, H - 1).astype(int)
    keep &= mask2[yi, xi]
    rows = np.stack([xs[keep], ys[keep], px2[keep], py2[keep]], -1)[:n_matches]
    with open(os.path.join(match_dir, f"{n1}_{n2}_matches.txt"), "w") as f:
        for r in rows:
            f.write("\t".join(f"{v:.3f}" for v in r) + "\n")
