"""Host-side dataset: IDR-convention cameras, masks, LoFTR matches.

Functional re-organization of `/root/reference/models/dataset.py:146-545`.
All image/camera loading stays on the TPU-VM host (numpy + cv2); the
training loop uploads fixed device-resident buffers once (images, masks,
inverse intrinsics, per-frame mask bboxes) and generates rays on device
(see data/rays.py) — no per-step host->device traffic beyond scalar ids.

Key conventions preserved:
* images/masks loaded BGR via cv2 and divided by 256 (`dataset.py:184-189`).
* camera decomposition P = world_mat @ scale_mat ->
  cv2.decomposeProjectionMatrix -> K (normalized), c2w pose
  (`dataset.py:96-119`).
* LoFTR match filtering: 3-sigma distance, crop-transform shift, image
  border, mask membership (`dataset.py:317-415`).
* mask-init seed pose from the frame-0 mask footprint
  (`dataset.py:418-485`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from glob import glob
from typing import Dict, List, Optional, Tuple

import cv2 as cv
import numpy as np

__all__ = ["Dataset", "load_K_Rt_from_P", "apply_2d_transform"]


def load_K_Rt_from_P(P: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Decompose 3x4 projection into (4x4 intrinsics, 4x4 c2w pose)."""
    out = cv.decomposeProjectionMatrix(P)
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics, pose


def apply_2d_transform(coords: np.ndarray, M: np.ndarray) -> np.ndarray:
    """Apply a 3x3 affine to [N, 2] pixel coords (`dataset.py:133-143`)."""
    hom = np.concatenate([coords, np.ones((coords.shape[0], 1))], axis=-1)
    return (M @ hom.T).T[:, :2]


@dataclass
class Dataset:
    conf: object
    exp_dir: Optional[str] = None

    # populated in __post_init__
    n_images: int = 0
    H: int = 0
    W: int = 0
    images_np: np.ndarray = field(default=None, repr=False)
    masks_np: np.ndarray = field(default=None, repr=False)
    intrinsics_all: np.ndarray = field(default=None, repr=False)
    intrinsics_all_inv: np.ndarray = field(default=None, repr=False)
    pose_all: np.ndarray = field(default=None, repr=False)
    gt_poses: np.ndarray = field(default=None, repr=False)
    avai_ann_frame: List[int] = field(default_factory=list)
    scale_mats_np: List[np.ndarray] = field(default_factory=list)
    crop_poses: Optional[np.ndarray] = None
    crop_scale: float = 1.0
    crop_transforms: Optional[Dict[str, np.ndarray]] = None
    loftr_flows: Dict[str, tuple] = field(default_factory=dict)
    flow_pairs: Dict[str, set] = field(default_factory=dict)
    max_mask_pose: Optional[np.ndarray] = None
    mask_bboxes: np.ndarray = field(default=None, repr=False)

    def __post_init__(self):
        conf = self.conf
        self.data_dir = conf.get_string("data_dir")
        camera_dir = self.exp_dir if self.exp_dir is not None else self.data_dir
        self.render_cameras_name = conf.get_string(
            "render_cameras_name", "cameras_sphere.npz")

        camera_dict = None
        if not conf.get_bool("unknown_camera", False):
            cam_path = os.path.join(camera_dir, self.render_cameras_name)
            if os.path.exists(cam_path):
                if cam_path.endswith(".npz"):
                    camera_dict = np.load(cam_path)
                else:
                    camera_dict = np.load(cam_path, allow_pickle=True).item()

        self.images_lis = sorted(glob(os.path.join(self.data_dir, "image/*")))
        assert len(self.images_lis) > 0, f"no images in {self.data_dir}/image"
        self.masks_lis = sorted(glob(os.path.join(self.data_dir, "mask_obj/*")))
        assert len(self.masks_lis) > 0, f"no masks in {self.data_dir}/mask_obj"

        self.n_images = len(self.images_lis)
        self.images_np = np.stack(
            [cv.imread(p) for p in self.images_lis]).astype(np.float32) / 256.0
        self.masks_np = np.stack(
            [cv.imread(p) for p in self.masks_lis]).astype(np.float32) / 256.0

        if conf.get_bool("wo_mask", False):
            self.images_np[self.masks_np < 0.5] = 0.0

        self.start_idx = conf.get_int("start_idx", 0)
        self.end_idx = conf.get_int("end_idx", self.n_images)
        self.frame_to_index: Dict[str, int] = {}
        self.index_to_frame: Dict[int, str] = {}
        self.image_names_set = set()
        for idx, name in enumerate(self.images_lis[self.start_idx:self.end_idx]):
            stem = os.path.basename(name).split(".")[0]
            self.frame_to_index[stem] = idx
            self.index_to_frame[idx] = stem
            self.image_names_set.add(stem)

        self.H, self.W = self.images_np.shape[1], self.images_np.shape[2]

        self._load_cameras(conf, camera_dict)
        # crop-init may supply the intrinsics when no frame is annotated
        # (ML phase-2: empty cameras_sphere.npz + noise_cameras_sphere.npz,
        # `dataset.py:284-307` appends before the stack at `:493`)
        self._load_crop_init(conf, camera_dir)
        self._stack_cameras()
        self._load_crop_transforms(conf)
        self._load_loftr(conf)
        self._compute_mask_init(conf)

        # slice to [start_idx, end_idx)
        sl = slice(self.start_idx, self.end_idx)
        self.images_np = self.images_np[sl]
        self.masks_np = self.masks_np[sl]
        self.intrinsics_all = self.intrinsics_all[sl]
        self.intrinsics_all_inv = np.linalg.inv(self.intrinsics_all)
        if self.gt_poses is not None and len(self.gt_poses):
            self.pose_all = self.pose_all[sl]
            self.gt_poses = self.gt_poses[sl]
        self.n_images = self.images_np.shape[0]
        self.images_lis = self.images_lis[sl]
        self.focal = self.intrinsics_all[0][0, 0]
        self.image_pixels = self.H * self.W

        self._load_depths(conf, sl)
        self._compute_mask_bboxes()
        self._compute_object_bbox()

    def _load_depths(self, conf, sl):
        """Optional per-frame z-depth maps (depth/ dir; npy or png).

        The reference's mono-depth path was an unreleased extension that
        crashed when enabled (`dataset.py:518-523`); this is the working
        equivalent, used when train.depth_weight > 0."""
        self.depths_np = None
        if not (conf.get_bool("use_mono_depth", False)
                or conf.get_bool("load_depth", False)):
            return
        depth_dir = os.path.join(self.data_dir, "depth")
        if not os.path.isdir(depth_dir):
            return
        depths = []
        for f in sorted(os.listdir(depth_dir)):
            path = os.path.join(depth_dir, f)
            if f.endswith("png"):
                depths.append(cv.imread(path, cv.IMREAD_UNCHANGED)
                              .astype(np.float32))
            else:
                depths.append(np.load(path).astype(np.float32))
        if depths:
            self.depths_np = np.stack(depths)[sl]

    # ------------------------------------------------------------------
    def _load_cameras(self, conf, camera_dict):
        intrinsics_all, pose_all, gt_poses = [], [], []
        ml_intr = conf.get("ml_camera_intrinsics", "")
        n = self.n_images
        if ml_intr:
            K = np.zeros((3, 3))
            with open(ml_intr) as f:
                lines = f.readlines()
            for i in range(3):
                K[i, :] = list(map(float, lines[i].split()))
            eye = np.eye(4, dtype=np.float32)
            for _ in range(n):
                intr = np.eye(4, dtype=np.float32)
                intr[:3, :3] = K
                intrinsics_all.append(intr)
                pose_all.append(eye.copy())
            self.scale_mats_np = [np.eye(4, dtype=np.float32) for _ in range(n)]
        elif conf.get_bool("unknown_camera", False):
            K = np.load(os.path.join(self.data_dir, "K.npy"))
            for _ in range(n):
                intr = np.eye(4, dtype=np.float32)
                intr[:3, :3] = K
                intrinsics_all.append(intr)
                pose_all.append(np.eye(4, dtype=np.float32))
            self.scale_mats_np = [np.eye(4, dtype=np.float32) for _ in range(n)]
        elif conf.get_bool("partial_ann", False):
            self.scale_mats_np = [np.eye(4, dtype=np.float32) for _ in range(n)]
            intrinsics = None
            # first annotated frame fixes the shared intrinsics
            for k in self.frame_to_index:
                if camera_dict is not None and f"world_mat_{k}" in camera_dict:
                    P = (camera_dict[f"world_mat_{k}"].astype(np.float32)
                         @ camera_dict[f"scale_mat_{k}"].astype(np.float32))[:3, :4]
                    intrinsics, _ = load_K_Rt_from_P(P)
                    break
            for k in self.frame_to_index:
                if camera_dict is not None and f"world_mat_{k}" in camera_dict:
                    P = (camera_dict[f"world_mat_{k}"].astype(np.float32)
                         @ camera_dict[f"scale_mat_{k}"].astype(np.float32))[:3, :4]
                    intrinsics, pose = load_K_Rt_from_P(P)
                    gt_poses.append(pose)
                    intrinsics_all.append(intrinsics)
                    pose_all.append(pose)
                    self.avai_ann_frame.append(self.frame_to_index[k])
                elif intrinsics is not None:
                    intrinsics_all.append(intrinsics)
        elif camera_dict is not None:
            # full-annotation path (GT-pose NeuS), indices 0..n-1
            self.scale_mats_np = [
                camera_dict[f"scale_mat_{i}"].astype(np.float32) for i in range(n)]
            for i in range(n):
                P = (camera_dict[f"world_mat_{i}"].astype(np.float32)
                     @ self.scale_mats_np[i])[:3, :4]
                intrinsics, pose = load_K_Rt_from_P(P)
                intrinsics_all.append(intrinsics)
                pose_all.append(pose)
                gt_poses.append(pose)
                self.avai_ann_frame.append(i)
        else:
            raise NotImplementedError("no camera source configured")

        self._intrinsics_list = intrinsics_all
        self._pose_list = pose_all
        self._gt_list = gt_poses

    def _stack_cameras(self):
        self.intrinsics_all = np.stack(self._intrinsics_list).astype(np.float32)
        self.pose_all = (np.stack(self._pose_list).astype(np.float32)
                         if self._pose_list else np.zeros((0, 4, 4), np.float32))
        self.gt_poses = (np.stack(self._gt_list).astype(np.float32)
                         if self._gt_list else np.zeros((0, 4, 4), np.float32))
        del self._intrinsics_list, self._pose_list, self._gt_list

    def _load_crop_init(self, conf, camera_dir):
        self.use_crop_init = conf.get_bool("use_crop_init", False)
        if not self.use_crop_init:
            return
        noise_path = os.path.join(camera_dir, "noise_cameras_sphere.npz")
        if noise_path.endswith(".npz"):
            noise_dict = np.load(noise_path)
        crop_poses = []
        use_noise_intrinsic = len(self._gt_list) == 0
        n_noise = sum(1 for k in noise_dict.files
                      if k.startswith("world_mat_"))
        if n_noise < self.n_images:
            raise ValueError(
                f"noise init {noise_path} covers {n_noise} frames but the "
                f"image dir has {self.n_images}: phase-1 progressive "
                f"learning did not admit/align every frame (its pose export "
                f"backs off 10 frames when incomplete). Re-run phase 1 with "
                f"a larger end_iter, or lower reset_rot_threshold churn.")
        for i in range(self.n_images):
            scale_mat = noise_dict[f"scale_mat_{i}"]
            self.crop_scale = float(scale_mat[0, 0])
            P = (noise_dict[f"world_mat_{i}"] @ scale_mat)[:3, :4]
            intrinsics, pose = load_K_Rt_from_P(P.astype(np.float32))
            crop_poses.append(pose)
            if use_noise_intrinsic:
                self._intrinsics_list.append(intrinsics)
        self.crop_poses = np.stack(crop_poses).astype(np.float32)

    def _load_crop_transforms(self, conf):
        self.crop = conf.get_bool("crop", False)
        if self.crop:
            self.crop_transforms = np.load(
                os.path.join(self.data_dir, "transform_matrixs.npy"),
                allow_pickle=True).item()

    def _load_loftr(self, conf):
        flow_dir = conf.get("loftr_interval_flow_dir", None)
        self.filter_match_outliers = conf.get_bool("filter_match_outliers", False)
        if flow_dir is None:
            return
        seq_name = self.data_dir.rstrip("/").split("/")[-1].split("_")[0]
        seq_flow_dir = os.path.join(flow_dir, seq_name)
        if not os.path.isdir(seq_flow_dir):
            return
        for fname in sorted(os.listdir(seq_flow_dir)):
            f1, f2 = fname.split("_")[:2]
            f2 = f2.split(".")[0]
            if f1 not in self.image_names_set or f2 not in self.image_names_set:
                continue
            rows = np.loadtxt(os.path.join(seq_flow_dir, fname), ndmin=2)
            if rows.size == 0:
                continue
            xys1, xys2 = rows[:, :2], rows[:, 2:4]
            if self.filter_match_outliers:
                d = np.linalg.norm(xys1 - xys2, axis=-1)
                keep = np.abs(d - d.mean()) < 3 * d.std()
                xys1, xys2 = xys1[keep], xys2[keep]
            if self.crop:
                xys1 = apply_2d_transform(xys1, self.crop_transforms[f1])
                xys2 = apply_2d_transform(xys2, self.crop_transforms[f2])
            keep = ((xys1[:, 0] >= 0) & (xys1[:, 0] < self.W)
                    & (xys1[:, 1] >= 0) & (xys1[:, 1] < self.H)
                    & (xys2[:, 0] >= 0) & (xys2[:, 0] < self.W)
                    & (xys2[:, 1] >= 0) & (xys2[:, 1] < self.H))
            xys1, xys2 = xys1[keep], xys2[keep]
            m1 = self.masks_np[self.frame_to_index[f1]][..., 0]
            m2 = self.masks_np[self.frame_to_index[f2]][..., 0]
            keep = ((m1[xys1[:, 1].astype(int), xys1[:, 0].astype(int)] > 0.5)
                    & (m2[xys2[:, 1].astype(int), xys2[:, 0].astype(int)] > 0.5))
            xys1, xys2 = xys1[keep], xys2[keep]
            pair = (xys1[:, 0], xys1[:, 1], xys2[:, 0], xys2[:, 1])
            self.loftr_flows.setdefault(f"{f1}_{f2}", pair)
            self.loftr_flows.setdefault(
                f"{f2}_{f1}", (xys2[:, 0], xys2[:, 1], xys1[:, 0], xys1[:, 1]))
            self.flow_pairs.setdefault(f1, set()).add(f2)
            self.flow_pairs.setdefault(f2, set()).add(f1)

    def _compute_mask_init(self, conf):
        self.mask_init = conf.get_bool("mask_init", False)
        if not self.mask_init:
            return
        idx = 0  # reference seeds from the first frame (`dataset.py:421-428`)
        ys, xs = np.where(self.masks_np[idx][:, :, 0] > 0.5)
        K = self.intrinsics_all[idx][:3, :3]
        pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1).reshape(-1, 3)
        cam_pts = (np.linalg.inv(K) @ pix.T).T
        cam_pts = cam_pts / cam_pts[:, 2:]
        pose = np.eye(4, dtype=np.float32)
        if conf.get_bool("crop", False):
            xy_radius = np.linalg.norm(cam_pts[:, :2], axis=-1).max()
            pose[:3, 3] = np.array([0.0, 0.0, -0.9 / xy_radius])
        else:
            lo, hi = cam_pts[:, :2].min(0), cam_pts[:, :2].max(0)
            center = (lo + hi) / 2
            xy_radius = np.linalg.norm(cam_pts[:, :2] - center[None], axis=-1).max()
            pose[:3, 3] = np.array([center[0], center[1], 1.0]) * (-0.9 / xy_radius)
        self.max_mask_pose = pose
        self.max_mask_index = idx

    def _compute_mask_bboxes(self):
        """Per-frame [ymin, ymax, xmin, xmax] of the object mask — device
        lookup table for mask-guided ray sampling (replaces per-step
        np.where, `dataset.py:643-655`)."""
        boxes = np.zeros((self.n_images, 4), np.int32)
        for i in range(self.n_images):
            ys, xs = np.where(self.masks_np[i][:, :, 0] > 0.5)
            if len(ys) == 0:
                boxes[i] = (0, self.H, 0, self.W)
            else:
                boxes[i] = (ys.min(), ys.max() + 1, xs.min(), xs.max() + 1)
        self.mask_bboxes = boxes

    def _compute_object_bbox(self):
        bb_min = np.array([-1.01, -1.01, -1.01, 1.0])
        bb_max = np.array([1.01, 1.01, 1.01, 1.0])
        inv_scale = np.linalg.inv(self.scale_mats_np[0])
        self.object_bbox_min = (inv_scale @ bb_min[:, None])[:3, 0]
        self.object_bbox_max = (inv_scale @ bb_max[:, None])[:3, 0]

    # ------------------------------------------------------------------
    def near_far_from_sphere(self, rays_o, rays_d):
        a = np.sum(rays_d**2, axis=-1, keepdims=True)
        b = 2.0 * np.sum(rays_o * rays_d, axis=-1, keepdims=True)
        mid = 0.5 * (-b) / a
        return mid - 1.0, mid + 1.0

    def image_at(self, idx, resolution_level=1):
        img = cv.imread(self.images_lis[idx])
        return cv.resize(
            img, (self.W // resolution_level, self.H // resolution_level)
        ).clip(0, 255)

    def masked_bbox_with_margin(self, idx: int, margin: int):
        y0, y1, x0, x1 = self.mask_bboxes[idx]
        return (max(y0 - margin, 0), min(y1 + margin, self.H),
                max(x0 - margin, 0), min(x1 + margin, self.W))
