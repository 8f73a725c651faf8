"""Experiment runner: conf-driven training lifecycle (TPU-native).

Functional re-design of `/root/reference/exp_runner.py:67-2024`.  The
mutable torch Runner becomes:

* a jit-compiled step pair (photo/flow) over an immutable TrainState
  (see train/step.py) — all hot-loop state lives on device;
* a host-side scheduler (`self` counters) driving the *progressive*
  curriculum: frame admission every max_pro_iteration iters, per-segment
  pose warm-ups, rotation-triggered NeuS resets, frame-replay perms
  (`exp_runner.py:860-947, 982-1041`);
* eval/export methods (validate_image/poses/mesh, novel-view renders,
  aligned-pose export) mirroring the reference CLI modes.

Accepts the reference's .conf files unchanged (data/hocon.py).
"""

from __future__ import annotations

import logging
import os
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np

from fmov_pose_tpu.data import hocon
from fmov_pose_tpu.data import rays as raygen
from fmov_pose_tpu.data.dataset import Dataset
from fmov_pose_tpu.fields import nets
from fmov_pose_tpu.pipeline import evalpose, meshio
from fmov_pose_tpu.poses import picture_pose as pp
from fmov_pose_tpu.render import geometry, neus
from fmov_pose_tpu.train import checkpoint as ckpt
from fmov_pose_tpu.train import optim, step as step_mod

LOG = logging.getLogger(__name__)


class _StepProfiler:
    """Honor ``FMOV_PROFILE_DIR`` inside training: capture a jax.profiler
    trace over a window of steps (skip ``FMOV_PROFILE_START`` steps of
    warm-up/compile, trace the next ``FMOV_PROFILE_STEPS``).  Used by all
    three dispatch strategies (per-step, scan, seg-scan); scan paths tick
    in chunk-sized increments.  SURVEY §5 tracing row."""

    def __init__(self):
        self.dir = os.environ.get("FMOV_PROFILE_DIR")
        self.start_at = int(os.environ.get("FMOV_PROFILE_START", "20"))
        self.n_steps = int(os.environ.get("FMOV_PROFILE_STEPS", "20"))
        self._seen = 0
        self._active = False
        self._done = self.dir is None

    def tick(self, n=1):
        if self._done:
            return
        if not self._active and self._seen >= self.start_at:
            jax.profiler.start_trace(self.dir)
            self._active = True
            LOG.info("profiler: trace started -> %s (next %d steps)",
                     self.dir, self.n_steps)
        self._seen += n
        if self._active and self._seen >= self.start_at + self.n_steps:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            LOG.info("profiler: trace stopped after %d steps", self._seen)

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            LOG.info("profiler: trace stopped (train end)")


def rotation_error_deg(rel_R: np.ndarray) -> float:
    d = 0.5 * (rel_R[0, 0] + rel_R[1, 1] + rel_R[2, 2] - 1.0)
    return float(np.arccos(max(min(d, 1.0), -1.0)) * 180.0 / np.pi)


class Runner:
    def __init__(self, conf_path, mode="train", case="CASE_NAME",
                 dataset="DTU", is_continue=False, start_at=-1,
                 start_img_idx=0, gradient_analysis=False, exp_dir=None,
                 has_global_conf=False, flow_interval=-1,
                 reset_rot_degree=-1, image_interval=-1, seed=2024):
        self.case = case
        self.mode = mode
        self.conf_path = conf_path
        self.rng = np.random.default_rng(seed)
        self.gradient_analysis = gradient_analysis

        # multi-host: attach to the coordinator BEFORE any device use (the
        # backend is frozen on first array op); no-op unless
        # FMOV_DISTRIBUTED=1. Host-side writes (checkpoints, tensorboard,
        # validation images/meshes) then happen on process 0 only — all
        # ranks still execute every jitted computation in lockstep, which
        # is required: a rank skipping a global SPMD program deadlocks the
        # others.
        from fmov_pose_tpu.parallel import dp as _dp
        _dp.maybe_initialize_distributed()
        self.is_main = _dp.is_main()

        conf = hocon.parse_file(conf_path, {"CASE_NAME": case,
                                            "DATA_SET": dataset})
        self.conf = conf
        self.base_exp_dir = exp_dir or conf["general.base_exp_dir"]
        if not has_global_conf and "global_reset_exp" not in self.base_exp_dir:
            self.base_exp_dir += "_wo_global_conf"
        if flow_interval > 0:
            self.base_exp_dir += f"_m{flow_interval}"
            conf.put("train.flow_interval", flow_interval)
        if reset_rot_degree > 0:
            self.base_exp_dir += f"_r{reset_rot_degree}"
            conf.put("train.reset_rot_threshold", reset_rot_degree)
        if image_interval > 0:
            self.base_exp_dir += f"_i{image_interval}"
            conf.put("train.image_interval", image_interval)
            conf.put("train.max_pro_iteration", 1000 * image_interval)
            conf.put("train.pro_warm_up_end", 500 * image_interval)
            conf.put("train.current_image", image_interval)
        if flow_interval > 0 or reset_rot_degree > 0 or image_interval > 0:
            conf.put("train.save_freq", 30000)
        if start_img_idx > 0:
            self.base_exp_dir += f"_start_at_{start_img_idx}"
        os.makedirs(self.base_exp_dir, exist_ok=True)
        conf.put("dataset.start_idx", start_img_idx)

        if conf.get_float("train.depth_weight", 0.0) > 0:
            conf.put("dataset.load_depth", True)
        self.dataset = Dataset(conf["dataset"], exp_dir)
        self.iter_step = 0

        t = conf["train"]
        self.end_iter = t.get_int("end_iter")
        self.save_freq = t.get_int("save_freq")
        self.report_freq = t.get_int("report_freq")
        self.val_freq = t.get_int("val_freq")
        self.val_mesh_freq = t.get_int("val_mesh_freq")
        self.pose_freq = conf.get_int("train.pose_freq", 1000)
        self.batch_size = t.get_int("batch_size")
        self.validate_resolution_level = t.get_int("validate_resolution_level")
        self.learning_rate = t.get_float("learning_rate")
        self.learning_rate_alpha = t.get_float("learning_rate_alpha")
        self.use_white_bkgd = t.get_bool("use_white_bkgd")
        self.warm_up_end = conf.get_float("train.warm_up_end", 0.0)
        self.anneal_end = conf.get_float("train.anneal_end", 0.0)
        self.mask_guided_sampling = conf.get_bool(
            "train.mask_guided_sampling", False)
        self.igr_weight = t.get_float("igr_weight")
        self.mask_weight = t.get_float("mask_weight")
        self.flow_weight = conf.get_float("train.flow_weight", 0.0)
        self.unit_sphere_weight = conf.get_float("train.unit_sphere_weight", 0.0)
        self.depth_weight = conf.get_float("train.depth_weight", 0.0)
        self.is_continue = is_continue

        self.progressive = conf.get_bool("train.progressive", False)
        self.image_interval = conf.get_int("train.image_interval", 10)
        self.current_image = min(
            conf.get_int("train.current_image", self.dataset.n_images),
            self.dataset.n_images)
        self.max_pro_iteration = conf.get_int("train.max_pro_iteration", 0)
        self.pro_warm_up_end = conf.get_int("train.pro_warm_up_end", 0)
        self.mesh_warmup_step = conf.get_int("train.mesh_warmup_step", 0)
        self.pose_lr = conf.get_float("train.pose_lr", 5e-4)
        self.pose_alpha = conf.get_float("train.pose_alpha", 0.5)
        self.flow_interval = conf.get("train.flow_interval", 1)
        self.only_rotation = conf.get_bool("train.only_rotation", False)
        self.detach_ref = conf.get_bool("train.detach_ref", False)
        self.detach_flow_on_sdf = conf.get_bool("train.detach_flow_on_sdf", False)
        self.detach_mesh_at_warm_up = conf.get_bool(
            "train.detach_mesh_at_warm_up", False)
        self.disable_trans_during_warm_up = conf.get_bool(
            "train.disable_trans_during_warm_up", False)
        self.reset_based_on_rot = conf.get_bool("train.reset_based_on_rot", False)
        self.reset_rot_threshold = conf.get_float("train.reset_rot_threshold", 60)
        self.mask_guided_patch_size = conf.get_int(
            "train.mask_guided_patch_size", 30)
        self.maintain_shape = conf.get_bool("train.maintain_shape", False)
        self.remove_prev_matches = conf.get_bool("train.remove_prev_matches", True)
        self.mask_init = conf.get_bool("dataset.mask_init", False)
        self.prev_pose = None

        if "model.barf" not in conf:
            conf.put("model.barf", False)
        self.barf = conf.get_bool("model.barf")
        self.pose_type = conf.get("model.pose_type", "None")

        # -------- model configs
        self.model_cfg = {
            "sdf": conf["model.sdf_network"].as_plain_dict(),
            "color": conf["model.rendering_network"].as_plain_dict(),
            "nerf": conf["model.nerf"].as_plain_dict(),
            "renderer": neus.make_render_cfg(
                conf["model.neus_renderer"].as_plain_dict()),
        }
        self.model_cfg["sdf"]["skip_in"] = tuple(
            self.model_cfg["sdf"].get("skip_in", [4]))
        self.model_cfg["nerf"]["skips"] = tuple(
            self.model_cfg["nerf"].get("skips", [4]))
        # mixed precision: bf16 MLP activations halve the HBM-bound
        # activation traffic (params/accumulation stay f32); default f32
        # for strict numerical parity with the reference
        compute_dtype = conf.get("train.compute_dtype", "float32")
        for net in ("sdf", "color", "nerf"):
            self.model_cfg[net].setdefault("compute_dtype", compute_dtype)
        # global matmul contraction precision. TPU's DEFAULT contracts
        # f32 operands in one bf16 pass (fastest); "highest" makes XLA
        # matmuls f32-equivalent — the quality dial for SHORT schedules
        # (600-iter h2h ablation: bf16 costs render PSNR while pose/
        # chamfer match; at shipped-length schedules bf16 quality
        # converges — see HEADTOHEAD.md precision ablation). The Pallas
        # fused kernels intentionally ignore this knob (single-pass bf16
        # is their contract, ops/fused_sdf.py:_dot). jax.config is
        # process-global, so only touch it when the key is present.
        mm_prec = conf.get("train.matmul_precision", None)
        if mm_prec is not None:
            if mm_prec not in ("default", "high", "highest"):
                raise ValueError(
                    f"train.matmul_precision must be default/high/highest,"
                    f" got {mm_prec!r}")
            jax.config.update("jax_default_matmul_precision", mm_prec)
        # Pallas-fused SDF forward for gradient-free paths (upsampling,
        # mesh grids, eval renders); auto-disabled on CPU
        self.model_cfg["sdf"]["use_fused"] = conf.get_bool(
            "train.use_fused_kernels", True)
        # fully-fused fwd+grad+second-order-backward Pallas train path
        # (~15% faster; grads agree with XLA to <1%; opt-in)
        self.model_cfg["sdf"]["use_fused_train"] = conf.get_bool(
            "train.use_fused_train_kernels", False)
        # occupancy-grid guided importance sampling (opt-in; replaces the
        # SDF-guided upsample passes with a cached-grid gather)
        self.occupancy_sampling = (
            conf.get_bool("train.occupancy_sampling", False)
            and self.model_cfg["renderer"].n_importance > 0)
        self.occ_grid_res = conf.get_int("train.occ_grid_res", 64)
        self.occ_update_freq = conf.get_int("train.occ_update_freq", 250)
        self.variance_cfg = conf["model.variance_network"].as_plain_dict()

        # -------- pose mode + initial poses
        noise_poses = None
        if self.barf:
            if conf.get("dataset.use_crop_init", False):
                noise_poses = self.dataset.crop_poses
            elif self.mask_init:
                noise_poses = np.repeat(
                    self.dataset.max_mask_pose[None], self.dataset.n_images, 0)
            else:
                raise NotImplementedError("only mask_init / crop_init supported")
        if self.pose_type == "seg":
            self.pose_mode = ("seg_pixel"
                              if conf.get_bool("model.pixel_level", False)
                              else "seg")
        elif self.pose_type == "gf":
            self.pose_mode = "gf"
        elif self.barf:
            self.pose_mode = "se3"
        else:
            self.pose_mode = "fixed"

        self.pixel_level = conf.get_bool("model.pixel_level", False)
        emphasize_rot = bool(conf.get("train.emphasize_rot", False))
        small_rot = bool(conf.get("train.small_rot", False))
        self.pose_cfg = pp.PoseCfg(emphasize_rot=emphasize_rot,
                                   small_rot=small_rot)
        self.deep_pose_cfg = None
        if self.pose_mode == "seg_pixel":
            from fmov_pose_tpu.poses import pixel_pose as px
            self.deep_pose_cfg = px.DeepPoseCfg(
                n_images=self.dataset.n_images)
        self.n_segments = (
            pp.num_segments(self.dataset.n_images, self.image_interval)
            if self.pose_mode in ("seg", "seg_pixel") else 1)
        self.current_pose_mlp_index = 0
        self.pro_iteration = 0
        self.reset_count = 0  # rotation-triggered reset_neus firings
        self.seg_progress = np.zeros((self.n_segments,), np.float64)
        self.seg_frozen = np.zeros((self.n_segments,), np.float32)
        self.seg_frozen[:] = 1.0  # 1 = trainable

        self._init_device_buffers()
        self._init_state(noise_poses, seed)
        self._build_steps()

        # resume
        if is_continue:
            latest = ckpt.latest_checkpoint(
                os.path.join(self.base_exp_dir, "checkpoints"))
            if latest is not None:
                self.load_checkpoint(latest)
            else:
                LOG.warning(
                    "--is_continue: no checkpoint under %s — starting from "
                    "scratch (check --global_conf: it changes the exp dir)",
                    os.path.join(self.base_exp_dir, "checkpoints"))

        if mode.startswith("train"):
            self.file_backup()

        n_override = conf.get_int("dataset.n_images", self.dataset.n_images)
        self.dataset.n_images = min(n_override, self.dataset.n_images)
        self.writer = None

    # ------------------------------------------------------------------
    def _init_device_buffers(self):
        d = self.dataset
        # Ship images/masks as uint8 (4x less tunnel traffic — the bulk
        # H2D ran ~0.3 MB/s through the tunnel, 550 s of a 256-frame
        # init) and expand to float32 on device. Bitwise-exact: pixel
        # data is k/256 from 8-bit PNGs (the NeuS convention,
        # `dataset.py:100-102`), round(x*256) recovers k, and the
        # on-device astype/256 is the same arithmetic the host did.
        imgs_u8 = np.round(
            d.images_np.transpose(3, 0, 1, 2) * 256.0).astype(np.uint8)
        self.images_dev = (jnp.asarray(imgs_u8).astype(jnp.float32)
                           / 256.0)  # [3, N, H, W]
        self.depths_dev = (jnp.asarray(d.depths_np, jnp.float32)
                           if getattr(d, "depths_np", None) is not None
                           and self.depth_weight > 0 else None)
        masks_u8 = np.round(d.masks_np[..., 0] * 256.0).astype(np.uint8)
        self.masks_dev = jnp.asarray(masks_u8).astype(jnp.float32) / 256.0
        self.intr_inv_dev = jnp.asarray(d.intrinsics_all_inv, jnp.float32)
        self.bbox_dev = jnp.asarray(d.mask_bboxes, jnp.int32)

    def _field_params(self, seed):
        key = jax.random.key(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "sdf": nets.init_sdf(k1, self.model_cfg["sdf"]),
            "color": nets.init_color(k2, self.model_cfg["color"]),
            "nerf": nets.init_nerf(k3, self.model_cfg["nerf"]),
            "variance": nets.init_variance(self.variance_cfg),
        }
        return params

    def _init_state(self, noise_poses, seed):
        params = self._field_params(seed)
        pose_bank, pose_opt, pose_static = {}, (), {}
        if self.pose_mode == "seg":
            pose_bank = pp.init_seg_bank(
                seed, self.pose_cfg, self.dataset.n_images,
                self.image_interval, np.asarray(noise_poses)[0])
            pose_opt = optim.seg_adam_init(pose_bank["train"], self.n_segments)
        elif self.pose_mode == "seg_pixel":
            from fmov_pose_tpu.poses import pixel_pose as px
            pose_bank = px.init_seg_deep_bank(
                seed, self.deep_pose_cfg, self.dataset.n_images,
                self.image_interval, np.asarray(noise_poses)[0])
            pose_opt = optim.seg_adam_init(pose_bank["train"], self.n_segments)
        elif self.pose_mode == "gf":
            gf = pp.init_gf(seed, self.pose_cfg, np.asarray(noise_poses))
            params["pose"] = gf["train"]
            pose_static = gf["static"]
        elif self.pose_mode == "se3":
            params["se3_refine"] = jnp.zeros((self.dataset.n_images, 6))
            pose_static = {"noise_poses": jnp.asarray(noise_poses, jnp.float32)}
        else:
            pose_static = {"pose_all": jnp.asarray(
                self.dataset.pose_all, jnp.float32)}

        if getattr(self, "occupancy_sampling", False):
            # start fully occupied (= uniform importance) until first update
            pose_static = dict(pose_static)
            pose_static["occ_grid"] = jnp.ones(
                (self.occ_grid_res,) * 3, jnp.float32)

        self.state = step_mod.TrainState(
            params=params,
            opt=optim.adam_init(params),
            pose_bank=pose_bank,
            pose_opt=pose_opt,
            pose_static=pose_static,
            key=jax.random.key(seed + 1),
            iter_step=jnp.zeros((), jnp.int32),
        )

    def _build_steps(self):
        self.step_cfg = step_mod.make_step_config(
            self.model_cfg,
            batch_size=self.batch_size,
            H=self.dataset.H, W=self.dataset.W,
            n_segments=self.n_segments,
            segment_img_num=self.image_interval,
            pose_mode=self.pose_mode,
            pose_cfg=self.pose_cfg,
            deep_pose_cfg=self.deep_pose_cfg,
            occupancy_sampling=getattr(self, "occupancy_sampling", False),
            igr_weight=self.igr_weight,
            mask_weight=self.mask_weight,
            flow_weight=self.flow_weight,
            depth_weight=(self.depth_weight
                          if self.depths_dev is not None else 0.0),
            unit_sphere_weight=self.unit_sphere_weight,
            use_white_bkgd=self.use_white_bkgd,
            mask_guided_sampling=self.mask_guided_sampling,
            mask_guided_patch_size=self.mask_guided_patch_size,
            maintain_shape=self.maintain_shape,
            detach_ref=self.detach_ref,
            detach_flow_on_sdf=self.detach_flow_on_sdf,
            only_rotation=self.only_rotation,
        )
        # multi-chip: shard the ray batch over all local devices
        # (train.data_parallel, default on when >1 device is attached)
        n_dev = jax.device_count()
        use_dp = self.conf.get_bool("train.data_parallel", n_dev > 1) \
            and n_dev > 1 and self.batch_size % n_dev == 0 \
            and (self.batch_size // 2) % n_dev == 0
        self.use_dp = use_dp
        if use_dp:
            from fmov_pose_tpu.parallel import dp
            mesh = dp.make_mesh()
            self.mesh = mesh
            LOG.info("data-parallel over %d devices (%d processes)",
                     mesh.shape[dp.AXIS], jax.process_count())
            if jax.process_count() > 1:
                # multi-host: every closure capture and the train state must
                # be global replicated arrays (see dp.replicate_tree)
                (self.images_dev, self.masks_dev, self.intr_inv_dev,
                 self.bbox_dev, self.depths_dev, self.state) = \
                    dp.replicate_tree(mesh, (
                        self.images_dev, self.masks_dev, self.intr_inv_dev,
                        self.bbox_dev, self.depths_dev, self.state))
            self.photo_step = dp.make_dp_photo_step(
                self.step_cfg, self.images_dev, self.masks_dev,
                self.intr_inv_dev, self.bbox_dev, mesh,
                depths=self.depths_dev)
            self.flow_step = dp.make_dp_flow_step(
                self.step_cfg, self.images_dev, self.masks_dev,
                self.intr_inv_dev, self.bbox_dev, mesh)
        else:
            self.photo_step = step_mod.make_photo_step(
                self.step_cfg, self.images_dev, self.masks_dev,
                self.intr_inv_dev, self.bbox_dev, depths=self.depths_dev)
            self.flow_step = step_mod.make_flow_step(
                self.step_cfg, self.images_dev, self.masks_dev,
                self.intr_inv_dev, self.bbox_dev)
        self._eval_render = jax.jit(
            lambda key, params, ro, rd, near, far, ca: neus.render(
                key, params, self.model_cfg, ro, rd, near, far,
                cos_anneal_ratio=ca,
                background_rgb=(jnp.ones((1, 3)) if self.use_white_bkgd
                                else None),
                eval_mode=True))

    # ------------------------------------------------------------------
    # pose queries (host)
    # ------------------------------------------------------------------
    def query_pose(self, i: int) -> np.ndarray:
        """Learned/GT c2w of frame i as numpy [4, 4].

        Jitted with the frame id traced: the eager pose_of_frame chain
        was ~20 tunnel dispatches per call, and the shipped phase-1 conf
        (reset_based_on_rot) queries a pose at every admission."""
        if not hasattr(self, "_query_one"):
            cfg = self.step_cfg

            @jax.jit
            def query_one(params, pose_bank, pose_static, idx):
                return step_mod.pose_of_frame(cfg, params, pose_bank,
                                              pose_static, idx)

            self._query_one = query_one
        p34 = self._query_one(self.state.params, self.state.pose_bank,
                              self.state.pose_static,
                              jnp.asarray(i, jnp.int32))
        out = np.eye(4, dtype=np.float32)
        out[:3] = np.asarray(p34)
        return out

    def query_poses(self, n: int) -> np.ndarray:
        """All learned/GT c2w poses [n, 4, 4] in ONE device dispatch.

        The per-frame loop was O(n) tunnel round-trips (~5 ms each): at
        reference-scale sequences (~300 frames) validate_poses alone cost
        seconds per call.  Ids are padded to a 32-bucket so the jit
        compiles O(log n) times as current_image grows (jnp gathers clamp
        out-of-range padded ids — the pad rows are sliced away)."""
        if n <= 0:
            return np.zeros((0, 4, 4), np.float32)
        if not hasattr(self, "_query_many"):
            cfg = self.step_cfg

            @jax.jit
            def query_many(params, pose_bank, pose_static, ids):
                return jax.vmap(
                    lambda i: step_mod.pose_of_frame(
                        cfg, params, pose_bank, pose_static, i))(ids)

            self._query_many = query_many
        n_pad = ((n + 31) // 32) * 32
        ids = jnp.arange(n_pad, dtype=jnp.int32)
        p34 = np.asarray(self._query_many(
            self.state.params, self.state.pose_bank, self.state.pose_static,
            ids))[:n]
        out = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        out[:, :3] = p34
        return out

    # ------------------------------------------------------------------
    # schedules (host)
    # ------------------------------------------------------------------
    def get_cos_anneal_ratio(self) -> float:
        if self.anneal_end == 0.0:
            return 1.0
        return min(1.0, self.iter_step / self.anneal_end)

    def main_lr(self) -> float:
        if self.iter_step < self.warm_up_end:
            factor = self.iter_step / self.warm_up_end
        else:
            alpha = self.learning_rate_alpha
            progress = ((self.iter_step - self.warm_up_end)
                        / (self.end_iter - self.warm_up_end))
            factor = (np.cos(np.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        return self.learning_rate * factor

    def seg_lrs(self, touched) -> np.ndarray:
        """Per-segment pose LR; touched segments advance their progress
        counter first (`exp_runner.py:1064-1087`)."""
        for s in touched:
            self.seg_progress[s] += 1
        # vectorized over segments (was a Python loop — O(S) per step at
        # reference scale S~300); same per-segment math
        if "_wo_global_conf" not in self.base_exp_dir:
            progress = self.seg_progress / max(self.max_pro_iteration, 1)
            alpha = self.pose_alpha
        else:
            progress = self.seg_progress / self.end_iter
            alpha = self.learning_rate_alpha
        factor = (np.cos(np.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        return (self.pose_lr * factor).astype(np.float32)

    # image replay permutations (`exp_runner.py:982-1041`)
    def get_image_perm(self):
        if self.progressive:
            if self.current_image > self.image_interval:
                prev_num = self.current_image - self.image_interval
                w = ([0.2 / prev_num] * prev_num
                     + [0.8 / self.image_interval] * self.image_interval)
                return self.rng.choice(self.current_image, self.current_image,
                                       p=w)
            return self.rng.permutation(self.current_image)
        return self.rng.permutation(self.dataset.n_images)

    def get_prev_image_perm(self):
        if self.current_image > self.flow_interval:
            return self.rng.permutation(self.current_image - self.flow_interval)
        return self.rng.permutation(self.current_image)

    def get_current_image_perm(self):
        if self.current_image > (self.image_interval - 1) + self.flow_interval:
            if self.flow_interval == 1:
                return (self.rng.permutation(self.image_interval)
                        + self.current_image - self.image_interval)
            prev_num = (self.current_image - (self.image_interval - 1)
                        - self.flow_interval)
            w = ([0.2 / (self.flow_interval - 1)] * (self.flow_interval - 1)
                 + [0.8 / self.image_interval] * self.image_interval)
            return self.rng.choice(len(w), len(w), p=w) + prev_num
        return self.rng.permutation(self.current_image)

    # ------------------------------------------------------------------
    def _sample_flow_pair(self, img_id_corr: int):
        """Pick a partner frame + batch of matches (`dataset.py:683-716`)."""
        d = self.dataset
        name_corr = d.index_to_frame[img_id_corr]
        if name_corr not in d.flow_pairs:
            return None
        pairs_idx = [d.frame_to_index[n] for n in d.flow_pairs[name_corr]]
        pairs_idx = [i for i in pairs_idx
                     if i < self.current_image
                     and abs(i - img_id_corr) <= self.flow_interval]
        if not pairs_idx:
            return None
        img_id = int(self.rng.choice(pairs_idx))
        xs1, ys1, xs2, ys2 = d.loftr_flows[
            f"{name_corr}_{d.index_to_frame[img_id]}"]
        if len(xs1) == 0:
            return None
        b2 = self.batch_size // 2
        sel = self.rng.choice(len(xs1), b2, replace=True)
        pixels_corr = np.stack([xs1[sel], ys1[sel]], -1).astype(np.float32)
        pixels = np.stack([xs2[sel], ys2[sel]], -1).astype(np.float32)
        return img_id, pixels, pixels_corr

    def _touched_segments(self, ids):
        return sorted({int(i) // self.image_interval for i in ids
                       if i is not None and i >= 0})

    def update_occ_grid(self):
        """Refresh the occupancy grid from the current SDF (device-side)."""
        from fmov_pose_tpu.render import occupancy
        if not hasattr(self, "_occ_pts"):
            self._occ_pts = jnp.asarray(
                occupancy.make_grid_points(self.occ_grid_res))
            sdf_cfg = self.model_cfg["sdf"]

            @jax.jit
            def occ_fn(sdf_params):
                sdf = nets.sdf_only(sdf_params, sdf_cfg, self._occ_pts)
                return occupancy.update_occ_grid(sdf, self.occ_grid_res)

            self._occ_fn = occ_fn
        new_grid = self._occ_fn(self.state.params["sdf"])
        ps = dict(self.state.pose_static)
        ps["occ_grid"] = new_grid
        self.state = self.state._replace(pose_static=ps)

    def reset_neus(self, seed=None):
        """Fresh SDF/color/NeRF/variance + optimizer, keep pose nets
        (`exp_runner.py:367-397`)."""
        self.reset_count = getattr(self, "reset_count", 0) + 1
        seed = int(self.rng.integers(1 << 30)) if seed is None else seed
        params = self._field_params(seed)
        if self.pose_mode == "gf":
            params["pose"] = self.state.params["pose"]
        elif self.pose_mode == "se3":
            params["se3_refine"] = self.state.params["se3_refine"]
        self.state = self.state._replace(
            params=params, opt=optim.adam_init(params),
            iter_step=jnp.zeros((), jnp.int32))
        if getattr(self, "occupancy_sampling", False):
            ps = dict(self.state.pose_static)
            ps["occ_grid"] = jnp.ones((self.occ_grid_res,) * 3, jnp.float32)
            self.state = self.state._replace(pose_static=ps)
        self.iter_step = 0
        self.mesh_warmup_step = self.conf.get_int("train.mesh_warmup_step", 0)

    # ------------------------------------------------------------------
    def _scan_eligible(self):
        """Non-progressive phases can run k steps per dispatch (lax.scan):
        every per-step decision is a pure function of iter_step."""
        if not self.conf.get_bool("train.scan_steps", True):
            return 0
        if (self.pose_mode not in ("fixed", "gf") or self.flow_weight > 0
                or self.progressive or self.maintain_shape
                or self.gradient_analysis or self.reset_based_on_rot
                or self.mesh_warmup_step > 0):
            return 0
        k = self.conf.get_int("train.scan_chunk", 100)
        freqs = [self.report_freq, self.val_freq, self.val_mesh_freq,
                 self.save_freq, self.pose_freq]
        if self.occupancy_sampling:
            freqs.append(self.occ_update_freq)
        if any(f % k for f in freqs) or self.iter_step % k:
            return 0
        return k

    def _train_scan(self, k):
        """Fast path: k jitted steps per host dispatch."""
        schedule = {
            "learning_rate": self.learning_rate,
            "learning_rate_alpha": self.learning_rate_alpha,
            "warm_up_end": self.warm_up_end, "end_iter": self.end_iter,
            "anneal_end": self.anneal_end,
            "mask_guided": 1.0 if self.mask_guided_sampling else 0.0,
        }
        if self.use_dp:
            from fmov_pose_tpu.parallel import dp
            scan = dp.make_dp_scan_photo_steps(
                self.step_cfg, self.images_dev, self.masks_dev,
                self.intr_inv_dev, self.bbox_dev, dp.make_mesh(), schedule,
                k, depths=self.depths_dev)
        else:
            scan = step_mod.make_scan_photo_steps(
                self.step_cfg, self.images_dev, self.masks_dev,
                self.intr_inv_dev, self.bbox_dev, schedule, k,
                depths=self.depths_dev)
        n_cur = jnp.asarray(self.current_image, jnp.int32)
        t_start = time.time()
        rays_done = 0
        while self.iter_step + k <= self.end_iter:
            self.state, metrics = scan(self.state, n_cur)
            self.iter_step += k
            rays_done += k * self.batch_size
            if self._prof is not None:
                self._prof.tick(k)
            if self.iter_step % self.report_freq == 0:
                m = {kk: float(v) for kk, v in metrics.items()}
                dt = time.time() - t_start
                LOG.info("iter %d loss=%.4f color=%.4f eik=%.4f psnr=%.2f "
                         "rays/s=%.0f (scan x%d)",
                         self.iter_step, m["loss"], m.get("color_loss", 0.0),
                         m.get("eikonal_loss", 0.0), m["psnr"],
                         rays_done / max(dt, 1e-9), k)
                if self.writer:
                    for kk, v in m.items():
                        self.writer.add_scalar(f"Loss/{kk}", v, self.iter_step)
            if self.iter_step % self.val_freq == 0:
                try:
                    self.validate_image()
                except Exception as e:
                    LOG.warning("validate_image failed: %s", e)
            if self.iter_step % self.pose_freq == 0:
                try:
                    self.validate_poses()
                except Exception as e:
                    LOG.warning("validate_poses failed: %s", e)
            if self.iter_step % self.val_mesh_freq == 0:
                try:
                    self.validate_mesh()
                except Exception as e:
                    LOG.warning("validate_mesh failed: %s", e)
            if (self.occupancy_sampling
                    and self.iter_step % self.occ_update_freq == 0):
                self.update_occ_grid()
            if self.iter_step % self.save_freq == 0 and self.iter_step > 0:
                self.save_checkpoint()
        self.save_checkpoint()

    def _train_planned(self, K):
        """Progressive/flow training with k host-planned steps per
        dispatch (step_mod.make_planned_steps).  Semantically identical
        to the per-step loop below — `_plan_step`/`_pro_tick`/
        `_maybe_regen_perms` are called in the same order consuming the
        same host RNG; the k packed rows + flow pixel batches ship as
        data in ONE transfer and run in one lax.scan.  Progressive
        events (admission, warm-up end, rotation reset) and occ/val/save
        boundaries always land on chunk edges; short chunks fall back to
        per-step dispatch (no recompile per tail length)."""
        self._init_perms()
        chunk = step_mod.make_planned_steps(
            self.step_cfg, self.images_dev, self.masks_dev,
            self.intr_inv_dev, self.bbox_dev, K, depths=self.depths_dev)
        zero_pix = np.zeros((self.batch_size // 2, 4), np.float32)
        freqs = [self.report_freq, self.val_freq, self.pose_freq,
                 self.val_mesh_freq, self.save_freq]
        if self.occupancy_sampling:
            freqs.append(self.occ_update_freq)
        rays_per_step = self.batch_size * (2 if self.maintain_shape else 1)
        t_start = time.time()
        rays_done = 0
        while self.iter_step < self.end_iter:
            gap = min(f - self.iter_step % f for f in freqs)
            budget = min(K, self.end_iter - self.iter_step, gap)
            rows, pixes, uses = [], [], []
            event = False
            for _ in range(budget):
                packed, use_flow, pixels_pair, _img = self._plan_step()
                rows.append(packed)
                uses.append(1.0 if use_flow else 0.0)
                pixes.append(pixels_pair if use_flow else zero_pix)
                self.iter_step += 1
                event = self._pro_tick()
                if event:
                    break
                self._maybe_regen_perms()
            k = len(rows)
            if k == K:
                self.state, metrics = chunk(
                    self.state, jnp.asarray(np.stack(rows)),
                    jnp.asarray(np.stack(pixes)),
                    jnp.asarray(uses, jnp.float32))
            else:  # event/boundary tail: per-step dispatch, no recompile
                for j in range(k):
                    if uses[j] > 0:
                        self.state, metrics = self.flow_step(
                            self.state, rows[j], pixes[j])
                    else:
                        self.state, metrics = self.photo_step(
                            self.state, rows[j])
            rays_done += k * rays_per_step
            if self._prof is not None:
                self._prof.tick(k)
            if event:
                self._pro_events()
                self._maybe_regen_perms()
            if (self.occupancy_sampling
                    and self.iter_step % self.occ_update_freq == 0):
                self.update_occ_grid()
            if self.iter_step % self.report_freq == 0:
                m = {kk: float(v) for kk, v in metrics.items()}
                dt = time.time() - t_start
                LOG.info("iter %d loss=%.4f psnr=%.2f rays/s=%.0f (plan x%d)",
                         self.iter_step, m["loss"], m["psnr"],
                         rays_done / max(dt, 1e-9), K)
                if self.writer:
                    for kk, v in m.items():
                        self.writer.add_scalar(f"Loss/{kk}", v, self.iter_step)
            if self.iter_step % self.val_freq == 0:
                try:
                    self.validate_image()
                except Exception as e:
                    LOG.warning("validate_image failed: %s", e)
            if self.iter_step % self.pose_freq == 0:
                try:
                    self.validate_poses()
                except Exception as e:
                    LOG.warning("validate_poses failed: %s", e)
            if self.iter_step % self.val_mesh_freq == 0:
                try:
                    self.validate_mesh()
                except Exception as e:
                    LOG.warning("validate_mesh failed: %s", e)
            if self.iter_step % self.save_freq == 0 and self.iter_step > 0:
                self.save_checkpoint()
            if "_wo_global_conf" not in self.base_exp_dir:
                if (self.pro_iteration == -1
                        and self.current_image == self.dataset.n_images):
                    self.validate_mesh()
                    self.save_checkpoint()
                    return
        self.save_checkpoint()

    _prof = None  # set per train() call; honors FMOV_PROFILE_DIR

    def train(self):
        if self.is_main:
            from tensorboardX import SummaryWriter
            self.writer = SummaryWriter(
                os.path.join(self.base_exp_dir, "logs"))
        self._prof = _StepProfiler()
        try:
            return self._train_dispatch()
        finally:
            self._prof.close()

    def _plan_eligible(self):
        """The progressive/flow per-step loop can batch k host-planned
        steps into one dispatch (step_mod.make_planned_steps): every
        per-step decision is planned host-side with zero device feedback;
        device reads (rotation reset, occ refresh) happen only at event
        boundaries, where chunks end. Off by default pending the on-chip
        measurement (train.plan_chunk > 1 enables)."""
        k = self.conf.get_int("train.plan_chunk", 1)
        if k <= 1 or self.use_dp or self.gradient_analysis:
            return 0
        return k

    def _train_dispatch(self):
        k_scan = self._scan_eligible()
        if k_scan:
            LOG.info("scan training: %d steps per dispatch", k_scan)
            return self._train_scan(k_scan)
        k_plan = self._plan_eligible()
        if k_plan:
            LOG.info("planned training: up to %d steps per dispatch", k_plan)
            return self._train_planned(k_plan)
        res_step = self.end_iter - self.iter_step
        self._init_perms()

        t_start = time.time()
        rays_done = 0
        for iter_i in range(res_step):
            packed, use_flow, pixels_pair, img_id = self._plan_step()

            if use_flow:
                self.state, metrics = self.flow_step(
                    self.state, packed, pixels_pair)
            else:
                self.state, metrics = self.photo_step(self.state, packed)

            self.iter_step += 1
            rays_done += self.batch_size * (2 if self.maintain_shape else 1)
            if self._prof is not None:
                self._prof.tick()

            if (self.occupancy_sampling
                    and self.iter_step % self.occ_update_freq == 0):
                self.update_occ_grid()

            if self.gradient_analysis and self.iter_step % self.report_freq == 1:
                try:
                    self.gradient_analysis_report(img_id)
                except Exception as e:
                    LOG.warning("gradient_analysis failed: %s", e)

            if self.iter_step % self.report_freq == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t_start
                LOG.info("iter %d loss=%.4f color=%.4f eik=%.4f psnr=%.2f "
                         "rays/s=%.0f dir=%s",
                         self.iter_step, m["loss"], m.get("color_loss", 0.0),
                         m.get("eikonal_loss", 0.0), m["psnr"],
                         rays_done / max(dt, 1e-9), self.base_exp_dir)
                if self.writer:
                    for k, v in m.items():
                        self.writer.add_scalar(f"Loss/{k}", v, self.iter_step)

            if self.iter_step % self.val_freq == 0:
                try:
                    self.validate_image()
                except Exception as e:  # keep training through viz errors
                    LOG.warning("validate_image failed: %s", e)
            if self.iter_step % self.pose_freq == 0:
                try:
                    self.validate_poses()
                except Exception as e:
                    LOG.warning("validate_poses failed: %s", e)

            self._progressive_update()

            if self.iter_step % self.val_mesh_freq == 0:
                try:
                    self.validate_mesh()
                except Exception as e:
                    LOG.warning("validate_mesh failed: %s", e)

            self._maybe_regen_perms()

            if self.iter_step % self.save_freq == 0 and self.iter_step > 0:
                self.save_checkpoint()

            if "_wo_global_conf" not in self.base_exp_dir:
                if (self.pro_iteration == -1
                        and self.current_image == self.dataset.n_images):
                    self.validate_mesh()
                    self.save_checkpoint()
                    return

        self.save_checkpoint()

    def _init_perms(self):
        if self.maintain_shape:
            self._image_perm = self.get_current_image_perm()
            self._prev_image_perm = self.get_prev_image_perm()
        else:
            self._image_perm = self.get_image_perm()
            self._prev_image_perm = None

    def _maybe_regen_perms(self):
        if self.iter_step % len(self._image_perm) == 0:
            self._image_perm = (self.get_current_image_perm()
                                if self.maintain_shape
                                else self.get_image_perm())
        if (self.maintain_shape
                and self.iter_step % len(self._prev_image_perm) == 0):
            self._prev_image_perm = self.get_prev_image_perm()

    def _plan_step(self):
        """Plan one training step: every host-side curriculum decision
        (frame draw, flow coin + LoFTR pair sampling, warm-up gates,
        per-segment touch/freeze/LR) packed into one scalar row.

        Shared verbatim by the per-step loop and the seg-mode scan
        planner, so the two dispatch strategies cannot drift.  Consumes
        host RNG; mutates only the one-shot ``mesh_warmup_step`` reset.
        Returns (packed, use_flow, pixels_pair, img_id).
        """
        in_warmup = self.iter_step < self.mesh_warmup_step
        use_flow = (self.flow_weight > 0.0 and self.rng.random() < 0.5
                    and not in_warmup)
        img_id = int(self._image_perm[self.iter_step % len(self._image_perm)])
        if self.remove_prev_matches:
            if (abs(img_id - self.current_image) >= self.flow_interval
                    or self.current_image == self.dataset.n_images):
                use_flow = False

        flow_data = None
        img_id_corr = None
        if use_flow:
            flow_data = self._sample_flow_pair(img_id)
            if flow_data is None:
                use_flow = False
            else:
                img_id_corr = img_id
                img_id = flow_data[0]

        pose_update = 1.0
        if in_warmup and self.pose_mode != "gf":
            pose_update = 0.0
            if self.reset_based_on_rot and self.prev_pose is not None:
                img_id = int(self.rng.integers(0, self.current_image))
            else:
                img_id = 0
        elif self.mesh_warmup_step > 0 and not in_warmup:
            self.mesh_warmup_step = 0  # warm-up over, re-enable pose nets

        add_img_id = 0
        if self.maintain_shape:
            add_img_id = int(self._prev_image_perm[
                self.iter_step % len(self._prev_image_perm)])
            if in_warmup and self.pose_mode != "gf":
                add_img_id = 0

        touched = self._touched_segments(
            [img_id, img_id_corr,
             add_img_id if self.maintain_shape else None])
        main_update = 1.0
        if (self.detach_mesh_at_warm_up
                and self.iter_step > self.mesh_warmup_step
                and self.pro_iteration < self.pro_warm_up_end
                and self.current_pose_mlp_index in touched):
            main_update = 0.0

        seg_touch = np.zeros((self.n_segments,), np.float32)
        for s in touched:
            if s < self.n_segments:
                seg_touch[s] = 1.0
        seg_lr = self.seg_lrs([s for s in touched if s < self.n_segments])

        trans_head_on = 1.0
        if (self.disable_trans_during_warm_up
                and self.pro_iteration < self.pro_warm_up_end):
            trans_head_on = 0.0

        packed = step_mod.pack_scalars_np(
            self.main_lr(), self.get_cos_anneal_ratio(), main_update,
            pose_update,
            1.0 if (self.mask_guided_sampling and not in_warmup) else 0.0,
            trans_head_on, img_id, add_img_id,
            img_id_corr if img_id_corr is not None else 0,
            seg_touch, self.seg_frozen, seg_lr)

        pixels_pair = None
        if use_flow:
            _, pixels, pixels_corr = flow_data
            pixels_pair = np.concatenate([pixels_corr, pixels], axis=-1)
        return packed, use_flow, pixels_pair, img_id

    def _progressive_update(self):
        """Frame admission / segment switch / warm-up / rotation reset
        (`exp_runner.py:860-947`)."""
        if self._pro_tick():
            self._pro_events()

    def _pro_tick(self):
        """Advance the progressive counter by one step; True when an event
        (admission or warm-up end) fires at the new count.  Pure host
        bookkeeping — the scan planner uses it to place chunk boundaries
        and defers :meth:`_pro_events` (which touches device state) to
        after the chunk's dispatch."""
        if not (self.pose_mode in ("seg", "seg_pixel")
                and self.pro_iteration >= 0
                and self.iter_step > self.mesh_warmup_step):
            return False
        self.pro_iteration += 1
        return (self.pro_iteration == self.max_pro_iteration
                or self.pro_iteration == self.pro_warm_up_end)

    def _pro_events(self):
        if self.pro_iteration == self.max_pro_iteration:
            self.pro_iteration = 0
            prev_image = self.current_image
            self.current_image = min(self.current_image + self.image_interval,
                                     self.dataset.n_images)
            if self.current_image > prev_image:
                if self.reset_based_on_rot:
                    if self.prev_pose is None:
                        self.prev_pose = self.query_pose(0)[:3, :3]
                    cur_pose = self.query_pose(prev_image - 1)[:3, :3]
                    rel = cur_pose @ np.linalg.inv(self.prev_pose)
                    if rotation_error_deg(rel) > self.reset_rot_threshold:
                        LOG.info("rotation reset at image %d", prev_image)
                        self.reset_neus()
                        self.prev_pose = cur_pose
                self.current_pose_mlp_index += 1
                # freeze all previous segments; new segment trains alone
                self.seg_frozen[:] = 0.0
                if self.current_pose_mlp_index < self.n_segments:
                    self.seg_frozen[self.current_pose_mlp_index] = 1.0
                    # lazy init of the new segment from the previous one
                    if self.pose_mode == "seg_pixel":
                        from fmov_pose_tpu.poses import pixel_pose as px
                        new_bank = px.seg_deep_initialize(
                            self.state.pose_bank, self.deep_pose_cfg,
                            self.image_interval, self.current_pose_mlp_index)
                    else:
                        new_bank = pp.seg_initialize(
                            self.state.pose_bank, self.pose_cfg,
                            self.image_interval, self.current_pose_mlp_index)
                    self.state = self.state._replace(pose_bank=new_bank)
            else:
                self.pro_iteration = -1  # all frames admitted
            LOG.info("admitted frames: %d (segment %d)", self.current_image,
                     self.current_pose_mlp_index)
        if self.pro_iteration == self.pro_warm_up_end:
            # unfreeze all previous segments after the new segment's warm-up
            self.seg_frozen[:self.current_pose_mlp_index + 1] = 1.0

    # ------------------------------------------------------------------
    # validation / export
    # ------------------------------------------------------------------
    def render_rays_chunked(self, rays_o, rays_d, chunk=None):
        chunk = chunk or self.batch_size
        n = rays_o.shape[0]
        pad = (-n) % chunk
        ro = np.concatenate([rays_o, np.zeros((pad, 3), np.float32)])
        rd = np.concatenate([rays_d, np.ones((pad, 3), np.float32)])
        outs = {"color_fine": [], "normal": [], "depth_fine": [],
                "weight_sum": []}
        render_params = {k: v for k, v in self.state.params.items()
                         if k in ("sdf", "color", "nerf", "variance")}
        key = jax.random.key(0)
        n_total = (self.model_cfg["renderer"].n_samples
                   + self.model_cfg["renderer"].n_importance)
        for i in range(0, n + pad, chunk):
            ro_b = jnp.asarray(ro[i:i + chunk])
            rd_b = jnp.asarray(rd[i:i + chunk])
            near, far = raygen.near_far_from_sphere(ro_b, rd_b)
            out = self._eval_render(key, render_params, ro_b, rd_b, near, far,
                                    jnp.asarray(self.get_cos_anneal_ratio()))
            outs["color_fine"].append(np.asarray(out["color_fine"]))
            outs["depth_fine"].append(np.asarray(out["depth_fine"]))
            outs["weight_sum"].append(np.asarray(out["weight_sum"]))
            normal = (np.asarray(out["gradients"])
                      * np.asarray(out["weights"])[:, :n_total, None]
                      * np.asarray(out["inside_sphere"])[..., None]).sum(1)
            outs["normal"].append(normal)
        return {k: np.concatenate(v)[:n] for k, v in outs.items()}

    def validate_image(self, idx=-1, resolution_level=-1, return_img=False):
        if idx < 0:
            idx = int(self.rng.integers(self.current_image))
        if resolution_level < 0:
            resolution_level = self.validate_resolution_level
        pose = self.query_pose(idx)[:3]
        rays_o, rays_d = raygen.gen_rays_grid(
            self.intr_inv_dev[idx], jnp.asarray(pose),
            self.dataset.H, self.dataset.W, resolution_level)
        H, W = rays_o.shape[:2]
        out = self.render_rays_chunked(
            np.asarray(rays_o).reshape(-1, 3), np.asarray(rays_d).reshape(-1, 3))
        img_fine = (out["color_fine"].reshape(H, W, 3) * 256).clip(0, 255)
        rot = np.linalg.inv(pose[:3, :3])
        normal_img = ((rot @ out["normal"].T).T.reshape(H, W, 3)
                      * 128 + 128).clip(0, 255)

        import cv2 as cv
        gt = self.dataset.image_at(idx, resolution_level)
        stacked = np.concatenate([img_fine, gt])
        if return_img:
            return stacked
        if self.is_main:
            os.makedirs(os.path.join(self.base_exp_dir, "validations_fine"),
                        exist_ok=True)
            os.makedirs(os.path.join(self.base_exp_dir, "normals"),
                        exist_ok=True)
            tag = f"{self.current_image:08d}_{self.iter_step:08d}_0_{idx}.png"
            cv.imwrite(
                os.path.join(self.base_exp_dir, "validations_fine", tag),
                stacked.astype(np.uint8))
            cv.imwrite(os.path.join(self.base_exp_dir, "normals", tag),
                       normal_img.astype(np.uint8))
        psnr = float(10 * np.log10(
            255.0**2 / max(((img_fine - gt) ** 2).mean(), 1e-9)))
        return psnr

    def validate_poses(self, save_pose=False, only_align=False):
        """ATE/RPE of learned vs annotated poses (`exp_runner.py:1146-1271`)."""
        d = self.dataset
        pose_all = self.query_poses(self.current_image)
        gt_list, learned = [], []
        if len(d.gt_poses) > 0:
            for i, frame_idx in enumerate(d.avai_ann_frame):
                if frame_idx >= self.current_image:
                    break
                gt_list.append(d.gt_poses[i])
                learned.append(pose_all[frame_idx])
        if not gt_list:
            return float("inf"), float("inf"), float("inf"), None, pose_all
        if len(gt_list) < 2:
            LOG.warning("only %d annotated frame(s) below current_image=%d — "
                        "ATE needs >=2 pose pairs (Umeyama is degenerate)",
                        len(gt_list), self.current_image)
            return float("inf"), float("inf"), float("inf"), None, pose_all
        gt = np.stack(gt_list)
        est = np.stack(learned)
        try:
            est_aligned = evalpose.align_ate_c2b_use_a2b(est, gt)
            ate = evalpose.compute_ATE(gt, est_aligned)
            rpe_trans, rpe_rot = evalpose.compute_rpe(gt, est_aligned)
        except Exception as e:
            LOG.warning("pose alignment failed: %s", e)
            return float("inf"), float("inf"), float("inf"), gt, est
        LOG.info("ate=%.5f rpe_trans=%.5f rpe_rot=%.4f deg", ate, rpe_trans,
                 np.rad2deg(rpe_rot))
        if self.writer:
            self.writer.add_scalar("Pose/ate", ate, self.iter_step)
            self.writer.add_scalar("Pose/rpe_trans", rpe_trans, self.iter_step)
            self.writer.add_scalar("Pose/rpe_rot", rpe_rot, self.iter_step)
        pose_dir = os.path.join(self.base_exp_dir, "poses")
        if not self.is_main:  # multi-host: rank 0 owns the pose artifacts
            return ate, rpe_trans, rpe_rot, gt, est
        os.makedirs(pose_dir, exist_ok=True)
        try:
            from fmov_pose_tpu.pipeline import vis
            vis.vis_poses(
                est_aligned, gt, self.dataset.H, self.dataset.W,
                float(d.intrinsics_all[0][0, 0]), float(d.intrinsics_all[0][1, 1]),
                os.path.join(pose_dir,
                             f"aligned_pose_{self.current_image:06d}_"
                             f"{self.iter_step:06d}_{ate:.5f}.png"))
        except Exception as e:
            LOG.warning("vis_poses failed: %s", e)
        if save_pose:
            arr_dir = os.path.join(self.base_exp_dir, "poses_arr")
            os.makedirs(arr_dir, exist_ok=True)
            np.save(os.path.join(arr_dir, f"pred_poses_{self.iter_step}.npy"),
                    est)
            np.save(os.path.join(arr_dir, "gt_poses.npy"), gt)
        try:
            from fmov_pose_tpu.pipeline import report
            trans_err = np.linalg.norm(
                gt[:, :3, 3] - est_aligned[:len(gt), :3, 3], axis=-1)
            report.write_metrics(
                os.path.join(pose_dir, f"stats_{self.iter_step:06d}"),
                {"ate_rmse": ate, "rpe_trans": rpe_trans,
                 "rpe_rot_deg": float(np.rad2deg(rpe_rot)),
                 "trans_error": report.compute_statistics(trans_err)})
        except Exception as e:
            LOG.warning("metric report failed: %s", e)
        return ate, rpe_trans, rpe_rot, gt, est

    def validate_mesh(self, world_space=False, resolution=64, threshold=0.0,
                      use_norml_color=False, mesh_scale=1.0):
        bound_min = np.asarray(self.dataset.object_bbox_min) * mesh_scale
        bound_max = np.asarray(self.dataset.object_bbox_max) * mesh_scale
        query = geometry.make_sdf_query(self.state.params, self.model_cfg)
        vertices, triangles = geometry.extract_geometry(
            bound_min, bound_max, resolution, threshold, query)
        if self.is_main:
            os.makedirs(os.path.join(self.base_exp_dir, "meshes"),
                        exist_ok=True)
        if world_space and len(self.dataset.scale_mats_np):
            sm = self.dataset.scale_mats_np[0]
            vertices = vertices * sm[0, 0] + sm[:3, 3][None]
        colors = None
        if use_norml_color and len(vertices):
            grads = []
            chunk = 16384
            for i in range(0, len(vertices), chunk):
                g = nets.sdf_gradient(
                    self.state.params["sdf"], self.model_cfg["sdf"],
                    jnp.asarray(vertices[i:i + chunk], jnp.float32))
                grads.append(np.asarray(g))
            grads = np.concatenate(grads)
            grads = grads / (np.linalg.norm(grads, axis=-1, keepdims=True) + 1e-9)
            colors = (grads + 1) / 2
        step_tag = self.iter_step - (self.iter_step % self.val_mesh_freq)
        name = (f"{self.current_image:08d}_{step_tag:08d}_{resolution}_"
                f"{self.mode}.ply")
        path = os.path.join(self.base_exp_dir, "meshes", name)
        if self.is_main:
            meshio.write_ply(path, vertices, triangles, vertex_colors=colors)
            LOG.info("mesh saved: %s (%d verts)", path, len(vertices))
        if len(vertices) == 0:
            LOG.warning("extracted mesh is EMPTY: the SDF has no zero "
                        "crossing inside the bound yet (undertrained or "
                        "diverged field)")
        return path

    def render_novel_image(self, idx_0, idx_1, ratio, resolution_level):
        """Slerp-interpolated novel view (`exp_runner.py:1579-1621`)."""
        from scipy.spatial.transform import Rotation as Rot
        from scipy.spatial.transform import Slerp
        pose_0 = np.linalg.inv(self.query_pose(idx_0))
        pose_1 = np.linalg.inv(self.query_pose(idx_1))
        rots = Rot.from_matrix(np.stack([pose_0[:3, :3], pose_1[:3, :3]]))
        rot = Slerp([0, 1], rots)(ratio)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = rot.as_matrix()
        pose[:3, 3] = ((1.0 - ratio) * pose_0 + ratio * pose_1)[:3, 3]
        pose = np.linalg.inv(pose)
        rays_o, rays_d = raygen.gen_rays_grid(
            self.intr_inv_dev[0], jnp.asarray(pose[:3]),
            self.dataset.H, self.dataset.W, resolution_level)
        H, W = rays_o.shape[:2]
        out = self.render_rays_chunked(
            np.asarray(rays_o).reshape(-1, 3), np.asarray(rays_d).reshape(-1, 3))
        return (out["color_fine"].reshape(H, W, 3) * 256).clip(0, 255).astype(
            np.uint8)

    def interpolate_view(self, img_idx_0, img_idx_1, n_frames=60):
        import cv2 as cv
        images = []
        for i in range(n_frames):
            ratio = np.sin(((i / n_frames) - 0.5) * np.pi) * 0.5 + 0.5
            images.append(self.render_novel_image(
                img_idx_0, img_idx_1, ratio, resolution_level=4))
        images += images[::-1]
        video_dir = os.path.join(self.base_exp_dir, "render")
        os.makedirs(video_dir, exist_ok=True)
        h, w, _ = images[0].shape
        writer = cv.VideoWriter(
            os.path.join(video_dir,
                         f"{self.iter_step:08d}_{img_idx_0}_{img_idx_1}.mp4"),
            cv.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
        for img in images:
            writer.write(img.astype(np.uint8))
        writer.release()

    # ------------------------------------------------------------------
    # extended eval / visualization modes
    # ------------------------------------------------------------------
    def rays_from_mask(self, idx: int, pose, resolution_level=1):
        """Ray grid over the (uncropped-frame) mask bbox
        (`dataset.py:578-632`). Returns rays_o, rays_d, ys, xs, p_norm."""
        d = self.dataset
        if not d.crop:
            mask = d.masks_np[idx][:, :, 0]
            shift = (0.0, 0.0)
        else:
            import cv2 as cv
            mask_dir = os.path.join(d.data_dir.replace("_ori", ""), "mask_obj")
            path = os.path.join(mask_dir, d.index_to_frame[idx] + ".png")
            if os.path.exists(path):
                mask = cv.imread(path, cv.IMREAD_UNCHANGED) / 255.0
                if mask.ndim == 3:
                    mask = mask[..., 0]
            else:
                mask = d.masks_np[idx][:, :, 0]
            M = d.crop_transforms[d.index_to_frame[idx]]
            shift = (M[0, 2], M[1, 2])
        ys, xs = np.where(mask > 0.5)
        if len(ys) == 0:
            return None
        y0, y1 = max(ys.min() - 5, 0), min(ys.max() + 5, d.H - 1)
        x0, x1 = max(xs.min() - 5, 0), min(xs.max() + 5, d.W - 1)
        x0, x1 = x0 + shift[0], x1 + shift[0]
        y0, y1 = y0 + shift[1], y1 + shift[1]
        l = resolution_level
        tx = np.linspace(x0, x1, max(int(x1 - x0) // l, 2)).astype(np.int64)
        ty = np.linspace(y0, y1, max(int(y1 - y0) // l, 2)).astype(np.int64)
        px, py = np.meshgrid(tx, ty, indexing="xy")
        rays_o, rays_v, p_norm = raygen.pixels_to_rays(
            jnp.asarray(px.reshape(-1), jnp.float32),
            jnp.asarray(py.reshape(-1), jnp.float32),
            self.intr_inv_dev[idx], jnp.asarray(pose[:3], jnp.float32))
        return (np.asarray(rays_o), np.asarray(rays_v),
                py.reshape(-1), px.reshape(-1), np.asarray(p_norm))

    def render_poses(self, resolution_level=1, reduce_res=2, wo_normal=False):
        """Final visualization (`exp_runner.py:1792-2024`): project the
        mesh's oriented bbox wireframe through each learned pose onto each
        frame, render per-frame normal maps, write jpgs + gif."""
        import cv2 as cv

        mesh_dir = os.path.join(self.base_exp_dir, "meshes")
        plys = sorted(os.listdir(mesh_dir)) if os.path.isdir(mesh_dir) else []
        if not plys:
            self.validate_mesh()
            plys = sorted(os.listdir(mesh_dir))
        verts, _tris = meshio.read_ply(os.path.join(mesh_dir, plys[-1]))
        lo, hi = verts.min(0), verts.max(0)
        corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                            for y in (lo[1], hi[1]) for z in (lo[2], hi[2])])
        box_edges = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7),
                     (6, 7), (0, 4), (1, 5), (2, 6), (3, 7)]

        pose_dir = os.path.join(self.base_exp_dir, "pose_vis")
        normal_dir = os.path.join(self.base_exp_dir, "normal_vis")
        os.makedirs(pose_dir, exist_ok=True)
        os.makedirs(normal_dir, exist_ok=True)
        frames = []
        for i in range(self.dataset.n_images):
            pose = self.query_pose(i)
            img = self.dataset.image_at(i, resolution_level)
            img = cv.cvtColor(img.astype(np.uint8), cv.COLOR_BGR2RGB)
            obj_pose = np.linalg.inv(pose)
            rvec = cv.Rodrigues(obj_pose[:3, :3].astype(np.float64))[0]
            tvec = obj_pose[:3, 3].astype(np.float64)
            K = self.dataset.intrinsics_all[i][:3, :3].astype(np.float64)
            pts2d, _ = cv.projectPoints(corners.astype(np.float64), rvec,
                                        tvec, K, None)
            pts2d = (pts2d[:, 0] / resolution_level).astype(int)
            for a, b in box_edges:
                cv.line(img, tuple(pts2d[a]), tuple(pts2d[b]), (0, 255, 0), 2)
            cv.imwrite(os.path.join(
                pose_dir, f"{self.dataset.index_to_frame[i]}.jpg"),
                cv.cvtColor(img, cv.COLOR_RGB2BGR))

            if not wo_normal:
                rm = self.rays_from_mask(i, pose, resolution_level=1)
                if rm is not None:
                    ro, rv, ys, xs, _ = rm
                    out = self.render_rays_chunked(ro, rv)
                    rot = np.linalg.inv(pose[:3, :3])
                    normals = (rot @ out["normal"].T).T
                    vis_mask = out["weight_sum"][:, 0] > 0.5
                    nimg = np.ones((self.dataset.H, self.dataset.W, 3))
                    ysv = np.clip(ys[vis_mask], 0, self.dataset.H - 1)
                    xsv = np.clip(xs[vis_mask], 0, self.dataset.W - 1)
                    nimg[ysv, xsv] = normals[vis_mask]
                    nimg = ((nimg * 128 + 128).clip(0, 255)).astype(np.uint8)
                    cv.imwrite(os.path.join(
                        normal_dir, f"{self.dataset.index_to_frame[i]}.jpg"),
                        nimg)
            frames.append(img)
        try:
            import imageio
            imageio.mimsave(
                os.path.join(self.base_exp_dir,
                             f"poses_{self.iter_step}.gif"), frames, fps=5)
        except Exception as e:
            LOG.warning("gif export failed: %s", e)
        return pose_dir

    def validate_all_images(self, resolution_level=4):
        """Render up to 10 evenly spaced frames into imgs.gif
        (`exp_runner.py:1564-1577`)."""
        import cv2 as cv
        import imageio
        n = self.dataset.n_images
        idxs = (np.arange(n) if n < 10
                else np.linspace(0, n - 1, 10, dtype=int))
        imgs = []
        for i in idxs:
            img = self.validate_image(int(i), resolution_level=resolution_level,
                                      return_img=True)
            imgs.append(cv.cvtColor(img.astype(np.uint8), cv.COLOR_BGR2RGB))
        imageio.mimsave(os.path.join(self.base_exp_dir, "imgs.gif"), imgs,
                        fps=2)

    def save_alignment_materials(self, step=4, align_dir=None):
        """Back-project rendered depth through annotated frames to world
        points for cross-run alignment (`exp_runner.py:1742-1790`)."""
        d = self.dataset
        ids = d.avai_ann_frame if len(d.avai_ann_frame) else list(
            range(d.n_images))
        world_pts = []
        for i in ids[::max(len(ids) // step, 1)]:
            pose = self.query_pose(i)
            rm = self.rays_from_mask(i, pose)
            if rm is None:
                continue
            ro, rv, ys, xs, p_norm = rm
            out = self.render_rays_chunked(ro, rv)
            depths = out["depth_fine"][:, 0] / p_norm[:, 0]
            K = d.intrinsics_all[i][:3, :3]
            xy_hom = np.stack([xs, ys, np.ones_like(xs)], 0).astype(np.float64)
            cam = (np.linalg.inv(K) @ xy_hom).T * depths[:, None]
            cam_h = np.concatenate([cam, np.ones((len(cam), 1))], 1)
            world_pts.append((pose @ cam_h.T).T)
        world_pts = np.concatenate(world_pts, 0)
        path = (os.path.join(align_dir, f"{self.case}_world_pts_3D.npy")
                if align_dir else
                os.path.join(self.base_exp_dir, "world_pts_3D.npy"))
        np.save(path, world_pts)
        return path

    def gradient_analysis_report(self, img_id=0):
        """Per-loss gradient magnitude stats (`exp_runner.py:36-44,
        726-769`): one value_and_grad per loss term, logged per network."""
        from fmov_pose_tpu.train.step import (StepScalars, pose_of_frame,
                                              _render_and_losses)
        import jax as _jax

        cfg = self.step_cfg
        scalars = StepScalars(
            lr=jnp.asarray(0.0), cos_anneal=jnp.asarray(1.0),
            main_update=jnp.asarray(1.0), pose_update=jnp.asarray(1.0),
            mask_guided=jnp.asarray(0.0),
            seg_touch=jnp.zeros((self.n_segments,)),
            seg_freeze=jnp.ones((self.n_segments,)),
            seg_lr=jnp.zeros((self.n_segments,)),
            trans_head_on=jnp.asarray(1.0))

        def per_loss(params, key_name):
            pose0 = pose_of_frame(cfg, params, self.state.pose_bank,
                                  self.state.pose_static,
                                  jnp.asarray(img_id, jnp.int32))
            data = raygen.gen_random_rays(
                jax.random.key(0), self.images_dev, self.masks_dev,
                self.intr_inv_dev, pose0, jnp.asarray(img_id, jnp.int32),
                self.batch_size, self.bbox_dev, cfg.mask_guided_patch_size,
                False, cfg.H, cfg.W)
            _total, metrics = _render_and_losses(
                cfg, jax.random.key(1), params, self.state.pose_bank,
                self.state.pose_static, data, scalars)
            return metrics[key_name]

        report = {}
        for name in ("color_loss", "eikonal_loss", "mask_loss"):
            grads = _jax.grad(lambda p: per_loss(p, name))(self.state.params)
            stats = {}
            for net in ("sdf", "color", "nerf", "variance"):
                if net in grads:
                    leaves = _jax.tree_util.tree_leaves(grads[net])
                    vals = np.concatenate(
                        [np.abs(np.asarray(l)).reshape(-1) for l in leaves])
                    stats[net] = (float(vals.min()), float(vals.max()),
                                  float(vals.mean()))
            report[name] = stats
            if self.writer:
                for net, (mn, mx, mean) in stats.items():
                    self.writer.add_scalar(
                        f"Gradients/{name}_mean_{net}", mean, self.iter_step)
        for name, stats in report.items():
            LOG.info("gradient_analysis %s: %s", name, stats)
        return report

    # ------------------------------------------------------------------
    def save_checkpoint(self):
        host_meta = {
            "iter_step": self.iter_step,
            "current_image": self.current_image,
            "current_pose_mlp_index": self.current_pose_mlp_index,
            "pro_iteration": self.pro_iteration,
            "prev_pose": self.prev_pose,
            "seg_progress": self.seg_progress,
            "seg_frozen": self.seg_frozen,
            "mesh_warmup_step": self.mesh_warmup_step,
        }
        path = os.path.join(
            self.base_exp_dir, "checkpoints",
            f"ckpt_{self.current_image:06d}_{self.iter_step:06d}.ckpt")
        if not self.is_main:  # multi-host: process 0 owns the file
            return
        ckpt.save_checkpoint(path, self.state, host_meta)
        LOG.info("checkpoint saved: %s", path)

    def load_checkpoint(self, path):
        state_tree, meta = ckpt.load_checkpoint(path)
        self.state = jax.tree_util.tree_map(jnp.asarray, state_tree)
        # NamedTuple structure survives pickling; rebuild defensively
        if not isinstance(self.state, step_mod.TrainState):
            self.state = step_mod.TrainState(*self.state)
        # the PRNG key was stored as raw uint32 data
        self.state = self.state._replace(
            key=jax.random.wrap_key_data(self.state.key))
        # pre-flat-Adam checkpoints stored params-shaped moment trees
        self.state = self.state._replace(
            opt=optim.ensure_flat_adam(self.state.opt))
        if isinstance(self.state.pose_opt, optim.SegAdamState):
            self.state = self.state._replace(
                pose_opt=optim.ensure_flat_seg_adam(self.state.pose_opt))
        if jax.process_count() > 1 and getattr(self, "mesh", None) is not None:
            from fmov_pose_tpu.parallel import dp
            self.state = dp.replicate_tree(self.mesh, self.state)
        self.iter_step = int(meta["iter_step"])
        self.current_image = int(meta["current_image"])
        self.current_pose_mlp_index = int(meta["current_pose_mlp_index"])
        self.pro_iteration = int(meta["pro_iteration"])
        self.prev_pose = meta["prev_pose"]
        self.seg_progress = np.asarray(meta["seg_progress"])
        self.seg_frozen = np.asarray(meta["seg_frozen"])
        self.mesh_warmup_step = int(meta.get("mesh_warmup_step", 0))
        LOG.info("restored %s (iter %d, image %d)", path, self.iter_step,
                 self.current_image)

    def file_backup(self):
        if not self.is_main:  # multi-host: rank 0 owns the recording copy
            return
        rec_dir = os.path.join(self.base_exp_dir, "recording")
        os.makedirs(rec_dir, exist_ok=True)
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        pkg = os.path.join(repo_root, "fmov_pose_tpu")
        for root, _dirs, files in os.walk(pkg):
            if "_build" in root or "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py") or fn.endswith(".cpp"):
                    rel = os.path.relpath(os.path.join(root, fn), repo_root)
                    dst = os.path.join(rec_dir, rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.copyfile(os.path.join(root, fn), dst)
        try:
            shutil.copyfile(self.conf_path, os.path.join(rec_dir, "config.conf"))
        except OSError:
            pass

    # ------------------------------------------------------------------
    def save_poses(self):
        """Export pred/gt poses + intrinsics + crop transforms
        (`exp_runner.py:1273-1307`)."""
        self.current_image = max(self.current_image - 10, 1)
        self.validate_poses()
        pose_dir = os.path.join(self.base_exp_dir, "poses")
        os.makedirs(pose_dir, exist_ok=True)
        poses = self.query_poses(self.current_image)
        np.save(os.path.join(pose_dir, f"pred_poses_{self.iter_step}.npy"),
                poses)
        if len(self.dataset.gt_poses):
            np.save(os.path.join(pose_dir, "gt_poses.npy"),
                    self.dataset.gt_poses)
        np.save(os.path.join(pose_dir, "intrinsics.npy"),
                self.dataset.intrinsics_all)
        if self.dataset.crop:
            tm = np.stack([self.dataset.crop_transforms[
                self.dataset.index_to_frame[i]] for i in range(len(poses))])
            np.save(os.path.join(pose_dir, "transform_matrixs.npy"), tm)
        return pose_dir

    def save_poses_simple(self, align_dir=None):
        poses = {}
        for i in range(self.current_image):
            poses[self.dataset.index_to_frame[i]] = self.query_pose(i)
        save_path = (os.path.join(align_dir, f"{self.case}_poses.npy")
                     if align_dir else
                     os.path.join(self.base_exp_dir,
                                  f"poses_{self.iter_step}.npy"))
        np.save(save_path, poses)
        return save_path

    def save_aligned_poses(self, save_dataset=True, normalize_trans=True,
                           tgt_dir=None, save_meta=True, global_mask_dir=None):
        """Phase transition: map virtual poses to the real camera via
        mesh + PnP and emit the phase-2 dataset (`exp_runner.py:1333-1412`)."""
        from fmov_pose_tpu.pipeline import align
        if self.current_image != self.dataset.n_images:
            self.current_image = max(self.current_image - 10, 1)
        poses, img_names = [], []
        for i in range(self.current_image):
            poses.append(self.query_pose(i))
            img_names.append(self.dataset.index_to_frame[i])
        poses = np.stack(poses)
        Ks = self.dataset.intrinsics_all
        if self.dataset.crop:
            transform_matrixs = np.stack(
                [self.dataset.crop_transforms[n] for n in img_names])
        else:
            transform_matrixs = None
        mesh_path = os.path.join(
            self.base_exp_dir, "meshes",
            f"{self.current_image:08d}_"
            f"{self.iter_step - (self.iter_step % self.val_mesh_freq):08d}_"
            f"64_train.ply")
        if not os.path.exists(mesh_path):
            mesh_path = self.validate_mesh()
        case = self.case.split("_")[0]
        ml_intr = self.conf.get("dataset.ml_camera_intrinsics", "")
        ori_cam_path = (None if ml_intr else
                        f"./data/HO3Dv3/ann/{case}.npz")
        fn = align.align_poses if self.dataset.crop else \
            align.align_poses_wo_virtual
        fn(ori_cam_path, mesh_path, poses, Ks, transform_matrixs,
           self.base_exp_dir, img_names, self.iter_step, case,
           H=self.dataset.H, W=self.dataset.W,
           save_dataset=save_dataset, normalize_trans=normalize_trans,
           tgt_dir=tgt_dir, save_meta=save_meta,
           global_mask_dir=global_mask_dir,
           data_root=os.path.dirname(
               os.path.dirname(self.dataset.data_dir.rstrip("/"))))
