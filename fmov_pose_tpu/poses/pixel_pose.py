"""Pixel-level pose MLPs: deep 8x256 per-frame pose network + segment bank.

TPU re-design of `/root/reference/models/pixel_pose.py`:

* `get_rotation_matrix_from_ortho6d` — continuous 6D rotation rep.
* `DeepPixelPose` (`pixel_pose.py:126-347`): NeRF-style 8x256 relu MLP
  with skip, camera-id encodings (position PE / gaussian fourier /
  fixed embedding), output inits (zero / direct / small_weight), optional
  per-pixel conditioning on camera-space points (`input_pts`) — used
  frame-level with disable_pts=True by the seg wrapper.
* `SegDeepPixelPose` (`pixel_pose.py:350-388`): bank of per-segment
  DeepPixelPose MLPs (enabled via model.pixel_level=true), same stacked
  design / lazy init / freeze-mask mechanics as the picture-level bank.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST
import numpy as np

from fmov_pose_tpu.core.embedder import fourier_features, positional_encode
from fmov_pose_tpu.core.lie import make_c2w
from fmov_pose_tpu.core.pose import to_4x4

Params = Dict[str, Any]


def rotation_from_ortho6d(ortho6d: jnp.ndarray) -> jnp.ndarray:
    """Continuous 6D -> SO(3) (`pixel_pose.py:11-24`)."""
    x_raw, y_raw = ortho6d[..., 0:3], ortho6d[..., 3:6]
    x = x_raw / (jnp.linalg.norm(x_raw, axis=-1, keepdims=True) + 1e-12)
    z = jnp.cross(x, y_raw)
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


class DeepPoseCfg(NamedTuple):
    D: int = 8
    W: int = 256
    skips: tuple = (4,)
    x_multires: int = 10
    t_multires: int = 10
    rot_type: str = "angle"
    output_init: str = "small_weight"
    cam_id_encoding: str = "position"
    fourier_embed_dim: int = 128
    disable_pts: bool = True
    n_images: int = 1


def _t_feature_dim(cfg: DeepPoseCfg) -> int:
    if cfg.cam_id_encoding == "original_fourier":
        return 512
    if cfg.cam_id_encoding == "fourier":
        return cfg.fourier_embed_dim * 2
    if cfg.cam_id_encoding == "position":
        return 1 * (1 + 2 * cfg.t_multires)
    if cfg.cam_id_encoding == "embedding":
        return 128
    raise NotImplementedError(cfg.cam_id_encoding)


def _kaiming(rng, d_in, d_out):
    bound = 1.0 / math.sqrt(d_in)
    return {
        "w": rng.uniform(-bound, bound, (d_out, d_in)).astype(np.float32),
        "b": rng.uniform(-bound, bound, (d_out,)).astype(np.float32),
    }


def init_deep_pose(seed: int, cfg: DeepPoseCfg, init_c2w: np.ndarray,
                   as_np: bool = False) -> Params:
    """Built HOST-side (numpy) and transferred once — the per-leaf device
    init was ~2(D+1) tiny H2D transfers per call, which multiplies by S in
    init_seg_deep_bank (thousands at reference-scale sequences).  RNG draw
    order is unchanged, so banks/checkpoints are bitwise-identical."""
    rng = np.random.default_rng(seed)
    in_x = 3 * (1 + 2 * cfg.x_multires)
    in_ch = in_x + _t_feature_dim(cfg)
    layers = [_kaiming(rng, in_ch, cfg.W)]
    for i in range(cfg.D - 1):
        d_in = cfg.W + in_ch if i in cfg.skips else cfg.W
        layers.append(_kaiming(rng, d_in, cfg.W))
    out_dim = 6 if cfg.rot_type == "angle" else 9
    out = _kaiming(rng, cfg.W, out_dim)
    if cfg.output_init == "zero":
        out = {"w": np.zeros_like(out["w"]), "b": np.zeros_like(out["b"])}
    elif cfg.output_init == "small_weight":
        out = {"w": rng.normal(0, 0.01, out["w"].shape).astype(np.float32),
               "b": np.zeros_like(out["b"])}
    elif cfg.output_init == "direct":
        bias = np.zeros(out_dim, np.float32)
        bias[3:6] = np.asarray(init_c2w)[0, :3, 3] if init_c2w.ndim == 3 \
            else np.asarray(init_c2w)[:3, 3]
        out = {"w": np.zeros_like(out["w"]), "b": bias}

    static: Dict[str, Any] = {
        "init_c2w": np.asarray(
            init_c2w if init_c2w.ndim == 3 else init_c2w[None], np.float32)}
    if cfg.cam_id_encoding == "fourier":
        static["t_bands"] = rng.normal(
            0, 1.0 / (4 * cfg.n_images),
            (cfg.fourier_embed_dim, 1)).astype(np.float32)
    elif cfg.cam_id_encoding == "original_fourier":
        static["t_bands"] = rng.normal(0, 10.0, (256, 1)).astype(np.float32)
    elif cfg.cam_id_encoding == "embedding":
        static["t_embed"] = rng.normal(
            0, 1.0, (cfg.n_images, 128)).astype(np.float32)
    train = {f"lin{i}": p for i, p in enumerate(layers)}
    train["out"] = out
    params = {"train": train, "static": static}
    if as_np:
        return params
    return jax.tree_util.tree_map(jnp.asarray, params)


def _t_features(cfg: DeepPoseCfg, static, cam_id):
    cam_f = jnp.asarray(cam_id, jnp.float32)
    if cfg.cam_id_encoding == "fourier":
        return fourier_features(cam_f[None, None], static["t_bands"])[0] \
            * jnp.sqrt(jnp.asarray(static["t_bands"].shape[0], jnp.float32))
    if cfg.cam_id_encoding == "original_fourier":
        ang = (2.0 * jnp.pi * cam_f) * static["t_bands"][:, 0]
        feats = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)])
        return feats / jnp.sqrt(jnp.asarray(256.0))
    if cfg.cam_id_encoding == "embedding":
        return static["t_embed"][jnp.asarray(cam_id, jnp.int32)]
    # position PE on normalized id (`pixel_pose.py:268-271`)
    t = cam_f / cfg.n_images
    return positional_encode(t[None, None], cfg.t_multires)[0]


def deep_pose_apply(params: Params, cfg: DeepPoseCfg, cam_id,
                    input_pts=None) -> jnp.ndarray:
    """Frame-level (disable_pts) or per-pixel pose. Returns [3, 4] or
    [B, 3, 4]."""
    static = params["static"]
    t_feat = _t_features(cfg, static, cam_id)
    if cfg.disable_pts or input_pts is None:
        pts = jnp.zeros((1, 3))
        x_feat = positional_encode(pts, cfg.x_multires)
        feats = jnp.concatenate([x_feat, t_feat[None]], axis=-1)
    else:
        x_feat = positional_encode(input_pts, cfg.x_multires)
        t_rep = jnp.broadcast_to(t_feat, input_pts.shape[:-1] + t_feat.shape)
        feats = jnp.concatenate([x_feat, t_rep], axis=-1)

    h = feats
    for i in range(cfg.D):
        p = params["train"][f"lin{i}"]
        h = jax.nn.relu(h @ p["w"].T + p["b"])
        if i in cfg.skips:
            h = jnp.concatenate([feats, h], axis=-1)
    out = params["train"]["out"]
    pred = h @ out["w"].T + out["b"]

    if cfg.output_init == "direct":
        pred = pred.at[..., :3].set(jnp.tanh(pred[..., :3]) * jnp.pi / 18)
    if cfg.rot_type == "angle":
        c2w = make_c2w(pred[..., :3].reshape(-1, 3),
                       pred[..., 3:].reshape(-1, 3))
    else:
        R = rotation_from_ortho6d(pred[..., :6]).reshape(-1, 3, 3)
        c2w = jnp.concatenate([R, pred[..., 6:9].reshape(-1, 3, 1)], axis=-1)

    if cfg.output_init != "direct":
        init_bank = static["init_c2w"]
        idx = jnp.minimum(jnp.asarray(cam_id, jnp.int32),
                          init_bank.shape[0] - 1)
        c2w = jnp.matmul(c2w, init_bank[idx], precision=_HI)

    if cfg.disable_pts or input_pts is None:
        return c2w[0]
    return c2w.reshape(input_pts.shape[:-1] + (3, 4))


# ---------------------------------------------------------------------------
# segment bank (SegDeepPixelPose)
# ---------------------------------------------------------------------------


def init_seg_deep_bank(seed: int, cfg: DeepPoseCfg, n_images: int,
                       segment_img_num: int, init_c2w: np.ndarray) -> Params:
    from fmov_pose_tpu.poses.picture_pose import num_segments
    S = num_segments(n_images, segment_img_num)
    if init_c2w.ndim == 3:
        init_c2w = init_c2w[0]
    # host-side singles, ONE stacked transfer per leaf (see init_deep_pose)
    singles = [init_deep_pose(seed + 1000 * s, cfg, init_c2w[None], as_np=True)
               for s in range(S)]
    train = jax.tree_util.tree_map(
        lambda *xs: jnp.asarray(np.stack(xs)), *[s["train"] for s in singles])
    static = {"init_c2w": jnp.broadcast_to(
        jnp.asarray(init_c2w, jnp.float32), (S, 4, 4)),
        "initialized": jnp.zeros((S,), jnp.bool_).at[0].set(True),
        "progress": jnp.zeros((S,), jnp.float32)}
    keys = [k for k in singles[0]["static"] if k.startswith("t_")]
    for k in keys:
        static[k] = jnp.asarray(np.stack([s["static"][k] for s in singles]))
    return {"train": train, "static": static}


def seg_deep_slice(bank: Params, seg_idx) -> Params:
    train = jax.tree_util.tree_map(lambda x: x[seg_idx], bank["train"])
    static = {"init_c2w": bank["static"]["init_c2w"][seg_idx][None]}
    for k in bank["static"]:
        if k.startswith("t_"):
            static[k] = bank["static"][k][seg_idx]
    return {"train": train, "static": static}


def seg_deep_apply(bank: Params, cfg: DeepPoseCfg, segment_img_num: int,
                   cam_id) -> jnp.ndarray:
    cam_id = jnp.asarray(cam_id)
    seg_idx = cam_id // segment_img_num
    return deep_pose_apply(seg_deep_slice(bank, seg_idx), cfg, cam_id)


@partial(jax.jit, static_argnums=(2, 3))
def _seg_deep_init_static(bank: Params, seg_idx, cfg: DeepPoseCfg,
                          segment_img_num: int):
    """Traced-index device side of :func:`seg_deep_initialize` — one
    compile serves every admission (the eager form recompiled per
    segment index; see picture_pose._seg_init_static)."""
    last_cam = seg_idx * segment_img_num - 1
    last_pose = deep_pose_apply(seg_deep_slice(bank, seg_idx - 1), cfg,
                                last_cam)
    return (bank["static"]["init_c2w"].at[seg_idx].set(to_4x4(last_pose)),
            bank["static"]["initialized"].at[seg_idx].set(True))


def seg_deep_initialize(bank: Params, cfg: DeepPoseCfg, segment_img_num: int,
                        seg_idx: int) -> Params:
    if bool(np.asarray(jax.device_get(bank["static"]["initialized"]))[seg_idx]):
        return bank
    init_c2w, initialized = _seg_deep_init_static(
        bank, jnp.asarray(seg_idx, jnp.int32), cfg, segment_img_num)
    static = dict(bank["static"], init_c2w=init_c2w, initialized=initialized)
    return {"train": bank["train"], "static": static}
