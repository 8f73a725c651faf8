"""Picture-level learned poses: Gaussian-Fourier MLP + segment bank.

TPU re-design of `/root/reference/models/picture_pose.py`:

* ``LearnPoseGF`` becomes a pure function over a param pytree; the
  camera-id Gaussian-Fourier embedding, 2x64 GELU MLP, and the
  axis-angle*pi / rot+scale heads match `picture_pose.py:140-186`.
* ``SegLearnPose`` (one MLP per image_interval frames,
  `picture_pose.py:189-250`) becomes a **bank**: every per-segment leaf is
  stacked on a leading S axis. One forward = gather segment slice + tiny
  MLP; freezing/unfreezing is NOT requires_grad mutation but a per-segment
  0/1 mask applied in the optimizer (train/optim.py) — no recompilation,
  no Python-object state.
* The reference's lazy segment init ("copy previous segment's last pose
  into the new segment's init_c2w", `picture_pose.py:225-237`) is an
  explicit host-triggered `seg_initialize` at frame-admission time.

Param layout: {"train": trainable leaves, "static": buffers (b bands,
init_c2w)} — the split keeps optimizer masking trivial.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST
import numpy as np

from fmov_pose_tpu.core.embedder import fourier_features
from fmov_pose_tpu.core.lie import make_c2w
from fmov_pose_tpu.core.pose import to_4x4

Params = Dict[str, Any]

EMBED_SIZE = 128


class PoseCfg(NamedTuple):
    emphasize_rot: bool = False
    small_rot: bool = False
    pose_encoding: bool = False
    embedding_scale: float = 10.0


# ---------------------------------------------------------------------------
# single LearnPoseGF
# ---------------------------------------------------------------------------


def _bands(rng: np.random.Generator, cfg: PoseCfg) -> np.ndarray:
    if cfg.pose_encoding:
        b = 2.0 ** np.linspace(0, 5, EMBED_SIZE // 2) - 1.0
        b = b[:, None]
        b = np.concatenate([b, np.roll(b, 1, axis=-1)], 0)
        return b.astype(np.float32)
    return rng.normal(0.0, cfg.embedding_scale, (EMBED_SIZE, 1)).astype(np.float32)


def _kaiming_linear(rng, d_in, d_out):
    bound = 1.0 / math.sqrt(d_in)
    w = rng.uniform(-bound, bound, (d_out, d_in)).astype(np.float32)
    b = rng.uniform(-bound, bound, (d_out,)).astype(np.float32)
    return {"w": w, "b": b}


def _gf_train_np(rng, cfg: PoseCfg):
    """Trainable GF-pose leaves as HOST numpy (same RNG draw order as the
    original device-array form — checkpoints/parity depend on it)."""
    train = {
        "lin1": _kaiming_linear(rng, EMBED_SIZE * 2, 64),
        "lin2": _kaiming_linear(rng, 64, 64),
    }
    if cfg.emphasize_rot:
        train["lin3_rot"] = {
            "w": rng.normal(0, 0.01, (3, 64)).astype(np.float32),
            "b": np.zeros((3,), np.float32)}
        train["lin3_trans"] = {"w": np.zeros((3, 64), np.float32),
                               "b": np.zeros((3,), np.float32)}
        train["lin3_scale"] = {
            "w": rng.normal(0, 0.01, (1, 64)).astype(np.float32),
            "b": np.ones((1,), np.float32)}
    else:
        train["lin3"] = {
            "w": rng.normal(0, 0.01, (6, 64)).astype(np.float32),
            "b": np.zeros((6,), np.float32)}
    return train


def init_gf(seed: int, cfg: PoseCfg, init_c2w: np.ndarray) -> Params:
    """init_c2w: [num_cams, 4, 4] (or [4, 4] broadcastable seed pose)."""
    rng = np.random.default_rng(seed)
    b = _bands(rng, cfg)
    train = jax.tree_util.tree_map(jnp.asarray, _gf_train_np(rng, cfg))
    if init_c2w.ndim == 2:
        init_c2w = init_c2w[None]
    static = {"b": jnp.asarray(b), "init_c2w": jnp.asarray(init_c2w, jnp.float32)}
    return {"train": train, "static": static}


def _lin(p, x):
    return x @ p["w"].T + p["b"]


def gf_apply(params: Params, cfg: PoseCfg, cam_id) -> jnp.ndarray:
    """cam_id: scalar int (traced ok). Returns c2w [3, 4]."""
    cam_id = jnp.asarray(cam_id)
    feat = fourier_features(
        cam_id.astype(jnp.float32)[None, None], params["static"]["b"])  # [1, 256]
    h = jax.nn.gelu(_lin(params["train"]["lin1"], feat), approximate=False)
    h = jax.nn.gelu(_lin(params["train"]["lin2"], h), approximate=False)
    rot_scale = jnp.pi / 6 if cfg.small_rot else jnp.pi
    if cfg.emphasize_rot:
        pred_rot = _lin(params["train"]["lin3_rot"], h) * rot_scale
        pred_trans = _lin(params["train"]["lin3_trans"], h)
        pred_scale = _lin(params["train"]["lin3_scale"], h)
    else:
        pred = _lin(params["train"]["lin3"], h)
        pred_rot = pred[:, :3] * rot_scale
        pred_trans = pred[:, 3:]
        pred_scale = None
    c2w = make_c2w(pred_rot, pred_trans)[0]  # [3, 4]

    init_bank = params["static"]["init_c2w"]
    idx = jnp.minimum(cam_id, init_bank.shape[0] - 1)
    init = init_bank[idx]  # [4, 4]
    t = init[:3, 3] * (pred_scale[0, 0] if pred_scale is not None else 1.0)
    tmp = jnp.eye(4, dtype=c2w.dtype).at[:3, :3].set(init[:3, :3]).at[:3, 3].set(t)
    return jnp.matmul(c2w, tmp, precision=_HI)  # [3, 4]


# ---------------------------------------------------------------------------
# segment bank (SegLearnPose)
# ---------------------------------------------------------------------------


def num_segments(n_images: int, segment_img_num: int) -> int:
    s = n_images // segment_img_num
    if n_images % segment_img_num != 0:
        s += 1
    return s


def init_seg_bank(seed: int, cfg: PoseCfg, n_images: int, segment_img_num: int,
                  init_c2w: np.ndarray) -> Params:
    """Stacked bank of S = ceil(N / interval) LearnPoseGF param sets.

    init_c2w: [4, 4] seed pose shared by all frames (the seg path always
    starts from the mask-init pose, `exp_runner.py:194-199`).
    Each segment draws its own Fourier bands (the reference constructs a
    fresh LearnPoseGF per segment, `picture_pose.py:207-217`).
    """
    S = num_segments(n_images, segment_img_num)
    if init_c2w.ndim == 3:
        init_c2w = init_c2w[0]
    # build singles HOST-side and transfer each stacked leaf once: the
    # old per-segment init_gf made ~10 device arrays per segment — at the
    # reference's ~300-segment scale that is thousands of tiny H2D
    # transfers (~5 ms each through the tunnel). Same RNG stream per
    # segment (seed + 1000*s), so banks are bitwise-identical to before.
    singles = []
    for s in range(S):
        rng = np.random.default_rng(seed + 1000 * s)
        bands = _bands(rng, cfg)
        singles.append({"train": _gf_train_np(rng, cfg), "b": bands})
    train = jax.tree_util.tree_map(
        lambda *xs: jnp.asarray(np.stack(xs)), *[s["train"] for s in singles])
    b = jnp.asarray(np.stack([s["b"] for s in singles]))
    init_bank = jnp.broadcast_to(
        jnp.asarray(init_c2w, jnp.float32), (S, 4, 4))
    return {
        "train": train,
        "static": {
            "b": b,
            "init_c2w": init_bank,                    # [S, 4, 4]
            "initialized": jnp.zeros((S,), jnp.bool_).at[0].set(True),
            "progress": jnp.zeros((S,), jnp.float32),  # per-segment step count
        },
    }


def seg_slice(bank: Params, seg_idx) -> Params:
    """Materialize a single-segment view of the bank (gather on leading S)."""
    train = jax.tree_util.tree_map(lambda x: x[seg_idx], bank["train"])
    static = {
        "b": bank["static"]["b"][seg_idx],
        "init_c2w": bank["static"]["init_c2w"][seg_idx][None],  # [1, 4, 4]
    }
    return {"train": train, "static": static}


def seg_apply(bank: Params, cfg: PoseCfg, segment_img_num: int, cam_id) -> jnp.ndarray:
    """Pose of frame cam_id through its segment's MLP. Returns [3, 4]."""
    cam_id = jnp.asarray(cam_id)
    seg_idx = cam_id // segment_img_num
    single = seg_slice(bank, seg_idx)
    # init_c2w has one entry per segment -> gf_apply clamps the index to 0
    return gf_apply(single, cfg, cam_id)


@partial(jax.jit, static_argnums=(2, 3))
def _seg_init_static(bank: Params, seg_idx, cfg: PoseCfg,
                     segment_img_num: int):
    """Device side of :func:`seg_initialize` with a TRACED segment index.

    The eager form recompiled ~20 tiny kernels per admission (every
    `x[int]` gather / `.at[int].set` bakes the index into the cache key),
    which through the tunnel's remote compiler amortized to ~12 ms on
    EVERY training step of the progressive loop. One traced-index jit
    compiles once and serves every admission."""
    last_cam = seg_idx * segment_img_num - 1
    last_pose = gf_apply(seg_slice(bank, seg_idx - 1), cfg, last_cam)
    pose4 = to_4x4(last_pose)
    return (bank["static"]["init_c2w"].at[seg_idx].set(pose4),
            bank["static"]["initialized"].at[seg_idx].set(True))


def seg_initialize(bank: Params, cfg: PoseCfg, segment_img_num: int,
                   seg_idx: int) -> Params:
    """Host-triggered lazy init of segment `seg_idx` from the previous
    segment's last pose (`picture_pose.py:225-237`)."""
    if bool(np.asarray(jax.device_get(bank["static"]["initialized"]))[seg_idx]):
        return bank
    init_c2w, initialized = _seg_init_static(
        bank, jnp.asarray(seg_idx, jnp.int32), cfg, segment_img_num)
    static = dict(bank["static"], init_c2w=init_c2w, initialized=initialized)
    return {"train": bank["train"], "static": static}


@jax.jit
def _bank_set_at(arr, idx, val):
    """Traced-index `.at[].set` (index-agnostic compile, see
    :func:`_seg_init_static`)."""
    return arr.at[idx].set(val)


def seg_set_pose(bank: Params, seg_idx: int, pose4x4, force: bool = False) -> Params:
    """Explicit seeding (`picture_pose.py:239-246`)."""
    if (bool(np.asarray(jax.device_get(bank["static"]["initialized"]))[seg_idx])
            and not force):
        return bank
    static = dict(bank["static"])
    idx = jnp.asarray(seg_idx, jnp.int32)
    static["init_c2w"] = _bank_set_at(
        static["init_c2w"], idx, jnp.asarray(pose4x4, jnp.float32))
    static["initialized"] = _bank_set_at(
        static["initialized"], idx, jnp.asarray(True))
    return {"train": bank["train"], "static": static}


def seg_step_progress(bank: Params, seg_idx) -> Params:
    static = dict(bank["static"])
    static["progress"] = static["progress"].at[seg_idx].add(1.0)
    return {"train": bank["train"], "static": static}
