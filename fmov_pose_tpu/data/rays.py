"""On-device ray generation (pure jax, static shapes).

TPU re-design of the reference's per-step ray assembly
(`/root/reference/models/dataset.py:547-792`): the whole image/mask stack
lives in HBM; each training step gathers its ray batch on device from
scalar frame ids + PRNG key.  Mask-guided sampling uses the precomputed
per-frame bbox table instead of a host-side `np.where`
(`dataset.py:643-655`), so there is no host->device traffic in the hot
loop beyond the frame index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

__all__ = [
    "pixels_to_rays",
    "gen_random_rays",
    "gen_rays_grid",
    "near_far_from_sphere",
]


def gather_pixels(frame_chw, py, px):
    """Gather pixels [B] from one frame's channel planes [C, H, W] by a
    factored one-hot contraction instead of indexed loads.

    TPU dynamic-gather serializes (~5 ms/step for the 4 gathers of an
    8192-ray phase-2 batch); two selection matmuls ride the MXU in
    ~0.4 ms.  Exact, not approximate: with one-hot operands every product
    is v*1 or v*0 and each reduction has exactly one nonzero term, and
    precision=HIGHEST keeps the f32 value operand unsplit (TPU default
    would truncate pixels to bf16).  Returns [B, C].
    """
    C, H, W = frame_chw.shape
    oh_y = (py[:, None] == jnp.arange(H)[None, :]).astype(jnp.float32)
    oh_x = (px[:, None] == jnp.arange(W)[None, :]).astype(jnp.float32)
    rows = jnp.einsum("bh,chw->bcw", oh_y, frame_chw, precision=_HI)
    return jnp.einsum("bcw,bw->bc", rows, oh_x, precision=_HI)


def gather_rgb(images_planes, img_idx, py, px):
    """Gather pixel colors from the channel-plane image layout.

    images_planes: [3, N, H, W] — channels-first so no tensor ever has a
    minor dimension of 3 (TPU tiles pad the minor dim to 128 lanes: an
    [N, H, W, 3] buffer wastes 42x HBM and bandwidth).
    """
    return gather_pixels(images_planes[:, img_idx], py, px)


def pixels_to_rays(px, py, intr_inv, pose):
    """Pixel coords -> world rays.

    px, py: [...] float pixel coordinates; intr_inv: [3, 3]; pose: [3, 4].
    Returns (rays_o [..., 3], rays_d [..., 3], p_norm [..., 1]).
    """
    p = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)
    p = jnp.matmul(p, intr_inv[:3, :3].T, precision=_HI)
    p_norm = jnp.linalg.norm(p, axis=-1, keepdims=True)
    rays_v = p / p_norm
    rays_v = jnp.matmul(rays_v, pose[:3, :3].T, precision=_HI)
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_v.shape)
    return rays_o, rays_v, p_norm


def gen_random_rays(key, images, masks, intr_inv_all, pose, img_idx,
                    batch_size: int, bbox_table, patch_size: int,
                    mask_guided: bool, H: int, W: int,
                    mask_guided_active=None, depths=None):
    """Random ray batch from one frame (`dataset.py:634-681`).

    images: [N, H, W, 3], masks: [N, H, W] (single channel), intr_inv_all: [N, 4, 4],
    pose: [3, 4] c2w, img_idx: scalar int, bbox_table: [N, 4]
    (ymin, ymax, xmin, xmax).  With mask_guided (static) on, 70% of draws
    restrict the pixel window to the dilated mask bbox;
    ``mask_guided_active`` is an optional traced 0/1 gate (the reference
    enables guiding only past mesh_warmup_step, `exp_runner.py:506-507`).

    Returns data [batch, 10] = (rays_o, rays_d, color, mask).
    """
    k_guide, k_x, k_y = jax.random.split(key, 3)
    if mask_guided:
        use_bbox = jax.random.uniform(k_guide) < 0.7
        if mask_guided_active is not None:
            use_bbox = use_bbox & (mask_guided_active > 0)
        y0, y1, x0, x1 = bbox_table[img_idx]
        y_lo = jnp.where(use_bbox, jnp.maximum(y0 - patch_size, 0), 0)
        y_hi = jnp.where(use_bbox, jnp.minimum(y1 + patch_size, H), H)
        x_lo = jnp.where(use_bbox, jnp.maximum(x0 - patch_size, 0), 0)
        x_hi = jnp.where(use_bbox, jnp.minimum(x1 + patch_size, W), W)
    else:
        y_lo, y_hi, x_lo, x_hi = 0, H, 0, W
    px = jax.random.randint(k_x, (batch_size,), x_lo, x_hi)
    py = jax.random.randint(k_y, (batch_size,), y_lo, y_hi)

    color = gather_rgb(images, img_idx, py, px)  # [batch, 3]
    mask = gather_pixels(masks[img_idx][None], py, px)  # [batch, 1]
    rays_o, rays_v, p_norm = pixels_to_rays(
        px.astype(jnp.float32), py.astype(jnp.float32),
        intr_inv_all[img_idx], pose)
    if depths is not None:
        # z-depth -> ray-length depth (`dataset.py:672-676`)
        depth = gather_pixels(depths[img_idx][None], py, px) * p_norm
        return jnp.concatenate([rays_o, rays_v, color, mask, depth], axis=-1)
    return jnp.concatenate([rays_o, rays_v, color, mask], axis=-1)


def gen_flow_rays(pixels_xy, intr_inv, pose):
    """Rays through match pixel coords [B, 2] with frame pose [3, 4]
    (`dataset.py:683-792`). Returns (rays_o, rays_d)."""
    rays_o, rays_v, _ = pixels_to_rays(
        pixels_xy[:, 0], pixels_xy[:, 1], intr_inv, pose)
    return rays_o, rays_v


def gen_rays_grid(intr_inv, pose, H: int, W: int, resolution_level: int = 1):
    """Full-frame ray grid for validation renders (`dataset.py:547-576`).
    Returns rays_o, rays_d of shape [H//l, W//l, 3]."""
    l = resolution_level
    tx = jnp.linspace(0, W - 1, W // l)
    ty = jnp.linspace(0, H - 1, H // l)
    px, py = jnp.meshgrid(tx, ty, indexing="xy")
    rays_o, rays_v, _ = pixels_to_rays(px, py, intr_inv, pose)
    return rays_o, rays_v


def near_far_from_sphere(rays_o, rays_d):
    """mid -/+ 1 heuristic of the unit-sphere scene (`dataset.py:835-842`)."""
    a = jnp.sum(rays_d**2, axis=-1, keepdims=True)
    b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    mid = 0.5 * (-b) / a
    return mid - 1.0, mid + 1.0
