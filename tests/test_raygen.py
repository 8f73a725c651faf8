"""Device raygen: the one-hot matmul pixel gather must be EXACT.

gather_pixels replaces TPU-serialized dynamic-gather with two selection
matmuls (data/rays.py). With one-hot operands every product is v*1 or
v*0 and each reduction has exactly one nonzero term, so the result must
be bitwise identical to advanced indexing — anything else corrupts
training colors/masks silently.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fmov_pose_tpu.data import rays as raygen


def test_gather_pixels_bitwise_exact():
    rng = np.random.default_rng(0)
    C, H, W = 3, 37, 53
    frame = jnp.asarray(rng.normal(size=(C, H, W)).astype(np.float32))
    py = jnp.asarray(rng.integers(0, H, size=257), jnp.int32)
    px = jnp.asarray(rng.integers(0, W, size=257), jnp.int32)
    got = raygen.gather_pixels(frame, py, px)
    want = jnp.stack([frame[c, py, px] for c in range(C)], axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gather_rgb_matches_indexing():
    rng = np.random.default_rng(1)
    planes = jnp.asarray(rng.random((3, 4, 19, 23)).astype(np.float32))
    py = jnp.asarray(rng.integers(0, 19, size=64), jnp.int32)
    px = jnp.asarray(rng.integers(0, 23, size=64), jnp.int32)
    for img_idx in (0, 3):
        got = raygen.gather_rgb(planes, jnp.asarray(img_idx), py, px)
        want = jnp.stack(
            [planes[c, img_idx, py, px] for c in range(3)], axis=-1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gen_random_rays_colors_match_pixels():
    """Rays must carry the exact color/mask of the pixel they pass
    through (end-to-end through the bbox-guided sampler)."""
    rng = np.random.default_rng(2)
    N, H, W = 2, 24, 24
    images = jnp.asarray(rng.random((3, N, H, W)).astype(np.float32))
    masks = jnp.asarray((rng.random((N, H, W)) > 0.4).astype(np.float32))
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 20.0
    intr[0, 2] = intr[1, 2] = 12.0
    intr_inv = jnp.asarray(np.linalg.inv(intr)[None].repeat(N, 0))
    bbox = jnp.asarray(np.tile([4, 20, 4, 20], (N, 1)), jnp.int32)
    pose = jnp.asarray(np.eye(4, dtype=np.float32)[:3])
    data = raygen.gen_random_rays(
        jax.random.key(0), images, masks, intr_inv, pose,
        jnp.asarray(1), 33, bbox, 2, True, H, W)
    assert data.shape == (33, 10)
    # recover the pixel from the ray direction and check the color
    rays_o, rays_v = np.asarray(data[:, :3]), np.asarray(data[:, 3:6])
    color, mask = np.asarray(data[:, 6:9]), np.asarray(data[:, 9])
    p = rays_v / rays_v[:, 2:3]
    px = np.rint(p[:, 0] * 20.0 + 12.0).astype(int)
    py = np.rint(p[:, 1] * 20.0 + 12.0).astype(int)
    want = np.stack([np.asarray(images)[c, 1, py, px] for c in range(3)],
                    axis=-1)
    np.testing.assert_allclose(color, want, atol=1e-5)
    np.testing.assert_array_equal(mask, np.asarray(masks)[1, py, px])
    assert (rays_o == 0).all()
