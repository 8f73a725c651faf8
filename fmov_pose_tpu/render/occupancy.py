"""Occupancy-grid guided sampling (opt-in acceleration, NerfAcc-style).

The reference concentrates samples near the surface with 4 SDF-guided
up-sampling passes, each a full SDF forward over all current samples
(`/root/reference/models/renderer.py:423-446`) — ~40% of a phase-2
render.  This module replaces them with ONE gather from a cached
occupancy grid: a [R,R,R] buffer of "surface nearby" flags refreshed
every few hundred steps from the SDF (|sdf| thresholded + 3^3 dilation).

Static shapes throughout: the importance samples are drawn by the same
inverse-CDF sampler with per-section occupancy as the pdf, so the sample
COUNT never changes — only their placement. Enabled via
``train.occupancy_sampling`` (off by default: the reference's exact
sampling remains the default behavior).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fmov_pose_tpu.core.sampling import merge_sorted, sample_pdf

__all__ = ["make_grid_points", "update_occ_grid", "occupancy_importance",
           "query_occ"]


def make_grid_points(res: int, bound: float = 1.0) -> np.ndarray:
    lin = np.linspace(-bound, bound, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.stack([x, y, z], -1).reshape(-1, 3)


@partial(jax.jit, static_argnames=("res", "bound"))
def update_occ_grid(sdf_vals: jnp.ndarray, res: int, bound: float = 1.0,
                    threshold_cells: float = 4.0) -> jnp.ndarray:
    """|sdf| on the grid -> dilated binary occupancy [R, R, R] float32.

    threshold_cells: surface band half-width in voxel units (generous:
    the grid only needs to UPPER-bound the surface region — missing it
    biases sampling, including too much merely wastes samples).
    """
    cell = 2.0 * bound / (res - 1)
    occ = (jnp.abs(sdf_vals.reshape(res, res, res))
           < threshold_cells * cell).astype(jnp.float32)
    # 3^3 max-pool dilation
    occ = jax.lax.reduce_window(
        occ, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")
    return occ


def query_occ(occ_grid: jnp.ndarray, pts: jnp.ndarray,
              bound: float = 1.0) -> jnp.ndarray:
    """Nearest-voxel occupancy lookup for [..., 3] points in [-bound, bound]."""
    res = occ_grid.shape[0]
    idx = jnp.clip(jnp.round((pts + bound) / (2 * bound) * (res - 1)),
                   0, res - 1).astype(jnp.int32)
    return occ_grid[idx[..., 0], idx[..., 1], idx[..., 2]]


def occupancy_importance(key, occ_grid, rays_o, rays_d, z_vals,
                         n_importance: int, bound: float = 1.0):
    """Draw n_importance extra samples where the grid says 'surface nearby'
    and merge-sort them into z_vals. Gradient-free (like the reference's
    up-sampling)."""
    z_vals = jax.lax.stop_gradient(z_vals)
    mid_z = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]
    occ = query_occ(occ_grid, pts, bound)           # [B, N-1]
    # fall back to uniform on fully-empty rays (1e-2 floor)
    weights = occ + 1e-2
    new_z = sample_pdf(z_vals, weights, n_importance)
    z_all = merge_sorted(z_vals, new_z)
    return jax.lax.stop_gradient(z_all)
