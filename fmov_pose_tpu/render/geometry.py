"""Mesh extraction: TPU-evaluated SDF grid -> native marching cubes.

Replaces `/root/reference/models/renderer.py:9-51, 500-532`: the grid is
evaluated in jit-compiled fixed-size chunks on device (one big batched MLP
eval per chunk — MXU-friendly), then the host-side native extractor
triangulates it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fmov_pose_tpu.fields import nets
from fmov_pose_tpu.native.mc import marching_cubes


def extract_fields(bound_min, bound_max, resolution: int, query_fn,
                   chunk: int = 64**3) -> np.ndarray:
    """Evaluate query_fn over a resolution^3 grid, chunked (`renderer.py:9-37`)."""
    xs = np.linspace(bound_min[0], bound_max[0], resolution, dtype=np.float32)
    ys = np.linspace(bound_min[1], bound_max[1], resolution, dtype=np.float32)
    zs = np.linspace(bound_min[2], bound_max[2], resolution, dtype=np.float32)
    xx, yy, zz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    n = pts.shape[0]
    pad = (-n) % chunk
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)], axis=0)
    out = []
    for i in range(0, pts.shape[0], chunk):
        out.append(np.asarray(query_fn(jnp.asarray(pts[i:i + chunk]))).reshape(-1))
    u = np.concatenate(out)[:n]
    return u.reshape(resolution, resolution, resolution)


def extract_geometry(bound_min, bound_max, resolution: int, threshold: float,
                     query_fn):
    """Grid-eval + isosurface; rescales voxel coords to world bounds
    (`renderer.py:40-51`)."""
    bound_min = np.asarray(bound_min, np.float32)
    bound_max = np.asarray(bound_max, np.float32)
    u = extract_fields(bound_min, bound_max, resolution, query_fn)
    vertices, triangles = marching_cubes(u, threshold)
    vertices = vertices / (resolution - 1.0) * (bound_max - bound_min)[None, :] \
        + bound_min[None, :]
    return vertices, triangles


def make_sdf_query(params, model_cfg):
    """Jitted negative-SDF query (the reference meshes -sdf at threshold 0,
    `renderer.py:500-507`)."""

    from fmov_pose_tpu.render.neus import _sdf_only_fn
    fn = _sdf_only_fn(model_cfg)

    @jax.jit
    def query(pts):
        return -fn(params["sdf"], pts)

    return query


def extract_color(params, model_cfg, vertices: np.ndarray,
                  chunk: int = 8192) -> np.ndarray:
    """Vertex colors from the color field with view dir = -normal
    (`renderer.py:509-532`)."""

    @jax.jit
    def q(pts):
        out = nets.sdf_apply(params["sdf"], model_cfg["sdf"], pts)
        feat = out[:, 1:]
        grads = nets.sdf_gradient(params["sdf"], model_cfg["sdf"], pts)
        return nets.color_apply(params["color"], model_cfg["color"],
                                pts, grads, -grads, feat)

    n = vertices.shape[0]
    pad = (-n) % chunk
    pts = np.concatenate(
        [vertices.astype(np.float32), np.zeros((pad, 3), np.float32)], axis=0)
    cols = [np.asarray(q(jnp.asarray(pts[i:i + chunk])))
            for i in range(0, pts.shape[0], chunk)]
    return np.concatenate(cols)[:n]
