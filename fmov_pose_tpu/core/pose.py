"""Rigid-pose algebra on [..., 3, 4] camera-to-world matrices.

TPU-native rewrite of the reference pose utilities
(`/root/reference/models/camera.py:8-60, 266-327, 368-387`): pure
functions on jnp arrays, batched over leading dims, no mutable classes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)

__all__ = [
    "make_pose",
    "invert",
    "compose_pair",
    "compose",
    "to_hom",
    "to_4x4",
    "world2cam",
    "cam2img",
    "img2cam",
    "cam2world",
    "procrustes",
    "apply_sim3",
]


def make_pose(R=None, t=None) -> jnp.ndarray:
    """Assemble [..., 3, 4] from R [..., 3, 3] and/or t [..., 3]."""
    if R is None:
        t = jnp.asarray(t, dtype=jnp.float32)
        R = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), t.shape[:-1] + (3, 3))
    elif t is None:
        R = jnp.asarray(R, dtype=jnp.float32)
        t = jnp.zeros(R.shape[:-1], dtype=R.dtype)
    else:
        R = jnp.asarray(R, dtype=jnp.float32)
        t = jnp.asarray(t, dtype=jnp.float32)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def invert(pose: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid [..., 3, 4] pose (R orthonormal)."""
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = jnp.swapaxes(R, -2, -1)
    t_inv = -_mm(R_inv, t)
    return jnp.concatenate([R_inv, t_inv], axis=-1)


def compose_pair(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    """pose_new(x) = pose_b(pose_a(x))."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    return jnp.concatenate([_mm(R_b, R_a), _mm(R_b, t_a) + t_b], axis=-1)


def compose(pose_list) -> jnp.ndarray:
    """Compose a list left-to-right: poseN o ... o pose1."""
    out = pose_list[0]
    for p in pose_list[1:]:
        out = compose_pair(out, p)
    return out


def to_hom(X: jnp.ndarray) -> jnp.ndarray:
    """Append homogeneous 1: [..., d] -> [..., d+1]."""
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def to_4x4(pose: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 4] -> [..., 4, 4] with bottom row (0, 0, 0, 1)."""
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype),
        pose.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([pose, bottom], axis=-2)


def world2cam(X: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """World points [..., N, 3] through w2c pose [..., 3, 4]."""
    return _mm(to_hom(X), jnp.swapaxes(pose, -1, -2))


def cam2img(X: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    return _mm(X, jnp.swapaxes(intr, -1, -2))


def img2cam(X: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    return _mm(X, jnp.swapaxes(jnp.linalg.inv(intr), -1, -2))


def cam2world(X: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Camera points through the inverse of the given c2w's inverse (== c2w)."""
    return _mm(to_hom(X), jnp.swapaxes(invert(pose), -1, -2))


def procrustes(X0: jnp.ndarray, X1: jnp.ndarray):
    """Similarity alignment of point sets [N, 3] -> dict(t0, t1, s0, s1, R).

    X1 maps onto X0 by ``(X1 - t1)/s1 @ R.T * s0 + t0``.
    """
    t0 = X0.mean(axis=0, keepdims=True)
    t1 = X1.mean(axis=0, keepdims=True)
    X0c, X1c = X0 - t0, X1 - t1
    s0 = jnp.sqrt((X0c**2).sum(-1).mean()) + 1e-8
    s1 = jnp.sqrt((X1c**2).sum(-1).mean()) + 1e-8
    U, _, Vt = jnp.linalg.svd((X0c / s0).T @ (X1c / s1))
    R = U @ Vt
    det = jnp.linalg.det(R)
    # reflection fix without branching
    U_fixed = U.at[:, 2].multiply(jnp.where(det < 0, -1.0, 1.0))
    R = U_fixed @ Vt
    return {"t0": t0[0], "t1": t1[0], "s0": s0, "s1": s1, "R": R}


def apply_sim3(sim3, X1: jnp.ndarray) -> jnp.ndarray:
    """Apply the procrustes() result to map X1 into X0's frame."""
    return (X1 - sim3["t1"]) / sim3["s1"] @ sim3["R"].T * sim3["s0"] + sim3["t0"]
