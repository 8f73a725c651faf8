"""Quaternion helpers + novel-view pose oscillation, vectorized JAX.

Counterpart of the reference's `models/camera.py:159-258` (Quaternion
q_to_R / R_to_q / invert / product), `angle_to_rotation_matrix`
(`camera.py:292-313`) and `get_novel_view_poses` (`camera.py:390-400`).
Quaternion layout: (w, x, y, z), matching the reference.

R_to_q uses the branchless Shepperd/sign form of the reference's primary
path; the reference's NaN fallback (eigendecomposition of the K matrix,
`camera.py:208-237`) is replaced by a numerically safe max(eps) clamp —
the fallback only triggered at trace <= -1, where the sign-form still
returns a valid (if sign-ambiguous) quaternion after clamping.
"""

from __future__ import annotations

import jax.numpy as jnp

from fmov_pose_tpu.core.pose import compose, make_pose

__all__ = ["q_to_R", "R_to_q", "q_invert", "q_product", "slerp",
           "angle_to_rotation_matrix", "get_novel_view_poses"]


def q_to_R(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z) -> [..., 3, 3] (`camera.py:160-192`)."""
    qa, qb, qc, qd = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack([1 - 2 * (qc**2 + qd**2), 2 * (qb * qc - qa * qd),
                      2 * (qa * qc + qb * qd)], axis=-1)
    row1 = jnp.stack([2 * (qb * qc + qa * qd), 1 - 2 * (qb**2 + qd**2),
                      2 * (qc * qd - qa * qb)], axis=-1)
    row2 = jnp.stack([2 * (qb * qd - qa * qc), 2 * (qa * qb + qc * qd),
                      1 - 2 * (qb**2 + qc**2)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def R_to_q(R: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] (w,x,y,z) (`camera.py:194-207`)."""
    R00, R01, R02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    R10, R11, R12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    R20, R21, R22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    t = R00 + R11 + R22
    qa = 0.5 * jnp.sqrt(jnp.maximum(1 + t, 0.0) + eps)
    qb = jnp.sign(R21 - R12) * 0.5 * jnp.sqrt(
        jnp.maximum(1 + R00 - R11 - R22, 0.0) + eps)
    qc = jnp.sign(R02 - R20) * 0.5 * jnp.sqrt(
        jnp.maximum(1 - R00 + R11 - R22, 0.0) + eps)
    qd = jnp.sign(R10 - R01) * 0.5 * jnp.sqrt(
        jnp.maximum(1 - R00 - R11 + R22, 0.0) + eps)
    return jnp.stack([qa, qb, qc, qd], axis=-1)


def q_invert(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion inverse (`camera.py:240-244`)."""
    w = q[..., :1]
    xyz = q[..., 1:]
    norm2 = (q * q).sum(axis=-1, keepdims=True)
    return jnp.concatenate([w, -xyz], axis=-1) / norm2


def q_product(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product (`camera.py:246-258`)."""
    a1, b1, c1, d1 = jnp.moveaxis(q1, -1, 0)
    a2, b2, c2, d2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack([
        a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
        a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
        a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
        a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
    ], axis=-1)


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, u, eps: float = 1e-8):
    """Spherical interpolation between unit quaternions; u in [0, 1]."""
    u = jnp.asarray(u)[..., None]
    dot = (q0 * q1).sum(axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)  # shortest arc
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    near = sin_t < eps
    w0 = jnp.where(near, 1.0 - u, jnp.sin((1.0 - u) * theta) / (sin_t + eps))
    w1 = jnp.where(near, u, jnp.sin(u * theta) / (sin_t + eps))
    out = w0 * q0 + w1 * q1
    return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + eps)


def angle_to_rotation_matrix(a: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Euler rotation about one axis (`camera.py:292-313`): the reference
    rolls the [cos -sin; sin cos] block to position dict(X=1, Y=2, Z=0)."""
    roll = {"X": 1, "Y": 2, "Z": 0}[axis]
    a = jnp.asarray(a)
    c, s = jnp.cos(a), jnp.sin(a)
    O = jnp.zeros_like(a)
    I = jnp.ones_like(a)
    M = jnp.stack([
        jnp.stack([c, -s, O], axis=-1),
        jnp.stack([s, c, O], axis=-1),
        jnp.stack([O, O, I], axis=-1),
    ], axis=-2)
    return jnp.roll(jnp.roll(M, roll, axis=-2), roll, axis=-1)


def get_novel_view_poses(pose_anchor: jnp.ndarray, N: int = 60,
                         scale: float = 1.0) -> jnp.ndarray:
    """Circular small-oscillation novel-view trajectory around an anchor
    pose (`camera.py:390-400`). pose_anchor: [3, 4] w2c. Returns [N, 3, 4]."""
    theta = jnp.arange(N) / N * 2 * jnp.pi
    R_x = angle_to_rotation_matrix(jnp.arcsin(jnp.sin(theta) * 0.05), "X")
    R_y = angle_to_rotation_matrix(jnp.arcsin(jnp.cos(theta) * 0.05), "Y")
    pose_rot = make_pose(R=R_y @ R_x)
    pose_shift = make_pose(t=jnp.array([0.0, 0.0, -4.0 * scale]))
    pose_shift2 = make_pose(t=jnp.array([0.0, 0.0, 3.8 * scale]))
    shift_b = jnp.broadcast_to(pose_shift, (N, 3, 4))
    shift2_b = jnp.broadcast_to(pose_shift2, (N, 3, 4))
    pose_oscil = compose([shift_b, pose_rot, shift2_b])
    anchor_b = jnp.broadcast_to(jnp.asarray(pose_anchor), (N, 3, 4))
    return compose([pose_oscil, anchor_b])
