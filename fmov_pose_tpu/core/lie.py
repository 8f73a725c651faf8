"""SO(3)/SE(3) Lie-group maps, TPU-native (pure jax, static shapes).

Functional re-design of the reference pose math
(`/root/reference/models/camera.py:63-156` and
`/root/reference/models/batch_lie_group_helper.py:6-47`): Taylor-series
exp maps so that gradients are stable at theta -> 0, batched over arbitrary
leading dims, and jit/vmap friendly (no data-dependent control flow).

All rotations are 3x3, poses are [..., 3, 4] = [R | t] camera-to-world.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "skew",
    "taylor_A",
    "taylor_B",
    "taylor_C",
    "so3_exp",
    "so3_log",
    "se3_exp",
    "se3_log",
    "axis_angle_to_R",
    "make_c2w",
    "rotation_distance",
]


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([zeros, -w2, w1], axis=-1),
            jnp.stack([w2, zeros, -w0], axis=-1),
            jnp.stack([-w1, w0, zeros], axis=-1),
        ],
        axis=-2,
    )


def _taylor_series(x2: jnp.ndarray, denom_step, nth: int) -> jnp.ndarray:
    """Evaluate sum_i (-1)^i x^(2i) / denom(i) with x2 = x**2 (Horner-free).

    denom_step(i) returns the multiplicative factor applied to the running
    denominator at term i (for i >= start).
    """
    ans = jnp.zeros_like(x2)
    denom = 1.0
    term = jnp.ones_like(x2)
    for i in range(nth + 1):
        denom *= denom_step(i)
        ans = ans + ((-1.0) ** i) * term / denom
        term = term * x2
    return ans


def taylor_A(x: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """sin(x)/x via Taylor series (stable at 0, smooth gradients)."""
    return _taylor_series(x * x, lambda i: (2 * i) * (2 * i + 1) if i > 0 else 1.0, nth)


def taylor_B(x: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """(1-cos(x))/x**2 via Taylor series."""
    return _taylor_series(x * x, lambda i: (2 * i + 1) * (2 * i + 2), nth)


def taylor_C(x: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """(x-sin(x))/x**3 via Taylor series."""
    return _taylor_series(x * x, lambda i: (2 * i + 2) * (2 * i + 3), nth)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) -> SO(3) exponential map. [..., 3] -> [..., 3, 3]."""
    wx = skew(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + taylor_A(theta) * wx + taylor_B(theta) * (wx @ wx)


def so3_log(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """SO(3) -> so(3) log map. [..., 3, 3] -> [..., 3]."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.mod(
        jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)), jnp.pi
    )[..., None, None]
    ln_R = 1.0 / (2.0 * taylor_A(theta) + 1e-8) * (R - jnp.swapaxes(R, -2, -1))
    return jnp.stack(
        [ln_R[..., 2, 1], ln_R[..., 0, 2], ln_R[..., 1, 0]], axis=-1
    )


def se3_exp(wu: jnp.ndarray, only_rot: bool = False) -> jnp.ndarray:
    """se(3) -> SE(3): [..., 6] (w | u) -> [..., 3, 4] = [R | V u]."""
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=wu.dtype)
    A, B, C = taylor_A(theta), taylor_B(theta), taylor_C(theta)
    R = eye + A * wx + B * (wx @ wx)
    V = eye + B * wx + C * (wx @ wx)
    t = V @ u[..., None]
    if only_rot:
        t = jnp.zeros_like(jax.lax.stop_gradient(t))
    return jnp.concatenate([R, t], axis=-1)


def se3_log(Rt: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """SE(3) [..., 3, 4] -> se(3) [..., 6]."""
    R, t = Rt[..., :3], Rt[..., 3:]
    w = so3_log(R)
    wx = skew(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=Rt.dtype)
    A, B = taylor_A(theta), taylor_B(theta)
    inv_V = eye - 0.5 * wx + (1.0 - A / (2.0 * B)) / (theta**2 + eps) * (wx @ wx)
    u = (inv_V @ t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)


def axis_angle_to_R(r: jnp.ndarray, eps: float = 1e-15) -> jnp.ndarray:
    """Axis-angle -> rotation via Rodrigues with direct sin/cos.

    Mirrors the pose-MLP path of the reference
    (`batch_lie_group_helper.py:19-36`): uses `sin(n)/n` with an epsilon on
    the norm rather than Taylor series (identical numerics to the shipped
    pose networks, which matters for convergence parity).
    """
    wx = skew(r)
    norm = jnp.linalg.norm(r, axis=-1, keepdims=True)[..., None] + eps
    eye = jnp.eye(3, dtype=r.dtype)
    return (
        eye
        + (jnp.sin(norm) / norm) * wx
        + ((1.0 - jnp.cos(norm)) / norm**2) * (wx @ wx)
    )


def make_c2w(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] + translation [..., 3] -> pose [..., 3, 4]."""
    R = axis_angle_to_R(r)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def rotation_distance(R1: jnp.ndarray, R2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Angle (radians) between two rotations."""
    R_diff = R1 @ jnp.swapaxes(R2, -2, -1)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps))
