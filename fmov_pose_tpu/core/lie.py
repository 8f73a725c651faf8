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

# 3x3 rotation algebra must stay exact f32 on TPU (default matmul
# precision is bf16 on the MXU, which breaks orthonormality at 1e-3)
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)

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


_SMALL_SQ = 1e-4  # switch to series below theta = 1e-2


def _safe_branch_sq(t2, series, exact):
    """where(theta^2 small, series(theta^2), exact(sqrt(theta^2))).

    Everything is a function of the SQUARED angle so gradients stay
    finite at exactly 0 (no d|w|/dw = w/|w| singularity): the series
    branch is polynomial in theta^2, and the exact branch takes sqrt of
    a clamped theta^2.  The reference evaluates a 10-term Taylor sum at
    ALL angles (`camera.py:130-156`), which loses ~1e-2 accuracy in f32
    beyond theta ~ pi; the closed form is exact there.
    """
    small = t2 < _SMALL_SQ
    theta = jnp.sqrt(jnp.where(small, jnp.ones_like(t2), t2))
    return jnp.where(small, series(t2), exact(theta))


def _A_sq(t2):
    """sin(theta)/theta as a function of theta^2."""
    return _safe_branch_sq(
        t2, lambda v: 1.0 - v / 6.0 + v * v / 120.0,
        lambda th: jnp.sin(th) / th)


def _B_sq(t2):
    """(1-cos(theta))/theta^2 as a function of theta^2."""
    return _safe_branch_sq(
        t2, lambda v: 0.5 - v / 24.0 + v * v / 720.0,
        lambda th: (1.0 - jnp.cos(th)) / (th * th))


def _C_sq(t2):
    """(theta-sin(theta))/theta^3 as a function of theta^2."""
    return _safe_branch_sq(
        t2, lambda v: 1.0 / 6.0 - v / 120.0 + v * v / 5040.0,
        lambda th: (th - jnp.sin(th)) / (th * th * th))


def taylor_A(x: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """sin(x)/x (exact, series near 0)."""
    del nth
    return _A_sq(x * x)


def taylor_B(x: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """(1-cos(x))/x**2 (exact, series near 0)."""
    del nth
    return _B_sq(x * x)


def taylor_C(x: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """(x-sin(x))/x**3 (exact, series near 0)."""
    del nth
    return _C_sq(x * x)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) -> SO(3) exponential map. [..., 3] -> [..., 3, 3]."""
    wx = skew(w)
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + _A_sq(t2) * wx + _B_sq(t2) * _mm(wx, wx)


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
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=wu.dtype)
    A, B, C = _A_sq(t2), _B_sq(t2), _C_sq(t2)
    R = eye + A * wx + B * _mm(wx, wx)
    V = eye + B * wx + C * _mm(wx, wx)
    t = _mm(V, u[..., None])
    if only_rot:
        t = jnp.zeros_like(jax.lax.stop_gradient(t))
    return jnp.concatenate([R, t], axis=-1)


def se3_log(Rt: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """SE(3) [..., 3, 4] -> se(3) [..., 6]."""
    R, t = Rt[..., :3], Rt[..., 3:]
    w = so3_log(R)
    wx = skew(w)
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=Rt.dtype)
    A, B = _A_sq(t2), _B_sq(t2)
    inv_V = eye - 0.5 * wx + (1.0 - A / (2.0 * B)) / (t2 + eps) * _mm(wx, wx)
    u = _mm(inv_V, t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)


def axis_angle_to_R(r: jnp.ndarray, eps: float = 1e-15) -> jnp.ndarray:
    """Axis-angle -> rotation via Rodrigues with direct sin/cos.

    Mirrors the pose-MLP path of the reference
    (`batch_lie_group_helper.py:19-36`): uses `sin(n)/n` with an epsilon on
    the norm rather than Taylor series (identical numerics to the shipped
    pose networks, which matters for convergence parity).
    """
    del eps  # the squared-angle branch handles 0 without an epsilon
    wx = skew(r)
    t2 = jnp.sum(r * r, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=r.dtype)
    return eye + _A_sq(t2) * wx + _B_sq(t2) * _mm(wx, wx)


def make_c2w(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] + translation [..., 3] -> pose [..., 3, 4]."""
    R = axis_angle_to_R(r)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def rotation_distance(R1: jnp.ndarray, R2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Angle (radians) between two rotations."""
    R_diff = _mm(R1, jnp.swapaxes(R2, -2, -1))
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps))
