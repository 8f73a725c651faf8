import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as ScipyRot

from fmov_pose_tpu.core import lie, pose


def random_w(rng, n=16, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 3)) * scale, dtype=jnp.float32)


def test_so3_exp_matches_scipy(rng):
    w = random_w(rng)
    R = np.asarray(lie.so3_exp(w))
    R_ref = ScipyRot.from_rotvec(np.asarray(w)).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_exp_small_angle_stable(rng):
    w = random_w(rng, scale=1e-8)
    R = np.asarray(lie.so3_exp(w))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), R.shape), atol=1e-6)
    # gradients finite at zero
    g = jax.grad(lambda v: lie.so3_exp(v).sum())(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()


def test_so3_log_roundtrip(rng):
    w = random_w(rng, scale=0.8)
    w_back = np.asarray(lie.so3_log(lie.so3_exp(w)))
    np.testing.assert_allclose(w_back, np.asarray(w), atol=1e-4)


def test_se3_roundtrip(rng):
    wu = jnp.asarray(rng.normal(size=(8, 6)) * 0.5, dtype=jnp.float32)
    Rt = lie.se3_exp(wu)
    wu_back = np.asarray(lie.se3_log(Rt))
    np.testing.assert_allclose(wu_back, np.asarray(wu), atol=1e-4)


def test_se3_only_rot(rng):
    wu = jnp.asarray(rng.normal(size=(4, 6)), dtype=jnp.float32)
    Rt = lie.se3_exp(wu, only_rot=True)
    np.testing.assert_allclose(np.asarray(Rt[..., 3]), 0.0, atol=0)


def test_axis_angle_matches_exp(rng):
    r = random_w(rng)
    np.testing.assert_allclose(
        np.asarray(lie.axis_angle_to_R(r)), np.asarray(lie.so3_exp(r)), atol=1e-5
    )


def test_make_c2w(rng):
    r = random_w(rng, n=4)
    t = jnp.asarray(rng.normal(size=(4, 3)), dtype=jnp.float32)
    c2w = lie.make_c2w(r, t)
    assert c2w.shape == (4, 3, 4)
    np.testing.assert_allclose(np.asarray(c2w[..., 3]), np.asarray(t), atol=1e-6)


def test_pose_compose_invert(rng):
    R1 = jnp.asarray(ScipyRot.random(5, rng=rng).as_matrix(), jnp.float32)
    t1 = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    p1 = pose.make_pose(R1, t1)
    ident = pose.compose_pair(p1, pose.invert(p1))
    np.testing.assert_allclose(
        np.asarray(ident[..., :3]), np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(ident[..., 3]), 0.0, atol=1e-5)


def test_world2cam_roundtrip(rng):
    R = jnp.asarray(ScipyRot.random(rng=rng).as_matrix(), jnp.float32)
    t = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    w2c = pose.make_pose(R, t)
    X = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    Xc = pose.world2cam(X, w2c)
    X_back = pose.world2cam(Xc, pose.invert(w2c))
    np.testing.assert_allclose(np.asarray(X_back), np.asarray(X), atol=1e-5)


def test_procrustes_recovers_sim3(rng):
    X1 = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    R = jnp.asarray(ScipyRot.random(rng=rng).as_matrix(), jnp.float32)
    s, t = 2.3, jnp.asarray([1.0, -0.5, 0.3])
    X0 = s * X1 @ R.T + t
    sim3 = pose.procrustes(X0, X1)
    X1to0 = pose.apply_sim3(sim3, X1)
    np.testing.assert_allclose(np.asarray(X1to0), np.asarray(X0), atol=1e-3)


def test_rotation_distance(rng):
    angle = 0.7
    R1 = jnp.eye(3)
    R2 = jnp.asarray(
        ScipyRot.from_rotvec([0, 0, angle]).as_matrix(), jnp.float32
    )
    d = float(lie.rotation_distance(R1, R2))
    assert abs(d - angle) < 1e-4
