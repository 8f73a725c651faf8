import numpy as np
from scipy.spatial.transform import Rotation as Rot

from fmov_pose_tpu.pipeline import evalpose


def make_traj(n=10, rng=None):
    rng = rng or np.random.default_rng(0)
    poses = []
    for i in range(n):
        T = np.eye(4)
        T[:3, :3] = Rot.from_rotvec(rng.normal(size=3) * 0.3).as_matrix()
        T[:3, 3] = rng.normal(size=3)
        poses.append(T)
    return np.stack(poses)


def test_identical_trajectories_zero_error():
    traj = make_traj()
    ate = evalpose.compute_ATE(traj, traj)
    rpe_t, rpe_r = evalpose.compute_rpe(traj, traj)
    assert ate < 1e-9 and rpe_t < 1e-9 and rpe_r < 1e-6


def test_sim3_alignment_removes_gauge():
    """A Sim(3)-transformed trajectory must align back to ~zero ATE."""
    gt = make_traj(12)
    s = 1.7
    R = Rot.from_rotvec([0.2, -0.1, 0.4]).as_matrix()
    t = np.array([0.5, -1.0, 2.0])
    est = gt.copy()
    est[:, :3, :3] = R[None] @ gt[:, :3, :3]
    est[:, :3, 3] = s * (gt[:, :3, 3] @ R.T) + t
    aligned = evalpose.align_ate_c2b_use_a2b(est, gt)
    ate = evalpose.compute_ATE(gt, aligned)
    assert ate < 1e-4
    rpe_t, rpe_r = evalpose.compute_rpe(gt, aligned)
    assert rpe_r < 1e-3  # f32 pose inputs limit achievable precision


def test_known_translation_offset():
    gt = make_traj(8)
    est = gt.copy()
    est[:, :3, 3] += np.array([0.1, 0.0, 0.0])  # uniform offset
    # without alignment the ATE is exactly 0.1
    assert abs(evalpose.compute_ATE(gt, est) - 0.1) < 1e-9


def test_rpe_rotation_value():
    gt = make_traj(5)
    est = gt.copy()
    # rotate every second pose by 5 degrees -> known mean rel-rot error
    extra = Rot.from_rotvec([0, 0, np.deg2rad(5)]).as_matrix()
    for i in range(1, 5, 2):
        est[i, :3, :3] = est[i, :3, :3] @ extra
    _, rpe_r = evalpose.compute_rpe(gt, est)
    assert 0 < np.rad2deg(rpe_r) <= 5.01


def test_umeyama_recovers_parameters():
    rng = np.random.default_rng(1)
    data = rng.normal(size=(40, 3))
    R = Rot.from_rotvec([0.3, 0.2, -0.4]).as_matrix()
    s, t = 2.5, np.array([1.0, 2.0, 3.0])
    model = s * data @ R.T + t
    s_e, R_e, t_e = evalpose.align_umeyama(model, data)
    assert abs(s_e - s) < 1e-6
    np.testing.assert_allclose(R_e, R, atol=1e-6)
    np.testing.assert_allclose(t_e, t, atol=1e-6)
