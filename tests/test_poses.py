import jax
import jax.numpy as jnp
import numpy as np

from fmov_pose_tpu.core.pose import to_4x4
from fmov_pose_tpu.poses import picture_pose as pp


def test_gf_initial_pose_close_to_init():
    """With small-std heads, the predicted pose should start near init_c2w."""
    init = np.eye(4, dtype=np.float32)
    init[:3, 3] = [0.1, 0.2, -1.5]
    cfg = pp.PoseCfg()
    params = pp.init_gf(0, cfg, init[None].repeat(5, 0))
    pose = np.asarray(pp.gf_apply(params, cfg, 2))
    assert pose.shape == (3, 4)
    np.testing.assert_allclose(pose[:3, 3], init[:3, 3], atol=0.2)


def test_gf_emphasize_rot_zero_trans_delta():
    """emphasize_rot: trans head is zero-init+frozen; translation comes only
    from init_c2w * scale (scale ~ 1 at init)."""
    init = np.eye(4, dtype=np.float32)
    init[:3, 3] = [0.0, 0.0, -2.0]
    cfg = pp.PoseCfg(emphasize_rot=True)
    params = pp.init_gf(0, cfg, init[None])
    pose = np.asarray(pp.gf_apply(params, cfg, 0))
    # t = R_delta @ (init_t * scale) + V u where u = 0
    assert np.linalg.norm(pose[:3, 3]) > 1.5  # inherits |init_t| ~ 2 * ~1


def test_gf_differentiable():
    cfg = pp.PoseCfg(emphasize_rot=True)
    params = pp.init_gf(0, cfg, np.eye(4, dtype=np.float32)[None])

    def loss(train):
        p = {"train": train, "static": params["static"]}
        return pp.gf_apply(p, cfg, 0).sum()

    g = jax.grad(loss)(params["train"])
    assert any(float(jnp.abs(l).max()) > 0
               for l in jax.tree_util.tree_leaves(g))


def test_seg_bank_shapes():
    cfg = pp.PoseCfg(emphasize_rot=True)
    bank = pp.init_seg_bank(0, cfg, n_images=10, segment_img_num=3,
                            init_c2w=np.eye(4, dtype=np.float32))
    S = pp.num_segments(10, 3)
    assert S == 4
    assert bank["train"]["lin1"]["w"].shape == (S, 64, 256)
    assert bank["static"]["init_c2w"].shape == (S, 4, 4)
    pose = pp.seg_apply(bank, cfg, 3, 7)
    assert pose.shape == (3, 4)


def test_seg_segments_have_distinct_bands():
    cfg = pp.PoseCfg()
    bank = pp.init_seg_bank(0, cfg, 6, 2, np.eye(4, dtype=np.float32))
    b = np.asarray(bank["static"]["b"])
    assert not np.allclose(b[0], b[1])


def test_seg_initialize_copies_last_pose():
    cfg = pp.PoseCfg(emphasize_rot=True)
    bank = pp.init_seg_bank(0, cfg, 6, 2, np.eye(4, dtype=np.float32))
    assert not bool(bank["static"]["initialized"][1])
    last_pose = pp.gf_apply(pp.seg_slice(bank, 0), cfg, 1)
    bank2 = pp.seg_initialize(bank, cfg, 2, 1)
    assert bool(bank2["static"]["initialized"][1])
    np.testing.assert_allclose(
        np.asarray(bank2["static"]["init_c2w"][1]),
        np.asarray(to_4x4(last_pose)), atol=1e-6)
    # idempotent
    bank3 = pp.seg_initialize(bank2, cfg, 2, 1)
    np.testing.assert_array_equal(
        np.asarray(bank3["static"]["init_c2w"][1]),
        np.asarray(bank2["static"]["init_c2w"][1]))


def test_seg_continuity_after_init():
    """Right after lazy init, the new segment's pose at its first frame
    should be close to the previous segment's last pose (continuity)."""
    cfg = pp.PoseCfg(emphasize_rot=True)
    bank = pp.init_seg_bank(0, cfg, 6, 2, np.eye(4, dtype=np.float32))
    last = np.asarray(pp.gf_apply(pp.seg_slice(bank, 0), cfg, 1))
    bank = pp.seg_initialize(bank, cfg, 2, 1)
    first_new = np.asarray(pp.seg_apply(bank, cfg, 2, 2))
    np.testing.assert_allclose(first_new[:, :3], last[:, :3], atol=0.1)
