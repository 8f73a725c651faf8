"""Disk-fixture loader parity vs the torch reference (VERDICT r4 Next #8).

Real HO3Dv3/ML data cannot land on this box, so this is the
readiness audit run the other direction: a bit-faithful on-disk fixture
in the reference's published format — BGR byte PNGs under `image/`,
byte masks under `mask_obj/`, `cameras_sphere.npz` with PARTIAL
annotations (`world_mat_{frame}` missing for odd frames —
`/root/reference/models/dataset.py:249-280`), identity
`transform_matrixs.npy` crop transforms, and tab-separated LoFTR match
txt files under `<root>/matches/<seq>/` — is loaded by BOTH
implementations (`/root/reference/models/dataset.py:146-545` under the
torch-CPU patch, and `fmov_pose_tpu.data.dataset.Dataset`), and every
loader product plus the deterministic core of
`gen_random_rays_at` / `gen_random_ray_pairs_at`
(`/root/reference/models/dataset.py:634-793`) is asserted identical.

Randomness is factored out the same way the Runner does: the reference's
pixel draws are captured (torch.randint monkeypatched / returned
pixels_xy reused) and fed through our deterministic raygen
(`fmov_pose_tpu.data.rays`), so "identical rays" means identical
math on identical disk-loaded inputs, not identical RNG streams.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
_SCRIPTS = os.path.join(REPO, "scripts")
for _p in (os.path.join(_SCRIPTS, "ref_shims"), REF, _SCRIPTS):
    if _p not in sys.path:
        sys.path.insert(0, _p)

pytest.importorskip("models.dataset",
                    reason="reference checkout not available")

N_FRAMES, H, W = 6, 48, 48


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    from fmov_pose_tpu.data.synthetic import make_orbit_sequence
    root = tmp_path_factory.mktemp("ho3d_format_fixture")
    make_orbit_sequence(str(root / "SYN_ori"), n_frames=N_FRAMES, H=H, W=W,
                        span_deg=90.0, ann_stride=2)  # odd frames un-annotated
    return str(root)


def _conf_text(root):
    return f"""
d {{
    data_dir = {root}/SYN_ori/
    render_cameras_name = cameras_sphere.npz
    object_cameras_name = cameras_sphere.npz
    partial_ann = True
    crop = True
    loftr_interval_flow_dir = {root}/matches
    filter_match_outliers = True
    mask_init = True
}}
"""


@pytest.fixture(scope="module")
def datasets(fixture_root):
    from run_reference import patch_torch_cpu
    patch_torch_cpu()
    from models.dataset import Dataset as RefDataset
    from fmov_pose_tpu.data import hocon
    from fmov_pose_tpu.data.dataset import Dataset as OursDataset
    conf = hocon.parse_string(_conf_text(fixture_root))["d"]
    return RefDataset(conf), OursDataset(conf)


def test_loader_products_identical(datasets):
    ref, ours = datasets
    assert ref.n_images == ours.n_images == N_FRAMES
    # byte-image decode path: cv.imread BGR / 256.0 on both sides
    np.testing.assert_array_equal(ref.images_np, ours.images_np)
    np.testing.assert_array_equal(ref.masks_np, ours.masks_np)
    # partial annotation: only even frames annotated
    assert ref.avai_ann_frame == list(ours.avai_ann_frame) == [0, 2, 4]
    np.testing.assert_array_equal(np.stack(ref.scale_mats_np),
                                  np.stack(ours.scale_mats_np))
    # K/R/t decomposition of P = world_mat @ scale_mat (un-annotated
    # frames inherit the first annotated frame's intrinsics)
    np.testing.assert_allclose(
        torch.stack(list(ref.intrinsics_all)).numpy(),
        ours.intrinsics_all, rtol=0, atol=1e-5)
    np.testing.assert_allclose(ref.pose_all.numpy()
                               if torch.is_tensor(ref.pose_all)
                               else torch.stack(list(ref.pose_all)).numpy(),
                               ours.pose_all, rtol=0, atol=1e-5)
    assert torch.is_tensor(ref.intrinsics_all_inv) or True
    np.testing.assert_allclose(
        np.asarray(ref.intrinsics_all_inv.cpu() if torch.is_tensor(
            ref.intrinsics_all_inv) else ref.intrinsics_all_inv),
        ours.intrinsics_all_inv, rtol=0, atol=1e-4)


def test_loftr_match_tables_identical(datasets):
    """3-sigma outlier filter + crop transform + border + mask filtering
    (`/root/reference/models/dataset.py:340-410`) produce the same match
    tables, both directions of every pair."""
    ref, ours = datasets
    assert set(ref.loftr_interval_flows) == set(ours.loftr_flows)
    assert len(ref.loftr_interval_flows) == 2 * (N_FRAMES - 1)
    for tag, ref_tuple in ref.loftr_interval_flows.items():
        for a, b in zip(ref_tuple, ours.loftr_flows[tag]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ({k: set(v) for k, v in ref.flow_pairs.items()}
            == {k: set(v) for k, v in ours.flow_pairs.items()})


def test_mask_init_pose_identical(datasets):
    ref, ours = datasets
    assert ours.max_mask_pose is not None
    np.testing.assert_allclose(np.asarray(ref.max_mask_pose.cpu()),
                               ours.max_mask_pose, rtol=0, atol=1e-5)


def test_gen_random_rays_identical(datasets, monkeypatch):
    """gen_random_rays_at's deterministic core on disk-loaded data: the
    reference's torch.randint pixel draws are captured and replayed
    through our raygen; rays_o / rays_v / color / mask must match."""
    import jax
    from fmov_pose_tpu.data import rays as raygen
    ref, ours = datasets
    rng = np.random.default_rng(7)
    batch = 64
    px = rng.integers(0, W, size=batch)
    py = rng.integers(0, H, size=batch)
    draws = [torch.from_numpy(px).long(), torch.from_numpy(py).long()]
    monkeypatch.setattr(torch, "randint",
                        lambda *a, **k: draws.pop(0))
    img_idx = 2
    pose_t = (ref.pose_all[img_idx] if torch.is_tensor(ref.pose_all)
              else ref.pose_all[img_idx])
    data_ref, _ = ref.gen_random_rays_at(img_idx, batch, pose_t,
                                         mask_guided_sampling=False)
    data_ref = np.asarray(data_ref.cpu())

    ro, rv, _ = raygen.pixels_to_rays(
        px.astype(np.float32), py.astype(np.float32),
        ours.intrinsics_all_inv[img_idx], ours.pose_all[img_idx][:3, :4])
    planes = np.transpose(ours.images_np, (3, 0, 1, 2))  # [3,N,H,W]
    col = raygen.gather_rgb(planes, img_idx, py, px)
    mask_planes = np.transpose(ours.masks_np, (3, 0, 1, 2))
    msk = raygen.gather_rgb(mask_planes, img_idx, py, px)[:, :1]
    ours_data = np.concatenate([np.asarray(ro), np.asarray(rv),
                                np.asarray(col), np.asarray(msk)], -1)
    np.testing.assert_allclose(data_ref, ours_data, rtol=0, atol=1e-5)


def test_gen_ray_pairs_identical(datasets):
    """gen_random_ray_pairs_at on disk-loaded matches: the reference
    selects match rows with np.random (seeded here); its returned
    pixels_xy / pixels_xy_corr are replayed through our gen_flow_rays."""
    import jax
    from fmov_pose_tpu.data import rays as raygen
    ref, ours = datasets
    img_id_corr = torch.tensor(2).long()

    def pose_network(idx):
        i = int(idx)
        p = (ref.pose_all[i] if torch.is_tensor(ref.pose_all)
             else ref.pose_all[i])
        return p

    np.random.seed(3)
    batch = 32
    data_ref, pixels_xy, pixels_xy_corr, img_id, _ = \
        ref.gen_random_ray_pairs_at(img_id_corr, batch, pose_network,
                                    current_img_num=N_FRAMES, interval=1)
    assert data_ref is not None
    data_ref = np.asarray(data_ref.cpu())
    pixels_xy = np.asarray(pixels_xy.cpu())
    pixels_xy_corr = np.asarray(pixels_xy_corr.cpu())
    i_corr, i1 = int(img_id_corr), int(img_id)

    ro_c, rv_c = raygen.gen_flow_rays(
        pixels_xy_corr.astype(np.float32),
        ours.intrinsics_all_inv[i_corr], ours.pose_all[i_corr][:3, :4])
    ro_1, rv_1 = raygen.gen_flow_rays(
        pixels_xy.astype(np.float32),
        ours.intrinsics_all_inv[i1], ours.pose_all[i1][:3, :4])
    planes = np.transpose(ours.images_np, (3, 0, 1, 2))
    col_c = raygen.gather_rgb(planes, i_corr,
                              pixels_xy_corr[:, 1].astype(np.int32),
                              pixels_xy_corr[:, 0].astype(np.int32))
    col_1 = raygen.gather_rgb(planes, i1,
                              pixels_xy[:, 1].astype(np.int32),
                              pixels_xy[:, 0].astype(np.int32))
    ours_first = np.concatenate(
        [np.asarray(ro_c), np.asarray(rv_c), np.asarray(col_c)], -1)
    ours_second = np.concatenate(
        [np.asarray(ro_1), np.asarray(rv_1), np.asarray(col_1)], -1)
    half = data_ref.shape[0] // 2
    np.testing.assert_allclose(data_ref[:half, :9], ours_first,
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(data_ref[half:, :9], ours_second,
                               rtol=0, atol=1e-5)
