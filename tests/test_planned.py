"""Planned-chunk dispatch == per-step dispatch, exactly.

`train.plan_chunk` batches k host-planned progressive steps into one
lax.scan dispatch (runner._train_planned + step_mod.make_planned_steps).
The planner consumes the same host RNG through the same `_plan_step`/
`_pro_tick`/`_maybe_regen_perms` sequence as the per-step loop, so the
two must produce the same training run: same device state (to float
tolerance across different XLA programs), same curriculum counters.
Covers mixed photo/flow chunks, mesh warm-up, admissions, warm-up-end
events and the short-chunk fallback (max_pro_iteration=15 is not a
multiple of the chunk size).
"""

import numpy as np
import pytest

import jax

from fmov_pose_tpu.data.synthetic import make_orbit_sequence
from fmov_pose_tpu.train.runner import Runner

from test_train_e2e import VIRTUAL_CONF, _write_conf


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("planned")
    make_orbit_sequence(str(root / "SYN_ori"), n_frames=5, H=48, W=48,
                        span_deg=40)
    return root


def _run(data_root, tmp_path, plan_chunk, name):
    conf = VIRTUAL_CONF.replace(
        "maintain_shape = True",
        f"maintain_shape = True\n    plan_chunk = {plan_chunk}")
    conf_path = _write_conf(
        tmp_path / f"{name}.conf", conf,
        exp_dir=str(tmp_path / name),
        data_dir=str(data_root / "SYN_ori"),
        flow_dir=str(data_root / "matches"),
        end_iter=75, batch=64)
    runner = Runner(conf_path, mode="train", case="SYN_ori",
                    has_global_conf=True)
    runner.train()
    return runner


def test_planned_matches_per_step(data_root, tmp_path):
    a = _run(data_root, tmp_path, 1, "per_step")
    b = _run(data_root, tmp_path, 4, "planned")

    # same curriculum trajectory (host side)
    assert a.iter_step == b.iter_step
    assert a.current_image == b.current_image
    assert a.pro_iteration == b.pro_iteration
    assert a.current_pose_mlp_index == b.current_pose_mlp_index
    np.testing.assert_array_equal(a.seg_progress, b.seg_progress)
    np.testing.assert_array_equal(a.seg_frozen, b.seg_frozen)
    # same host RNG consumption -> identical next draws
    assert a.rng.integers(1 << 30) == b.rng.integers(1 << 30)

    # same device state (different XLA programs -> float tolerance)
    for pa, pb in zip(jax.tree_util.tree_leaves(a.state.params),
                      jax.tree_util.tree_leaves(b.state.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=2e-5, rtol=2e-5)
    for pa, pb in zip(
            jax.tree_util.tree_leaves(a.state.pose_bank["train"]),
            jax.tree_util.tree_leaves(b.state.pose_bank["train"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(a.state.pose_bank["static"]["init_c2w"]),
        np.asarray(b.state.pose_bank["static"]["init_c2w"]),
        atol=2e-5, rtol=2e-5)
    assert int(a.state.iter_step) == int(b.state.iter_step)
