"""Smoke coverage for the bench harness builders (bench.py).

The driver runs bench.py on the real chip; these tests keep its two step
builders importable and runnable at toy sizes on the CPU mesh so a bench
regression is caught before a (scarce) chip window is spent on it.
"""

import jax
import numpy as np

import bench


def test_build_photo_step_runs_and_updates():
    photo_step, state, packed = bench.build(8, use_fused_train=False,
                                            phase2=False)
    # copy before stepping: the jitted step donates the state buffers
    w0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    assert photo_step.cfg.batch_size == 8       # probe hooks (phase2_probe)
    assert len(photo_step.data) == 4
    new_state, metrics = photo_step(state, packed)
    jax.block_until_ready(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    w1 = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    assert not np.allclose(w0, w1)              # Adam stepped


def test_build_phase2_gf_scan_runs():
    scan, state, n_img, k = bench.build_phase2_gf(8, k_steps=2)
    p0 = np.asarray(state.params["pose"]["lin1"]["w"]).copy()
    it0 = int(state.iter_step)
    new_state, metrics = scan(state, n_img)
    jax.block_until_ready(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.iter_step) == it0 + 2
    # gf pose leaves must receive updates through the scan
    p1 = np.asarray(new_state.params["pose"]["lin1"]["w"])
    assert not np.allclose(p0, p1)


def test_build_phase2_gf_scan_fused_interpret(monkeypatch):
    """The REAL fused phase-2 trace path at toy size (interpret pallas).

    Regression: r3 bench found two trace/lowering failures the unfused
    CPU smoke above cannot see — (a) grad tracing reached the no-vjp
    forward-only upsample pallas_call through rays_o/rays_d pose
    tangents ("Linearization failed to produce known values"), (b) a
    Mosaic narrow-dot verification error (TPU-only, caught by
    scripts/validate_rays_tpu.py).  This covers (a) and the full fused
    gate wiring for every kernel the real phase-2 step enables."""
    import numpy as np

    from fmov_pose_tpu.ops import fused_color, fused_sdf

    monkeypatch.setenv("FMOV_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(fused_sdf, "MIN_SAMPLES_RAYS", 0)
    monkeypatch.setattr(fused_color, "MIN_SAMPLES", 0)

    scan, state, n_img, k = bench.build_phase2_gf(8, k_steps=1)
    new_state, metrics = scan(state, n_img)
    jax.block_until_ready(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))


def test_idle_guard_reports_load():
    rep = bench.idle_guard(max_wait_s=0.0)
    assert "loadavg_at_start" in rep and "contended" in rep
    assert isinstance(rep["contended"], bool)
