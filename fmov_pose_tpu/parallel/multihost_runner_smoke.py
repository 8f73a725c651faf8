"""Runner-level multi-host smoke: Runner.train under jax.distributed.

VERDICT r2 #7: the one-step `multihost_smoke` proved the DP math spans
processes; this module proves the WHOLE training orchestrator does —
dataset load, step dispatch, progressive-free GT training, checkpointing
and logging — with host-side writes owned by process 0 only (every rank
still executes each jitted program in lockstep; a rank skipping a global
SPMD program would deadlock the rest).

Launched by tests/test_multihost.py as N coordinated CPU processes (one
virtual device each; env FMOV_DISTRIBUTED=1 + FMOV_COORDINATOR/
FMOV_NUM_PROCESSES/FMOV_PROCESS_ID), and once single-process with N
virtual devices as the control. Prints ``MULTIHOST_RUNNER_LOSS`` (mean of
the final 5 step losses) from the main process; the test asserts the
multi-process value matches the control and that only rank 0 wrote
checkpoints/logs/recording.

The reference has no distributed path at all (SURVEY §2.3:
exp_runner.py is single-GPU) — this is new TPU-first design.
"""

from __future__ import annotations

import argparse
import os

GT_CONF = """
general {{
    base_exp_dir = {exp_dir}
    recording = [ ./ ]
}}
dataset {{
    data_dir = {data_dir}/
    render_cameras_name = cameras_sphere.npz
    object_cameras_name = cameras_sphere.npz
}}
train {{
    learning_rate = 5e-4
    learning_rate_alpha = 0.05
    end_iter = 40
    batch_size = 16
    validate_resolution_level = 4
    warm_up_end = 10
    anneal_end = 0
    use_white_bkgd = False
    save_freq = 100000
    val_freq = 1000000
    val_mesh_freq = 1000000
    report_freq = 10
    igr_weight = 0.1
    mask_weight = 0.1
}}
model {{
    nerf {{ D = 2, d_in = 4, d_in_view = 3, W = 32, multires = 2,
           multires_view = 2, output_ch = 4, skips=[1], use_viewdirs=True }}
    sdf_network {{ d_out = 33, d_in = 3, d_hidden = 32, n_layers = 4,
                  skip_in = [2], multires = 4, bias = 0.5, scale = 1.0,
                  geometric_init = True, weight_norm = True }}
    variance_network {{ init_val = 0.3 }}
    rendering_network {{ d_feature = 32, mode = idr, d_in = 9, d_out = 3,
                        d_hidden = 32, n_layers = 2, weight_norm = True,
                        multires_view = 2, squeeze_out = True }}
    neus_renderer {{ n_samples = 8, n_importance = 0, n_outside = 0,
                    up_sample_steps = 1, perturb = 1.0 }}
}}
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True,
                    help="per-process scratch dir (data is regenerated "
                         "deterministically, so ranks need not share it)")
    args = ap.parse_args()

    # attach to the coordinator BEFORE any jax device use
    from fmov_pose_tpu.parallel import dp
    dp.maybe_initialize_distributed()

    import jax

    from fmov_pose_tpu.data.synthetic import make_orbit_sequence
    from fmov_pose_tpu.train.runner import Runner

    data_dir = os.path.join(args.workdir, "SYN_ori")
    exp_dir = os.path.join(args.workdir, "exp")
    make_orbit_sequence(data_dir, n_frames=4, H=32, W=32, span_deg=40)
    conf_path = os.path.join(args.workdir, "gt.conf")
    with open(conf_path, "w") as f:
        f.write(GT_CONF.format(exp_dir=exp_dir, data_dir=data_dir))

    runner = Runner(conf_path, mode="train", case="SYN_ori",
                    has_global_conf=True)
    assert runner.use_dp, (
        f"expected DP over the global mesh, device_count="
        f"{jax.device_count()}")

    losses = []
    orig = runner.photo_step

    def wrapped(*a, **k):
        st, m = orig(*a, **k)
        losses.append(float(m["loss"]))
        return st, m

    runner.photo_step = wrapped
    runner.train()

    import numpy as np
    tail = float(np.mean(losses[-5:]))
    if runner.is_main:
        print(f"MULTIHOST_RUNNER_LOSS {tail:.10f} "
              f"n_devices={jax.device_count()} "
              f"n_processes={jax.process_count()}", flush=True)
    if jax.process_count() > 1:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
