"""Measure phase-1 (progressive seg) steady-state training throughput.

Runs the full Runner on a synthetic sequence with reference-scale nets,
timing the training loop wall-clock. One TPU process at a time (single
shared chip). argv: scan fused occ [batch n_samples n_importance].

History: this probe killed the seg-scan dispatch path (round 2) — at its
claimed niche (batch 128, 32 samples, ~25 ms dispatch-dominated steps)
per-step dispatch won 39.7 vs 34.2 it/s, so the chunked-scan machinery
was deleted. The `scan` argument now only exercises train.scan_steps,
which the progressive phase ignores.
"""
import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fmov_pose_tpu.data.synthetic import make_orbit_sequence
from fmov_pose_tpu.train.runner import Runner

CONF = """
general {{ base_exp_dir = {exp_dir}
          recording = [ ./ ] }}
dataset {{ data_dir = {data_dir}/
          render_cameras_name = cameras_sphere.npz
          object_cameras_name = cameras_sphere.npz
          loftr_interval_flow_dir = {flow_dir}
          crop = True, partial_ann = True, mask_init = True }}
train {{
    learning_rate = 5e-4
    learning_rate_alpha = 0.05
    end_iter = {end_iter}
    batch_size = {batch}
    validate_resolution_level = 4
    warm_up_end = 50
    anneal_end = 0
    use_white_bkgd = False
    save_freq = 1000000, val_freq = 1000000, val_mesh_freq = 1000000
    report_freq = 100, pose_freq = 1000000
    igr_weight = 0.1, mask_weight = 5, flow_weight = 0.1
    progressive = True, flow_interval = 10
    pose_lr = 5e-4, pose_alpha = 0.5
    max_pro_iteration = 100
    pro_warm_up_end = 50
    image_interval = 1, current_image = 1
    mesh_warmup_step = 100
    emphasize_rot = True
    mask_guided_sampling = True, mask_guided_patch_size = 10
    reset_based_on_rot = False
    maintain_shape = True
    scan_steps = {scan}
    use_fused_train_kernels = {fused}
    occupancy_sampling = {occ}
}}
model {{
    pose_type = seg
    barf = True
    nerf {{ D = 8, d_in = 4, d_in_view = 3, W = 256, multires = 10,
           multires_view = 4, output_ch = 4, skips=[4], use_viewdirs=True }}
    sdf_network {{ d_out = 257, d_in = 3, d_hidden = 256, n_layers = 8,
                  skip_in = [4], multires = 6, bias = 0.5, scale = 1.0,
                  geometric_init = True, weight_norm = True }}
    variance_network {{ init_val = 0.3 }}
    rendering_network {{ d_feature = 256, mode = idr, d_in = 9, d_out = 3,
                        d_hidden = 256, n_layers = 4, weight_norm = True,
                        multires_view = 4, squeeze_out = True }}
    neus_renderer {{ n_samples = {n_samples}, n_importance = {n_importance},
                    n_outside = 0, up_sample_steps = 4, perturb = 1.0 }}
}}
"""


def build_runner(scan="True", fused="True", occ="False", batch=512,
                 n_samples=64, n_importance=64, end_iter=300):
    """Fresh probe Runner on a synthetic sequence (also used by
    scripts/phase1_decomp.py to time the host planner in isolation)."""
    tmp = tempfile.mkdtemp()
    data_dir = os.path.join(tmp, "SYN_ori")
    make_orbit_sequence(data_dir, n_frames=8, H=128, W=128, span_deg=70)
    conf_path = os.path.join(tmp, "probe.conf")
    with open(conf_path, "w") as f:
        f.write(CONF.format(exp_dir=os.path.join(tmp, "exp"),
                            data_dir=data_dir,
                            flow_dir=os.path.join(tmp, "matches"),
                            end_iter=end_iter, scan=scan, fused=fused,
                            occ=occ, batch=batch, n_samples=n_samples,
                            n_importance=n_importance))
    return Runner(conf_path, mode="train", case="SYN_ori",
                  has_global_conf=True)


def run(scan, fused, warm_iter=300, steady_iter=400, occ="False",
        batch=512, n_samples=64, n_importance=64):
    r = build_runner(scan, fused, occ, batch, n_samples, n_importance,
                     end_iter=warm_iter)
    r.train()  # compiles everything (all chunk sizes recur within 300 iters)
    r.end_iter = warm_iter + steady_iter
    t0 = time.time()
    r.train()  # warm: compiled fns are cached on the Runner
    dt = time.time() - t0
    return steady_iter, dt


if __name__ == "__main__":
    scan = sys.argv[1] if len(sys.argv) > 1 else "True"
    fused = sys.argv[2] if len(sys.argv) > 2 else "True"
    occ = sys.argv[3] if len(sys.argv) > 3 else "False"
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    n_samples = int(sys.argv[5]) if len(sys.argv) > 5 else 64
    n_importance = int(sys.argv[6]) if len(sys.argv) > 6 else 64
    iters, dt = run(scan, fused, occ=occ, batch=batch, n_samples=n_samples,
                    n_importance=n_importance)
    rays = iters * batch * 2  # maintain_shape doubles the ray count
    print(f"RESULT scan={scan} fused={fused} occ={occ} batch={batch} "
          f"samples={n_samples}+{n_importance}: {iters} steady "
          f"iters in {dt:.1f}s = {iters / dt:.1f} it/s, {rays / dt:.0f} rays/s")
