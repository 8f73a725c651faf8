#!/usr/bin/env python
"""Reference-scale sequence probe: progressive phase-1 at 12/64/128 frames.

VERDICT r3 Missing #1: the progressive subsystem exists for long videos
(the shipped schedule admits ~300 frames, one segment pose MLP each —
`/root/reference/confs/ho3d_virtual.conf:22,46-49`), but nothing had ever
run past 12 frames / 12 segments.  This probe runs the full Runner on an
n-frame synthetic orbit with image_interval=1 (one segment MLP per frame),
shipped batch/sample counts, and reports:

* Runner init wall-clock (segment-bank creation is O(S) host work),
* steady it/s EARLY in the run (few segments active) vs LATE (all ~n
  segments admitted) — any O(n_segments) per-step cost shows as drift,
* end-of-run pose quality (ATE/RPE vs the synthetic GT orbit) so the
  long lazy-init chain is verified, not just fast.

One JSON line per run. ONE TPU process at a time (shared chip).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/long_seq_probe.py \
           [n_frames] [adm_iters] [plan_chunk] [res]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

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
    batch_size = 512
    validate_resolution_level = 4
    warm_up_end = 50
    anneal_end = 0
    use_white_bkgd = False
    save_freq = 1000000, val_freq = 1000000, val_mesh_freq = 1000000
    report_freq = 500, pose_freq = 1000000
    igr_weight = 0.1, mask_weight = 5, flow_weight = 0.1
    progressive = True, flow_interval = 10
    pose_lr = 5e-4, pose_alpha = 0.5
    max_pro_iteration = {adm_iters}
    pro_warm_up_end = {warm_iters}
    image_interval = 1, current_image = 1
    mesh_warmup_step = {adm_iters}
    emphasize_rot = True
    mask_guided_sampling = True, mask_guided_patch_size = 10
    reset_based_on_rot = False
    maintain_shape = True
    use_fused_train_kernels = True
    plan_chunk = {plan_chunk}
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
    neus_renderer {{ n_samples = 32, n_importance = 0,
                    n_outside = 0, up_sample_steps = 4, perturb = 1.0 }}
}}
"""


class WindowTimer:
    """it/s over [lo, hi) iteration windows, driven by a step-fn wrapper."""

    def __init__(self):
        self.marks = []  # (iter, time)

    def mark(self, it):
        self.marks.append((it, time.time()))

    def rate(self, lo, hi):
        pts = [(i, t) for i, t in self.marks if lo <= i <= hi]
        if len(pts) < 2:
            return float("nan")
        (i0, t0), (i1, t1) = pts[0], pts[-1]
        return (i1 - i0) / max(t1 - t0, 1e-9)


def run(n_frames, adm_iters, plan_chunk, res):
    tmp = tempfile.mkdtemp(prefix=f"longseq{n_frames}_")
    data_dir = os.path.join(tmp, "SYN_ori")
    span = min(40.0 + 2.6 * n_frames, 340.0)
    print(f"LONGSEQ-PROGRESS data gen start ({n_frames} frames @ {res}^2)",
          flush=True)
    t0 = time.time()
    make_orbit_sequence(data_dir, n_frames=n_frames, H=res, W=res,
                        span_deg=span)
    t_data = time.time() - t0
    print(f"LONGSEQ-PROGRESS data gen done in {t_data:.1f}s", flush=True)
    end_iter = adm_iters * (n_frames + 2)
    conf_path = os.path.join(tmp, "probe.conf")
    with open(conf_path, "w") as f:
        f.write(CONF.format(exp_dir=os.path.join(tmp, "exp"),
                            data_dir=data_dir,
                            flow_dir=os.path.join(tmp, "matches"),
                            end_iter=end_iter, adm_iters=adm_iters,
                            warm_iters=adm_iters // 2,
                            plan_chunk=plan_chunk))
    t0 = time.time()
    r = Runner(conf_path, mode="train", case="SYN_ori", has_global_conf=True)
    t_init = time.time() - t0
    print(f"LONGSEQ-PROGRESS runner init done in {t_init:.1f}s; training "
          f"{end_iter} iters", flush=True)

    timer = WindowTimer()
    orig_plan = r._plan_step

    def plan_marked():
        timer.mark(r.iter_step)
        return orig_plan()

    r._plan_step = plan_marked
    t0 = time.time()
    r.train()
    t_train = time.time() - t0

    # windows: early = segments [4..8] active; late = last 25% of the run
    early = (adm_iters * 4, adm_iters * 8)
    late = (int(r.iter_step * 0.75), r.iter_step)
    ate, rpe_t, rpe_r, _, _ = r.validate_poses()
    out = {
        "n_frames": n_frames,
        "n_segments": r.n_segments,
        "final_image": r.current_image,
        "iters": r.iter_step,
        "plan_chunk": plan_chunk,
        "data_gen_s": round(t_data, 1),
        "runner_init_s": round(t_init, 1),
        "train_s": round(t_train, 1),
        "it_per_s_early": round(timer.rate(*early), 2),
        "it_per_s_late": round(timer.rate(*late), 2),
        "ate": round(float(ate), 4),
        "rpe_trans": round(float(rpe_t), 4),
        "rpe_rot_deg": round(float(np.rad2deg(rpe_r)), 3),
    }
    print("LONGSEQ " + json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    adm_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    plan_chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    res = int(sys.argv[4]) if len(sys.argv) > 4 else 192
    run(n_frames, adm_iters, plan_chunk, res)
