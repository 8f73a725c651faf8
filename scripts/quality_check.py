#!/usr/bin/env python
"""Quality harness: train GT-pose NeuS on a synthetic sphere sequence on
the attached chip, report PSNR + Chamfer-to-GT, f32 vs bf16.

Usage: python scripts/quality_check.py [--iters 3000] [--dtype bfloat16]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONF = """
general {{ base_exp_dir = {exp_dir}
          recording = [ ./ ] }}
dataset {{ data_dir = {data_dir}/
          render_cameras_name = cameras_sphere.npz
          object_cameras_name = cameras_sphere.npz }}
train {{ learning_rate = 5e-4
        learning_rate_alpha = 0.05
        end_iter = {iters}
        batch_size = 512
        validate_resolution_level = 2
        warm_up_end = 200
        anneal_end = 0
        use_white_bkgd = False
        save_freq = 1000000
        val_freq = 1000000
        val_mesh_freq = 1000000
        report_freq = 500
        igr_weight = 0.1
        mask_weight = 0.1
        compute_dtype = {dtype}
        use_fused_train_kernels = {fused}
        occupancy_sampling = {occ} }}
model {{
    nerf {{ D = 8, d_in = 4, d_in_view = 3, W = 256, multires = 10,
           multires_view = 4, output_ch = 4, skips=[4], use_viewdirs=True }}
    sdf_network {{ d_out = 257, d_in = 3, d_hidden = 256, n_layers = 8,
                  skip_in = [4], multires = 6, bias = 0.5, scale = 1.0,
                  geometric_init = True, weight_norm = True }}
    variance_network {{ init_val = 0.3 }}
    rendering_network {{ d_feature = 256, mode = idr, d_in = 9, d_out = 3,
                        d_hidden = 256, n_layers = 4, weight_norm = True,
                        multires_view = 4, squeeze_out = True }}
    neus_renderer {{ n_samples = 32, n_importance = 32, n_outside = 0,
                    up_sample_steps = 4, perturb = 1.0 }}
}}
"""


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=3000)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--frames", type=int, default=12)
    parser.add_argument("--occupancy", action="store_true")
    parser.add_argument("--fused", action="store_true",
                        help="train.use_fused_train_kernels (Pallas path)")
    parser.add_argument("--res", type=int, default=128)
    args = parser.parse_args()

    import numpy as np

    from fmov_pose_tpu.data.synthetic import make_orbit_sequence, SPHERE_RADIUS
    from fmov_pose_tpu.pipeline.chamfer import chamfer_distance
    from fmov_pose_tpu.pipeline.meshio import read_ply
    from fmov_pose_tpu.train.runner import Runner

    work = tempfile.mkdtemp(prefix="fmov_quality_")
    data_dir = os.path.join(work, "SYN")
    make_orbit_sequence(data_dir, n_frames=args.frames, H=args.res,
                        W=args.res, span_deg=150, with_matches=False,
                        with_crop=False)
    conf_path = os.path.join(work, "gt.conf")
    with open(conf_path, "w") as f:
        f.write(CONF.format(exp_dir=os.path.join(work, "exp"),
                            data_dir=data_dir, iters=args.iters,
                            dtype=args.dtype,
                            fused="True" if args.fused else "False",
                            occ="True" if args.occupancy else "False"))

    t0 = time.time()
    runner = Runner(conf_path, mode="train", case="SYN", has_global_conf=True)
    runner.train()
    train_time = time.time() - t0

    psnr = runner.validate_image(idx=0, resolution_level=2)
    mesh_path = runner.validate_mesh(resolution=128)
    verts, _ = read_ply(mesh_path)

    # ground truth: the analytic sphere surface
    rng = np.random.default_rng(0)
    d = rng.normal(size=(20000, 3))
    gt = d / np.linalg.norm(d, axis=-1, keepdims=True) * SPHERE_RADIUS
    if len(verts) > 20000:
        verts = verts[rng.choice(len(verts), 20000, replace=False)]
    cd, _, _ = chamfer_distance(verts, gt)

    print(json.dumps({
        "dtype": args.dtype, "iters": args.iters,
        "occupancy": args.occupancy, "fused": args.fused,
        "train_time_s": round(train_time, 1),
        "iters_per_sec": round(args.iters / train_time, 2),
        "psnr": round(psnr, 2),
        "chamfer": round(cd, 5),
        "mesh_verts": len(verts),
        "workdir": work,
    }))


if __name__ == "__main__":
    main()
