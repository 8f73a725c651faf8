#!/usr/bin/env python
"""Full two-phase pipeline quality harness (real-scale nets, real chip).

Runs the complete product path on a synthetic free-moving sphere
sequence — progressive virtual-camera phase 1 (seg pose bank, flow,
admission curriculum), PnP alignment, phase-2 global refinement (gf),
final 512-res mesh — via the exp_runner CLI, then evaluates:

* phase-1 ATE/RPE (validate_poses against the partial annotations)
* phase-2 ATE vs the true orbit poses (name-matched Umeyama Sim(3))
* phase-2 render PSNR
* final mesh Chamfer to the analytic sphere (center/scale-aligned:
  the reconstructed frame differs from world by an arbitrary Sim(3))

Usage: python scripts/pipeline_quality.py [--p1_iters 3200]
       [--p2_iters 3000] [--frames 10] [--res 256]
One TPU process at a time — run alone.
"""

import argparse
import json
import os
import re
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def shrink_conf(src, dst, subs):
    text = open(src).read()
    for pat, rep in subs.items():
        text = re.sub(pat, rep, text)
    with open(dst, "w") as f:
        f.write(text)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p1_iters", type=int, default=3600)
    ap.add_argument("--p2_iters", type=int, default=3000)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--span", type=int, default=150)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--max_pro", type=int, default=250)
    ap.add_argument("--mesh_warmup", type=int, default=500)
    ap.add_argument("--occupancy", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="train.use_fused_train_kernels in BOTH phases")
    ap.add_argument("--p2_batch", type=int, default=512,
                    help="phase-2 batch size (the tpu_turbo preset runs "
                         "4096 with end_iter/8 — equal total rays)")
    ap.add_argument("--p2_lr", type=str, default=None,
                    help="phase-2 learning_rate override (e.g. 1e-3)")
    ap.add_argument("--p2_warmup", type=int, default=200,
                    help="phase-2 warm_up_end (scale down for short "
                         "big-batch schedules)")
    args = ap.parse_args()

    import numpy as np

    from fmov_pose_tpu.data.synthetic import make_orbit_sequence, SPHERE_RADIUS
    from fmov_pose_tpu.pipeline.chamfer import chamfer_distance
    from fmov_pose_tpu.pipeline import evalpose
    from fmov_pose_tpu.pipeline.meshio import read_ply

    work = tempfile.mkdtemp(prefix="fmov_pipeq_")
    os.makedirs(os.path.join(work, "data/HO3Dv3"), exist_ok=True)
    os.makedirs(os.path.join(work, "confs"), exist_ok=True)
    data_dir = os.path.join(work, "data/HO3Dv3/SYN_ori")
    gt = make_orbit_sequence(data_dir, n_frames=args.frames, H=args.res,
                             W=args.res, span_deg=args.span)
    make_orbit_sequence(os.path.join(work, "data/HO3Dv3/SYN"),
                        n_frames=args.frames, H=args.res, W=args.res,
                        span_deg=args.span, with_matches=False,
                        with_crop=False)

    common = {
        r"batch_size = \d+": "batch_size = 512",
        r"save_freq = \d+": "save_freq = 1000000",
        r"val_freq = \d+": "val_freq = 1000000",
        r"val_mesh_freq = \d+": "val_mesh_freq = 1000000",
        r"pose_freq = \d+": "pose_freq = 1000000",
        r"report_freq = \d+": "report_freq = 200",
        r"validate_resolution_level = \d+": "validate_resolution_level = 2",
    }
    shrink_conf(
        os.path.join(REPO, "confs/ho3d_virtual.conf"),
        os.path.join(work, "confs/virtual.conf"),
        dict(common, **{
            r"end_iter = \d+": f"end_iter = {args.p1_iters}",
            r"warm_up_end = \d+": "warm_up_end = 200",
            r"max_pro_iteration = \d+": f"max_pro_iteration = {args.max_pro}",
            r"pro_warm_up_end = \d+":
                f"pro_warm_up_end = {args.max_pro // 2}",
            r"mesh_warmup_step = \d+":
                f"mesh_warmup_step = {args.mesh_warmup}",
            # the synthetic 90-deg orbit would trip the 60-deg rotation
            # reset (which faithfully rewinds iter_step and re-runs the
            # mesh warm-up), blowing the iteration budget on a toy scene
            r"reset_rot_threshold = \d+": "reset_rot_threshold = 999",
            r"maintain_shape = True":
                "maintain_shape = True\n    occupancy_sampling = "
                + ("True" if args.occupancy else "False")
                + "\n    use_fused_train_kernels = "
                + ("True" if args.fused else "False"),
        }))
    p2_subs = dict(common, **{
        r"end_iter = \d+": f"end_iter = {args.p2_iters}",
        r"batch_size = \d+": f"batch_size = {args.p2_batch}",
        r"warm_up_end = \d+": f"warm_up_end = {args.p2_warmup}",
        r"mask_guided_sampling = True":
            "mask_guided_sampling = True\n    use_fused_train_kernels = "
            + ("True" if args.fused else "False"),
    })
    if args.p2_lr is not None:
        p2_subs[r"learning_rate = \S+"] = f"learning_rate = {args.p2_lr}"
    shrink_conf(
        os.path.join(REPO, "confs/ho3d_global_womask.conf"),
        os.path.join(work, "confs/ho3d_global.conf"),
        p2_subs)

    # drive the real CLI in-process: the parent already owns the (single,
    # shared) TPU via the site jax import — a subprocess would deadlock it
    import runpy
    argv_bak = sys.argv
    sys.argv = ["exp_runner.py", "--mode", "train",
                "--conf", "./confs/virtual.conf", "--case", "SYN_ori",
                "--global_conf", "./confs/ho3d_global.conf"]
    os.chdir(work)
    t0 = time.time()
    runpy.run_path(os.path.join(REPO, "exp_runner.py"), run_name="__main__")
    train_time = time.time() - t0
    sys.argv = argv_bak
    err_file = os.path.join(work, "exp/SYN_ori/ours",
                            "error_during_progressive_learning.txt")
    if os.path.exists(err_file):
        print("PHASE-1 ERROR FILE:")
        print(open(err_file).read()[:2000])

    from fmov_pose_tpu.train.runner import Runner

    # phase-1 pose quality (relative paths in the confs -> run from workdir)
    r1 = Runner(os.path.join(work, "confs/virtual.conf"),
                mode="validate_poses", case="SYN_ori", is_continue=True,
                has_global_conf=True)
    if r1.current_image != r1.dataset.n_images:
        print(f"WARNING: phase 1 admitted only {r1.current_image}/"
              f"{r1.dataset.n_images} frames (iter {r1.iter_step})")
    ate1 = r1.validate_poses()
    del r1

    # phase-2 runner: PSNR + learned poses vs the true orbit
    p2_dir = os.path.join(work, "exp/SYN_ori/ours/ho3d_global")
    r2 = Runner(os.path.join(work, "confs/ho3d_global.conf"), mode="validate",
                case="SYN", is_continue=True, exp_dir=p2_dir,
                has_global_conf=True)
    psnr2 = r2.validate_image(idx=0, resolution_level=2)

    name_to_gt = {n: p for n, p in zip(gt["names"], gt["poses"])}
    est, gtp = [], []
    learned = r2.query_poses(r2.dataset.n_images)
    for i in range(r2.dataset.n_images):
        name = r2.dataset.index_to_frame[i]
        if name in name_to_gt:
            est.append(learned[i])
            gtp.append(name_to_gt[name])
    ate2 = rpe_t2 = rpe_r2 = float("nan")
    if len(est) >= 3:
        est, gtp = np.stack(est), np.stack(gtp)
        aligned = evalpose.align_ate_c2b_use_a2b(est, gtp)
        ate2 = evalpose.compute_ATE(gtp, aligned)
        rpe_t2, rpe_r2 = evalpose.compute_rpe(gtp, aligned)

    # final mesh: Chamfer after center/scale alignment to the GT sphere
    mesh_dir = os.path.join(p2_dir, "meshes")
    plys = sorted(os.listdir(mesh_dir)) if os.path.isdir(mesh_dir) else []
    cd = float("nan")
    n_verts = 0
    if plys:
        verts, _ = read_ply(os.path.join(mesh_dir, plys[-1]))
        n_verts = len(verts)
        if n_verts > 100:
            center = verts.mean(axis=0)
            v = verts - center
            v = v * (SPHERE_RADIUS / np.linalg.norm(v, axis=-1).mean())
            rng = np.random.default_rng(0)
            d = rng.normal(size=(20000, 3))
            gt_pts = (d / np.linalg.norm(d, axis=-1, keepdims=True)
                      * SPHERE_RADIUS)
            if len(v) > 20000:
                v = v[rng.choice(len(v), 20000, replace=False)]
            cd, _, _ = chamfer_distance(v, gt_pts)

    print(json.dumps({
        "frames": args.frames, "res": args.res, "span_deg": args.span,
        "p1_occupancy": args.occupancy,
        "fused": args.fused,
        "p1_iters": args.p1_iters, "p2_iters": args.p2_iters,
        "p2_batch": args.p2_batch, "p2_lr": args.p2_lr,
        "pipeline_time_s": round(train_time, 1),
        "p1_ate": None if ate1 is None else round(float(ate1[0]), 5),
        "p2_psnr": round(float(psnr2), 2),
        "p2_ate": round(float(ate2), 5),
        "p2_rpe_trans": round(float(rpe_t2), 5),
        "p2_rpe_rot_deg": round(float(np.rad2deg(rpe_r2)), 4),
        "mesh_chamfer_aligned": round(float(cd), 6),
        "mesh_verts": n_verts,
        "workdir": work,
    }))


if __name__ == "__main__":
    main()
