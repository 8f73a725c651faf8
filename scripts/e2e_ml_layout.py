#!/usr/bin/env python
"""End-to-end run of the SHIPPED ML confs on an ML-layout synthetic
sequence (VERDICT r2 Missing #2: the ML half of the reference had never
executed).

Replicates the reference's ML workflow (`scripts/ours_ml_spaceinvader.
bash`: `exp_runner.py --mode train --conf confs/ml_virtual.conf --case
<case>_ori --global_conf confs/ml_global_womask.conf`) on a synthetic
orbit written in the ML directory schema:

    data/ML/SYN_ori/{image, mask_obj, transform_matrixs.npy}   (no ann!)
    data/ML/SYN/{image, mask_obj}
    data/ML/matches/SYN/*_matches.txt
    data/ML/camera.txt            <- ml_camera_intrinsics (fixed K)

This exercises the branches the HO3D harness cannot: the
`ml_camera_intrinsics` dataset branch (`models/dataset.py:215-233`), the
no-annotation alignment path (`utils/align_poses.py` ori_cam_path=None:
PnP against the phase-1 mesh with K from the txt), and the 'ml'
global-mask-dir dispatch in the runner.

Usage:
    PYTHONPATH=/root/repo python scripts/e2e_ml_layout.py --device cpu \
        --frames 5 --res 48 --tiny          # smoke (~6 min CPU)
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/e2e_ml_layout.py
                                            # full reduced run on chip
"""

import argparse
import glob
import os
import re
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from e2e_ho3d_layout import SCHEDULE, patch_conf  # noqa: E402

TINY = {
    "end_iter": (120, 60),
    "warm_up_end": (10, 10),
    "save_freq": (1000000, 1000000),
    "val_freq": (1000000, 1000000),
    "val_mesh_freq": (40, 1000000),
    "report_freq": (20, 20),
    "pose_freq": (1000000, 1000000),
    "max_pro_iteration": (15, None),
    "pro_warm_up_end": (8, None),
    "mesh_warmup_step": (10, None),
    "batch_size": (64, 64),
    "validate_resolution_level": (4, 4),
    "reset_based_on_rot": ("False", None),
}


def build_workdir(work, n_frames, res, tiny=False):
    from fmov_pose_tpu.data.synthetic import make_orbit_sequence
    root = os.path.join(work, "data", "ML")
    os.makedirs(os.path.join(work, "confs"), exist_ok=True)
    gt = make_orbit_sequence(os.path.join(root, "SYN_ori"),
                             n_frames=n_frames, H=res, W=res, span_deg=150)
    make_orbit_sequence(os.path.join(root, "SYN"), n_frames=n_frames,
                        H=res, W=res, span_deg=150,
                        with_matches=False, with_crop=False)
    # ML layout: intrinsics live in camera.txt, there is NO annotation npz
    with open(os.path.join(root, "camera.txt"), "w") as f:
        for row in gt["K"]:
            f.write(" ".join(f"{v:.8f}" for v in row) + "\n")
    np.save(os.path.join(work, "gt_poses.npy"), gt["poses"])
    for case in ("SYN_ori", "SYN"):
        npz = os.path.join(root, case, "cameras_sphere.npz")
        if os.path.exists(npz):
            os.remove(npz)

    sched = dict(TINY if tiny else SCHEDULE)
    for phase, (src, dst) in enumerate((
            ("ml_virtual.conf", "ml_virtual.conf"),
            ("ml_global_womask.conf", "ml_global_womask.conf"))):
        spath = os.path.join(REPO, "confs", src)
        dpath = os.path.join(work, "confs", dst)
        with open(spath) as f:
            text = f.read()
        for key, vals in sched.items():
            val = vals[phase]
            if val is None:
                continue
            text, n = re.subn(rf"(?m)^(\s*\"?{key}\"?\s*=\s*).*$",
                              rf"\g<1>{val}", text)
            assert n <= 1, (key, n)
        if tiny:
            # shrink the nets so the CPU smoke stays minutes, not hours
            for k, v in (("W", 64), ("D", 4), ('"?d_hidden"?', 64),
                         ("n_layers", 4), ("n_samples", 12),
                         ("up_sample_steps", 1), ("n_importance",
                                                  12 if phase else 0)):
                text = re.sub(rf"(?m)^(\s*\"?{k}\"?\s*=\s*).*$",
                              rf"\g<1>{v}", text)
            text = text.replace("skips=[4]", "skips=[2]")
            text = text.replace("skip_in = [4]", "skip_in = [2]")
        with open(dpath, "w") as f:
            f.write(text)


def run_cli(work, device):
    env = dict(os.environ)
    paths = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    if device == "cpu":
        paths = [p for p in paths if "axon_site" not in p]
        env["JAX_PLATFORMS"] = "cpu"
    elif not any("axon_site" in p for p in paths):
        paths.append("/root/.axon_site")
    if REPO not in paths:
        paths.insert(0, REPO)
    env["PYTHONPATH"] = os.pathsep.join(paths)
    cmd = [sys.executable, os.path.join(REPO, "exp_runner.py"),
           "--mode", "train", "--conf", "./confs/ml_virtual.conf",
           "--case", "SYN_ori",
           "--global_conf", "./confs/ml_global_womask.conf"]
    print("+", " ".join(cmd))
    proc = subprocess.run(cmd, cwd=work, env=env, text=True,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    with open(os.path.join(work, "e2e_run.log"), "w") as f:
        f.write(proc.stdout)
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        raise SystemExit(f"exp_runner failed rc={proc.returncode}")
    return proc.stdout


def verify_artifacts(work, log):
    exp = os.path.join(work, "exp", "SYN_ori", "ours")
    g = os.path.join(exp, "ml_global_womask")
    problems = []

    def need(pattern, what):
        hits = glob.glob(pattern)
        if not hits:
            problems.append(f"missing {what}: {pattern}")
        return sorted(hits)

    need(os.path.join(exp, "meshes", "*.ply"), "phase-1 meshes")
    need(os.path.join(exp, "checkpoints", "*.ckpt"), "phase-1 ckpts")
    need(os.path.join(exp, "global_poses_*.npy"), "aligned global poses")
    need(os.path.join(g, "cameras_sphere.npz"), "phase-2 dataset npz")
    need(os.path.join(g, "noise_cameras_sphere.npz"), "phase-2 noise npz")
    need(os.path.join(g, "checkpoints", "*.ckpt"), "phase-2 ckpts")
    mesh = need(os.path.join(g, "meshes", "*.ply"), "final mesh")
    assert "reboot the system for global training" in log, \
        "phase-2 reboot never happened"
    if problems:
        for p in problems:
            print("PROBLEM:", p)
        raise SystemExit("ML e2e artifacts incomplete")

    # score final poses against the synthetic GT (the ML layout carries
    # no annotations, so this harness keeps its own copy)
    gp = sorted(glob.glob(os.path.join(exp, "global_poses_*.npy")))
    gt = np.load(os.path.join(work, "gt_poses.npy"))
    poses = np.load(gp[-1])
    from fmov_pose_tpu.pipeline.evalpose import (
        align_ate_c2b_use_a2b, compute_ATE, compute_rpe)
    aligned = align_ate_c2b_use_a2b(poses.astype(np.float64),
                                    gt[:len(poses)].astype(np.float64))
    ate = compute_ATE(gt[:len(poses)], aligned)
    rpe_t, rpe_r = compute_rpe(gt[:len(poses)], aligned)
    print(f"ML E2E OK: phase-1-aligned ATE={ate:.4f} "
          f"rpe_rot={np.rad2deg(rpe_r):.3f} deg; final mesh: {mesh[-1]}")
    return ate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/e2e_ml")
    ap.add_argument("--device", choices=("tpu", "cpu"), default="tpu")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke schedule + shrunken nets (CPU-feasible)")
    ap.add_argument("--verify-only", action="store_true")
    args = ap.parse_args()

    if args.verify_only:
        with open(os.path.join(args.work, "e2e_run.log")) as f:
            verify_artifacts(args.work, f.read())
        return
    if os.path.exists(args.work):
        shutil.rmtree(args.work)
    os.makedirs(args.work)
    build_workdir(args.work, args.frames, args.res, tiny=args.tiny)
    log = run_cli(args.work, args.device)
    verify_artifacts(args.work, log)


if __name__ == "__main__":
    main()
