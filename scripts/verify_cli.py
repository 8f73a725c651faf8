#!/usr/bin/env python
"""/verify driver: the skill's tiny two-phase CLI recipe, scripted.

Shrinks the SHIPPED confs (schedule + model dims) onto a 5-frame 48^2
synthetic orbit and drives `exp_runner.py --mode train` two-phase on CPU
(JAX_PLATFORMS=cpu, axon sitecustomize dropped), then asserts the
success markers from .claude/skills/verify/SKILL.md: progressive
admission reached n_frames, the phase-1 -> phase-2 reboot happened,
phase-2 dataset + global_poses were written, a final mesh exists, rc 0.

Usage: python scripts/verify_cli.py [--work DIR] [--keep]
Runtime: ~5-10 min on one CPU core.
"""
import argparse
import glob
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# key -> (phase1, phase2); None = keep the shipped value.  Model dims are
# shrunk too (d_hidden 64 etc.) so the whole run is CPU-tractable.
# Keys may be scoped "section.key": model-dim names repeat across nested
# HOCON sections with DIFFERENT meanings (sdf_network d_out=257 is
# 1 sdf + 256 feature, rendering_network d_out=3 is rgb) — a global
# regex once clobbered the color net's d_out to 65 and the run "passed"
# rc-wise only because the reference-parity error-file-and-continue path
# swallowed the crash (see the no-error-file check below).
SCHEDULE = {
    "end_iter": (120, 60),
    "batch_size": (64, 64),
    "warm_up_end": (10, 10),
    "save_freq": (1000000, 1000000),
    "val_freq": (1000000, 1000000),
    "val_mesh_freq": (1000000, 1000000),
    "report_freq": (20, 20),
    "pose_freq": (1000000, 1000000),
    "max_pro_iteration": (15, None),
    "pro_warm_up_end": (8, None),
    "mesh_warmup_step": (10, None),
    "validate_resolution_level": (4, 4),
    "n_samples": (12, 12),
    "n_importance": (0, 8),
    "up_sample_steps": (1, 2),
    "sdf_network.d_out": (65, 65),
    "sdf_network.d_hidden": (64, 64),
    "sdf_network.n_layers": (4, 4),
    "sdf_network.skip_in": ("[2]", "[2]"),
    "sdf_network.multires": (4, 4),
    "rendering_network.d_feature": (64, 64),
    "rendering_network.d_hidden": (64, 64),
    "rendering_network.n_layers": (4, 4),
}


def patch_conf(src, dst, phase):
    """Patch SCHEDULE values into a HOCON conf, tracking the section
    stack ('a.b.key' entries only match key inside section b)."""
    with open(src) as f:
        lines = f.read().splitlines(True)
    flat = {k: v[phase] for k, v in SCHEDULE.items() if v[phase] is not None}
    stack, out = [], []
    for line in lines:
        named_open = re.match(r"\s*\"?([\w-]+)\"?\s*\{", line)
        for key, val in flat.items():
            *sec, name = key.split(".")
            if sec and stack[-len(sec):] != sec:
                continue
            line = re.sub(rf"^(\s*\"?{name}\"?\s*=\s*).*?(,?)$",
                          rf"\g<1>{val}\g<2>", line)
        n_open, n_close = line.count("{"), line.count("}")
        if named_open:
            stack.append(named_open.group(1))
            n_open -= 1
        stack.extend(["?"] * n_open)  # anonymous blocks
        if n_close:
            del stack[max(0, len(stack) - n_close):]
        out.append(line)
    with open(dst, "w") as f:
        f.write("".join(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default=None)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    work = args.work or tempfile.mkdtemp(prefix="fmov_verify_")
    os.makedirs(os.path.join(work, "confs"), exist_ok=True)
    root = os.path.join(work, "data", "HO3Dv3")
    os.makedirs(os.path.join(root, "ann"), exist_ok=True)

    from fmov_pose_tpu.data.synthetic import make_orbit_sequence
    make_orbit_sequence(os.path.join(root, "SYN_ori"), n_frames=5,
                        H=48, W=48, span_deg=40)
    make_orbit_sequence(os.path.join(root, "SYN"), n_frames=5, H=48, W=48,
                        span_deg=40, with_matches=False, with_crop=False)
    shutil.copy(os.path.join(root, "SYN", "cameras_sphere.npz"),
                os.path.join(root, "ann", "SYN.npz"))

    patch_conf(os.path.join(REPO, "confs", "ho3d_virtual.conf"),
               os.path.join(work, "confs", "ho3d_virtual.conf"), 0)
    patch_conf(os.path.join(REPO, "confs", "ho3d_global_womask.conf"),
               os.path.join(work, "confs", "ho3d_global_womask.conf"), 1)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # drop axon_site -> JAX_PLATFORMS honored
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, os.path.join(REPO, "exp_runner.py"),
           "--mode", "train", "--conf", "./confs/ho3d_virtual.conf",
           "--case", "SYN_ori",
           "--global_conf", "./confs/ho3d_global_womask.conf",
           "--final_mesh_resolution", "96"]
    print("+", " ".join(cmd))
    log_path = os.path.join(work, "verify_run.log")
    with open(log_path, "w") as f:
        rc = subprocess.call(cmd, cwd=work, env=env, stdout=f,
                             stderr=subprocess.STDOUT)
    log = open(log_path).read()
    print(log[-2000:])
    exp = os.path.join(work, "exp", "SYN_ori", "ours")
    g = os.path.join(exp, "ho3d_global_womask")

    # the Runner keeps reference parity by writing error_during_*.txt and
    # CONTINUING after a train-loop exception (`exp_runner.py:74-82`) — a
    # crash can therefore still exit rc 0; check for the marker explicitly
    error_files = glob.glob(os.path.join(work, "exp", "**", "error_*.txt"),
                            recursive=True)
    for ef in error_files:
        print("ERROR FILE:", ef)
        print(open(ef).read()[:1500])
    checks = {
        "rc == 0": rc == 0,
        "no error files": not error_files,
        "progressive admission reached 5":
            "admitted frames: 5" in log or "current_image: 5" in log
            or len(re.findall(r"admitted frames", log)) >= 4,
        "phase-2 reboot": "reboot the system for global training" in log,
        "global_poses written":
            bool(glob.glob(os.path.join(exp, "global_poses_*.npy"))),
        "phase-2 dataset written":
            os.path.exists(os.path.join(g, "cameras_sphere.npz")),
        "final mesh written":
            bool(glob.glob(os.path.join(g, "meshes", "*.ply"))),
    }
    ok = all(checks.values())
    for name, passed in checks.items():
        print(("PASS " if passed else "FAIL ") + name)
    if not args.keep and ok:
        shutil.rmtree(work)
    else:
        print("workdir kept:", work)
    print("VERIFY_OK" if ok else "VERIFY_FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
