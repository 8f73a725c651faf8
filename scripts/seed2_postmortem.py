"""Per-frame post-mortem of a diverged h2h run (VERDICT r4 Weak #3).

Loads the saved pose trajectories of an h2h workdir (phase-1
`global_poses_*.npy` at the transition and phase-2 `poses_*.npy`),
Sim(3)-aligns each to the synthetic GT orbit, and prints PER-FRAME
rotation / translation errors — pinpointing which segment's pose draw
left the basin and when (phase 1 vs phase 2).

Pure numpy on saved artifacts: safe to run while the TPU and the CPU
core are busy with other work.

Usage: python scripts/seed2_postmortem.py /root/hth ours_s2
"""
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fmov_pose_tpu.pipeline import evalpose  # noqa: E402
from scripts.headtohead import gt_poses, load_ref_pose_dict  # noqa: E402


def _angle_deg(R):
    cos = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    return float(np.rad2deg(np.arccos(cos)))


def per_frame_errors(est, gt):
    """Per-frame errors after ATE alignment.

    Columns: translation error; absolute rotation error after removing the
    best GLOBAL rotation offset (Procrustes over all frames — ATE alignment
    only fixes positions, so a consistent orientation-convention offset
    would otherwise swamp the signal); and the consecutive-frame RELATIVE
    rotation error (est_i->est_{i+1} vs gt_i->gt_{i+1}) — the quantity RPE
    measures, localized to the transition that broke it.
    """
    est_aligned = evalpose.align_ate_c2b_use_a2b(est, gt)
    # global rotation offset: R* = argmin_R sum ||R Rest_i - Rgt_i||_F
    M = sum(gt[i, :3, :3] @ est_aligned[i, :3, :3].T for i in range(len(gt)))
    U, _, Vt = np.linalg.svd(M)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
    R_star = U @ S @ Vt
    rows = []
    for i in range(len(gt)):
        dt = float(np.linalg.norm(est_aligned[i, :3, 3] - gt[i, :3, 3]))
        rot_abs = _angle_deg(R_star @ est_aligned[i, :3, :3]
                             @ gt[i, :3, :3].T)
        if i + 1 < len(gt):
            rel_est = est_aligned[i, :3, :3].T @ est_aligned[i + 1, :3, :3]
            rel_gt = gt[i, :3, :3].T @ gt[i + 1, :3, :3]
            rot_rel = _angle_deg(rel_est @ rel_gt.T)
        else:
            rot_rel = 0.0
        rows.append((i, rot_abs, dt, rot_rel))
    return rows, est_aligned


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/root/hth"
    side = sys.argv[2] if len(sys.argv) > 2 else "ours_s2"
    gt = gt_poses(work)
    exp = os.path.join(work, side, "exp", "SYN_ori", "ours")

    out = {"side": side}
    for label, pattern, loader in (
        ("phase1", os.path.join(exp, "global_poses_*.npy"),
         lambda p: np.load(p)),
        ("phase2", os.path.join(exp, "ho3d_global_womask", "poses_*.npy"),
         lambda p: (load_ref_pose_dict(p)[0]
                    if np.load(p, allow_pickle=True).dtype == object
                    else np.load(p))),
    ):
        paths = sorted(glob.glob(pattern), key=os.path.getmtime)
        if not paths:
            print(f"{label}: no pose artifact ({pattern})")
            continue
        est = loader(paths[-1])
        n = min(len(est), len(gt))
        rows, _ = per_frame_errors(est[:n], gt[:n])
        med_rel = float(np.median([r for _, _, _, r in rows[:-1]])) or 0.1
        print(f"\n== {label} ({os.path.basename(paths[-1])}) ==")
        print(f"{'frame':>5} {'rot_abs_deg':>12} {'trans_err':>10} "
              f"{'rel_rot_deg':>12}")
        for i, rot, tr, rel in rows:
            flag = ("  <-- bad transition"
                    if rel > max(3 * med_rel, 5.0) else "")
            print(f"{i:>5} {rot:>12.3f} {tr:>10.4f} {rel:>12.3f}{flag}")
        out[label] = {
            "rot_abs_deg": [round(r, 3) for _, r, _, _ in rows],
            "trans": [round(t, 4) for _, _, t, _ in rows],
            "rel_rot_deg": [round(r, 3) for _, _, _, r in rows],
            "worst_transition": int(max(rows[:-1], key=lambda r: r[3])[0]),
            "median_rel_rot_deg": round(med_rel, 3),
        }

    with open(os.path.join(work, f"{side}_postmortem.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nwrote {os.path.join(work, f'{side}_postmortem.json')}")


if __name__ == "__main__":
    main()
