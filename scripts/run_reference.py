#!/usr/bin/env python
"""Run the UNMODIFIED PyTorch reference (/root/reference) on CPU.

VERDICT r2 Missing #1: the "CD/ATE within 2% of the reference" target was
never measured against a *trained* reference model.  This driver makes
the reference trainable on this box (torch CPU, no CUDA; several of its
deps are not installed and may not be pip-installed):

  1. prepends scripts/ref_shims (pyhocon/trimesh/mcubes/plyfile/open3d/
     plotly/dash/xatlas shims backed by fmov-tpu first-party code) and
     /root/reference to sys.path,
  2. monkeypatches torch so every CUDA request degrades to CPU
     (`torch.device("cuda")` -> cpu, `.cuda()` -> identity,
     `set_default_tensor_type("torch.cuda.FloatTensor")` -> float cpu,
     `torch.cuda.set_device` -> no-op),
  3. replicates the reference's `__main__` two-phase train block
     (`exp_runner.py:2027-2133`) verbatim, except the *post-training*
     evaluation resolution is configurable (512^3 SDF queries on one CPU
     core would take hours and add nothing to the comparison).

Must be run from a workdir holding ./data/HO3Dv3/... and ./confs/
(see scripts/headtohead.py which builds it):

    python /root/repo/scripts/run_reference.py \
        --conf ./confs/ho3d_virtual.conf --case SYN_ori \
        --global_conf ./confs/ho3d_global_womask.conf \
        --final_mesh_resolution 128
"""

import argparse
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts", "ref_shims"))
sys.path.insert(1, "/root/reference")
if REPO not in sys.path:
    sys.path.append(REPO)


def patch_torch_cpu():
    """Degrade every CUDA request to CPU without touching torch.device
    itself (replacing the type breaks `str | torch.device` annotations
    and isinstance checks inside torch)."""
    import torch

    def _map(a):
        if isinstance(a, str) and "cuda" in a:
            return "cpu"
        if isinstance(a, torch.device) and a.type == "cuda":
            return torch.device("cpu")
        return a

    def _wrap_to(orig):
        def to(self, *args, **kwargs):
            args = tuple(_map(a) for a in args)
            if "device" in kwargs:
                kwargs["device"] = _map(kwargs["device"])
            return orig(self, *args, **kwargs)
        return to

    torch.Tensor.to = _wrap_to(torch.Tensor.to)
    torch.nn.Module.to = _wrap_to(torch.nn.Module.to)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    for name in ("set_device", "manual_seed", "manual_seed_all",
                 "empty_cache", "synchronize"):
        setattr(torch.cuda, name, lambda *a, **k: None)

    # the reference restores with torch.load(..., map_location=self.device)
    # (`exp_runner.py:1110`) where self.device is a CUDA device object —
    # map it to CPU like every other device request
    _orig_tload = torch.load

    def tload(*args, **kwargs):
        if "map_location" in kwargs:
            kwargs["map_location"] = _map(kwargs["map_location"])
        elif len(args) >= 2:
            args = (args[0], _map(args[1])) + tuple(args[2:])
        else:
            kwargs["map_location"] = "cpu"
        # torch>=2.6 defaults weights_only=True, which rejects the
        # reference's own checkpoints (they pickle numpy scalars); these
        # are locally-produced files from the h2h run itself
        kwargs.setdefault("weights_only", False)
        return _orig_tload(*args, **kwargs)

    torch.load = tload

    _orig_sdtt = torch.set_default_tensor_type

    def set_default_tensor_type(t):
        if isinstance(t, str) and "cuda" in t:
            t = t.replace("cuda.", "")
        _orig_sdtt(t)

    torch.set_default_tensor_type = set_default_tensor_type


def _repair_nan_scale_mats(tgt_dir):
    """get_normalization returns NaN scale mats (no exception) when zero
    epipolar-consistent points survive (`get_norm_matrix.py:246`: mean of
    an empty array).  The reference's own failure path
    (`align_poses.py:155-161`) falls back to identity scale mats when
    get_normalization *raises*; apply the same fallback for the silent
    NaN case so phase 2 can start instead of crashing in
    cv.decomposeProjectionMatrix."""
    import numpy as np
    for name in ("noise_cameras_sphere.npz", "cameras_sphere.npz"):
        path = os.path.join(tgt_dir, name)
        if not os.path.exists(path):
            continue
        d = dict(np.load(path))
        bad = [k for k in d if not np.isfinite(d[k]).all()]
        if not bad:
            continue
        print(f"WARNING: repairing NaN mats in {name}: {sorted(bad)}",
              flush=True)
        for k in bad:
            d[k] = np.eye(4)
        np.savez(path, **d)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str, required=True)
    parser.add_argument("--mode", type=str, default="train")
    parser.add_argument("--case", type=str, default="")
    parser.add_argument("--dataset", type=str, default="DTU")
    parser.add_argument("--global_conf", type=str, default="None")
    parser.add_argument("--is_continue", default=False, action="store_true")
    parser.add_argument("--start_at", type=int, default=-1)
    parser.add_argument("--start_img_idx", type=int, default=0)
    parser.add_argument("--exp_dir", type=str, default=None,
                        help="override base_exp_dir (phase-2 subdir evals)")
    parser.add_argument("--resolution_level", type=int, default=2)
    parser.add_argument("--final_mesh_resolution", type=int, default=128,
                        help="resolution for the post-training mesh "
                             "(reference main uses 512; hours on 1 CPU core)")
    parser.add_argument("--skip_render_poses", default=True,
                        action="store_true",
                        help="skip the novel-view mp4 (eval-only artifact)")
    parser.add_argument("--gradient_analysis", default=False,
                        action="store_true",
                        help="pass gradient_analysis=True to the reference "
                             "Runner(s) (per-loss gradient stats, printed "
                             "every iter — slow; use with a short end_iter)")
    parser.add_argument("--seed", type=int, default=2024,
                        help="re-seed AFTER the reference's import-time "
                             "seeding (exp_runner.py:29-30 hard-seeds 2024)"
                             " — used for h2h seed-variance runs")
    args = parser.parse_args()

    patch_torch_cpu()
    import torch  # noqa: E402
    torch.set_num_threads(max(os.cpu_count() or 1, 1))

    import exp_runner as ref  # the reference module, via /root/reference

    if args.seed != 2024:
        import random
        import numpy as np
        torch.manual_seed(args.seed)
        np.random.seed(args.seed)
        random.seed(args.seed)

    # latent reference bug: exp_runner.py:57 uses `csv` without importing
    # it (extract_camera_poses, reached at train end via :980); inject it
    # rather than letting the run die after hours of training.
    import csv
    if not hasattr(ref, "csv"):
        ref.csv = csv

    # ---- faithful replica of exp_runner.py:2041-2133 (train mode) ----
    runner = ref.Runner(
        args.conf, args.mode, args.case, args.dataset, args.is_continue,
        args.start_at, args.start_img_idx, args.gradient_analysis,
        exp_dir=args.exp_dir,
        has_global_conf=(args.global_conf != "None" or "GT.conf" in args.conf
                         or args.exp_dir is not None),
        flow_interval=-1, reset_rot_degree=-1, image_interval=-1,
    )
    print("mode: ", args.mode, flush=True)
    if args.mode == "train":
        if args.global_conf != "None":
            case = runner.case.split("_")[0]
            if "ho3d" in args.global_conf:
                global_mask_dir = f"./data/HO3Dv3/{case}/mask_obj"
            elif "ml" in args.global_conf:
                global_mask_dir = f"./data/ML/{case}/mask_obj"
            else:
                raise NotImplementedError
            original_exp_dir = runner.base_exp_dir
            conf_name = args.global_conf.split("/")[-1].split(".")[0]
            new_exp_dir = os.path.join(original_exp_dir, conf_name)
            if not os.path.exists(new_exp_dir):
                try:
                    runner.train()
                except Exception as e:
                    with open(os.path.join(
                            original_exp_dir,
                            "error_during_progressive_learning.txt"),
                            "w") as f:
                        f.write("Exception occurred: " + str(e) + "\n")
                        f.write(traceback.format_exc())
                runner.save_aligned_poses(
                    save_dataset=True, normalize_trans=True,
                    tgt_dir=os.path.join(original_exp_dir, conf_name),
                    save_meta=False, global_mask_dir=global_mask_dir)
                _repair_nan_scale_mats(
                    os.path.join(original_exp_dir, conf_name))
            runner = ref.Runner(
                args.global_conf, mode="train", case=case,
                dataset=args.dataset,
                is_continue=os.path.exists(
                    os.path.join(new_exp_dir, "checkpoints")),
                start_at=args.start_at, start_img_idx=args.start_img_idx,
                gradient_analysis=args.gradient_analysis,
                exp_dir=os.path.join(original_exp_dir, conf_name),
                has_global_conf=os.path.exists(new_exp_dir))
            print("reboot the system for global training"
                  + "-" * 40, flush=True)
            runner.train()
            # reduced schedules end before the reference's first save_freq
            # checkpoint; save one now so psnr_eval can restore the trained
            # radiance field post-hoc (ref save_checkpoint: exp_runner.py:1414)
            runner.save_checkpoint()
            if not args.skip_render_poses:
                runner.render_poses()
            runner.validate_mesh(resolution=args.final_mesh_resolution,
                                 use_norml_color=True)
            runner.save_poses_simple()
        else:
            runner.train()
            runner.save_checkpoint()
            if not args.skip_render_poses:
                runner.render_poses()
            runner.validate_mesh(resolution=args.final_mesh_resolution,
                                 use_norml_color=True)
    elif args.mode == "psnr_eval":
        # render every frame at the learned pose vs GT image; the stacked
        # return of validate_image (`exp_runner.py:1511-1518`) is
        # [render; gt] vertically
        import numpy as np
        import torch
        vals = []
        with torch.no_grad():
            for idx in range(runner.dataset.n_images):
                stacked = runner.validate_image(
                    idx, resolution_level=args.resolution_level,
                    return_img=True)
                h = stacked.shape[0] // 2
                render, gt = stacked[:h].astype(np.float64), \
                    stacked[h:].astype(np.float64)
                mse = max(((render - gt) ** 2).mean(), 1e-9)
                psnr = 10 * np.log10(255.0 ** 2 / mse)
                vals.append(psnr)
                print(f"H2H_PSNR {idx} {psnr:.4f}", flush=True)
        print(f"H2H_PSNR_MEAN {np.mean(vals):.4f}", flush=True)
    elif args.mode == "validate_poses":
        runner.validate_poses()
    elif args.mode == "validate_mesh":
        runner.validate_mesh(resolution=args.final_mesh_resolution,
                             use_norml_color=True)
    else:
        raise NotImplementedError(args.mode)
    print("REFERENCE_RUN_DONE", flush=True)


if __name__ == "__main__":
    main()
