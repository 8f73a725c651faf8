#!/usr/bin/env python
"""FMOV-TPU experiment CLI — drop-in for the reference entry point.

Mirrors `/root/reference/exp_runner.py:2027-2291`: same flags, same modes
(train with two-phase global reboot, validate_mesh, validate_poses,
interpolate_i_j, save_aligned_poses, ...), driving the TPU-native Runner.
"""

import argparse
import logging
import os
import traceback


def main():
    logging.basicConfig(
        level=logging.INFO,
        format="[%(filename)s:%(lineno)s - %(funcName)s] %(message)s")

    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str, default="./confs/base.conf")
    parser.add_argument("--mode", type=str, default="train")
    parser.add_argument("--mcube_threshold", type=float, default=0.0)
    parser.add_argument("--is_continue", default=False, action="store_true")
    parser.add_argument("--gpu", type=int, default=0)  # accepted, unused (TPU)
    parser.add_argument("--case", type=str, default="")
    parser.add_argument("--dataset", type=str, default="DTU")
    parser.add_argument("--start_at", type=int, default=-1)
    parser.add_argument("--start_img_idx", type=int, default=0)
    parser.add_argument("--ori_cam_path", type=str, default="None")
    parser.add_argument("--gradient_analysis", default=False,
                        action="store_true")
    parser.add_argument("--global_conf", type=str, default="None")
    parser.add_argument("--flow_interval", type=int, default=-1)
    parser.add_argument("--reset_rot_degree", type=int, default=-1)
    parser.add_argument("--image_interval", type=int, default=-1)
    parser.add_argument("--mesh_scale", type=float, default=1.0)
    parser.add_argument("--align_dir", type=str, default=None)
    # resolution of the end-of-train mesh (`exp_runner.py:2121-2123` uses a
    # fixed 512); overridable so CPU head-to-head runs stay tractable
    parser.add_argument("--final_mesh_resolution", type=int, default=512)
    # additive vs the reference CLI (which hard-seeds 2024 at import):
    # seed-variance studies (HEADTOHEAD.md) need distinct training seeds
    parser.add_argument("--seed", type=int, default=2024)
    args = parser.parse_args()

    from fmov_pose_tpu.train.runner import Runner

    def reboot_runner(case, new_exp_dir):
        return Runner(
            args.global_conf, mode="train", case=case, dataset=args.dataset,
            is_continue=os.path.exists(os.path.join(new_exp_dir, "checkpoints")),
            start_at=args.start_at, start_img_idx=args.start_img_idx,
            gradient_analysis=args.gradient_analysis, exp_dir=new_exp_dir,
            has_global_conf=os.path.exists(new_exp_dir), seed=args.seed)

    def global_mask_dir_for(case):
        if "ho3d" in args.global_conf:
            return f"./data/HO3Dv3/{case}/mask_obj"
        if "ml" in args.global_conf:
            return f"./data/ML/{case}/mask_obj"
        raise NotImplementedError(args.global_conf)

    runner = Runner(
        args.conf, args.mode, args.case, args.dataset, args.is_continue,
        args.start_at, args.start_img_idx, args.gradient_analysis,
        has_global_conf=args.global_conf != "None" or "GT.conf" in args.conf,
        flow_interval=args.flow_interval,
        reset_rot_degree=args.reset_rot_degree,
        image_interval=args.image_interval, seed=args.seed)

    if args.mode == "train":
        if args.global_conf != "None":
            case = runner.case.split("_")[0]
            gmask = global_mask_dir_for(case)
            original_exp_dir = runner.base_exp_dir
            conf_name = os.path.basename(args.global_conf).split(".")[0]
            new_exp_dir = os.path.join(original_exp_dir, conf_name)
            if not os.path.exists(new_exp_dir):
                try:
                    runner.train()
                except Exception as e:
                    with open(os.path.join(
                            original_exp_dir,
                            "error_during_progressive_learning.txt"), "w") as f:
                        f.write(f"Exception occurred: {e}\n")
                        f.write(traceback.format_exc())
                runner.save_aligned_poses(
                    save_dataset=True, normalize_trans=True,
                    tgt_dir=new_exp_dir, save_meta=False,
                    global_mask_dir=gmask)
            runner = reboot_runner(case, new_exp_dir)
            print("reboot the system for global training" + "-" * 40)
            runner.train()
            runner.validate_mesh(resolution=args.final_mesh_resolution,
                                 use_norml_color=True)
            runner.save_poses_simple()
        else:
            runner.train()
            runner.validate_mesh(resolution=args.final_mesh_resolution,
                                 use_norml_color=True)
    elif args.mode == "validate_mesh":
        if args.global_conf == "None":
            runner.validate_mesh(resolution=512, use_norml_color=True,
                                 mesh_scale=args.mesh_scale)
        else:
            case = runner.case.split("_")[0]
            conf_name = os.path.basename(args.global_conf).split(".")[0]
            runner = reboot_runner(
                case, os.path.join(runner.base_exp_dir, conf_name))
            runner.validate_mesh(resolution=256, use_norml_color=True,
                                 mesh_scale=args.mesh_scale)
    elif args.mode == "validate_poses":
        runner.validate_poses()
    elif args.mode.startswith("interpolate"):
        _, i0, i1 = args.mode.split("_")
        runner.interpolate_view(int(i0), int(i1))
    elif args.mode == "validate_all_images":
        runner.validate_all_images(resolution_level=4)
    elif args.mode == "save_poses":
        runner.save_poses()
    elif args.mode == "save_poses_simple":
        runner.save_poses_simple(align_dir=args.align_dir)
    elif args.mode == "save_aligned_poses":
        runner.save_aligned_poses()
    elif args.mode == "render_poses":
        if args.global_conf != "None":
            case = runner.case.split("_")[0]
            conf_name = os.path.basename(args.global_conf).split(".")[0]
            runner = reboot_runner(
                case, os.path.join(runner.base_exp_dir, conf_name))
        runner.render_poses()
    elif args.mode == "pure_render_poses":
        runner.render_poses(wo_normal=True)
    elif args.mode == "save_alignment_materials":
        runner.save_alignment_materials(align_dir=args.align_dir)
    elif args.mode == "validate_textured_mesh":
        from fmov_pose_tpu.pipeline.textured import textured_mesh
        mesh_path = runner.validate_mesh(resolution=64)
        textured_mesh(mesh_path, runner)
    elif args.mode == "generate_textured_mesh":
        from fmov_pose_tpu.pipeline.textured import textured_mesh
        case = runner.case.split("_")[0]
        conf_name = os.path.basename(args.global_conf).split(".")[0]
        runner = reboot_runner(
            case, os.path.join(runner.base_exp_dir, conf_name))
        mesh_path = runner.validate_mesh(resolution=64)
        textured_mesh(mesh_path, runner)
    else:
        raise NotImplementedError(args.mode)


if __name__ == "__main__":
    main()
