"""Time the REAL phase-2 Runner loop (VERDICT r4 Weak #1 follow-up).

bench.py's phase2_shipped_gfscan row times the pure scanned step;
ENDURANCE.md's sustained number (19.7k rays/s at batch 512) came through
the full Runner (restore, report cadence, chunk dispatch, validation).
This probe attributes the difference: it clones a completed
pipeline_quality workdir (which holds a trained phase-2 checkpoint +
aligned dataset at the conf-shipped batch 512), extends end_iter, and
times the Runner's steady-state phase-2 training window in-process.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/p2_loop_probe.py \
      <pipeq_workdir> [steady_iters=1000]
"""
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    src = sys.argv[1]
    steady = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    work = tempfile.mkdtemp(prefix="fmov_p2loop_")
    os.symlink(os.path.join(src, "data"), os.path.join(work, "data"))
    shutil.copytree(os.path.join(src, "exp"), os.path.join(work, "exp"))
    os.makedirs(os.path.join(work, "confs"))
    conf_src = os.path.join(src, "confs", "ho3d_global.conf")
    text = open(conf_src).read()
    m = re.search(r"(?m)^\s*end_iter\s*=\s*(\d+)", text)
    end0 = int(m.group(1))
    warm_end = end0 + 200          # warm window: compiles + restore costs
    conf = os.path.join(work, "confs", "ho3d_global.conf")
    with open(conf, "w") as f:
        f.write(re.sub(r"(?m)^(\s*end_iter\s*=\s*)\d+",
                       rf"\g<1>{warm_end}", text))

    os.chdir(work)
    from fmov_pose_tpu.train.runner import Runner
    # mirror exp_runner.py's reboot_runner construction (exp_dir = the
    # phase-1 run's global subdir, which holds the aligned dataset)
    new_exp_dir = os.path.join(work, "exp", "SYN_ori", "ours", "ho3d_global")
    r = Runner(conf, mode="train", case="SYN_ori", is_continue=True,
               exp_dir=new_exp_dir, has_global_conf=True)
    batch = r.batch_size
    r.train()                      # restore + compile + 200 warm iters

    r.end_iter = warm_end + steady
    t0 = time.time()
    r.train()
    dt = time.time() - t0
    ms = dt / steady * 1e3
    print(f"RESULT p2_runner_loop batch={batch} {steady} steady iters "
          f"in {dt:.1f}s = {steady / dt:.1f} it/s, {ms:.2f} ms/step, "
          f"{batch * steady / dt:.0f} rays/s")


if __name__ == "__main__":
    main()
