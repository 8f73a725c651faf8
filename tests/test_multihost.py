"""Multi-host (2-process) DP smoke test on the CPU backend.

Launches two coordinated `jax.distributed` processes (one virtual CPU
device each) running `multihost_smoke` — a full dp_train_step_tiny over
the 2-device global mesh — and asserts the loss equals a single-process
run on an identical 2-device virtual mesh. Identical seeds + psum'd
ratio-of-sums losses make the two bitwise-comparable up to collective
reduction order (SURVEY §2.3 multi-host plan; the torch reference has no
distributed path at all, exp_runner.py is single-GPU).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _cpu_env(n_local_devices):
    """Env for a fresh CPU-backend interpreter (axon sitecustomize
    stripped so JAX_PLATFORMS is honored — see CLAUDE.md)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}")
    paths = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon_site" not in p]
    if REPO not in paths:
        paths.insert(0, REPO)
    env["PYTHONPATH"] = os.pathsep.join(paths)
    env.pop("_FMOV_DRYRUN_CHILD", None)
    return env


def _parse_loss(stdout, marker="MULTIHOST_LOSS"):
    m = re.search(rf"{marker} (\S+)", stdout)
    assert m, f"no {marker} line in output:\n{stdout}"
    return float(m.group(1))


def test_runner_train_two_process(tmp_path):
    """VERDICT r2 #7: drive the FULL Runner.train (dataset load, DP photo
    steps, checkpoint) under 2-process jax.distributed and assert (a) the
    loss matches a single-process 2-device control run, (b) checkpoints/
    logs/recording are written by rank 0 only."""
    port = _free_port()
    cmd = [sys.executable, "-m",
           "fmov_pose_tpu.parallel.multihost_runner_smoke"]
    procs, outs = [], []
    for i in range(2):
        env = _cpu_env(1)
        env.update(FMOV_DISTRIBUTED="1",
                   FMOV_COORDINATOR=f"localhost:{port}",
                   FMOV_NUM_PROCESSES="2", FMOV_PROCESS_ID=str(i))
        procs.append(subprocess.Popen(
            cmd + ["--workdir", str(tmp_path / f"rank{i}")], env=env,
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed (rc={p.returncode}):\n{out}"
    multi_loss = _parse_loss(outs[0], "MULTIHOST_RUNNER_LOSS")

    # rank 0 owns every host-side artifact; rank 1 writes nothing
    r0, r1 = tmp_path / "rank0" / "exp", tmp_path / "rank1" / "exp"
    assert list((r0 / "checkpoints").glob("*.ckpt")), "rank0 wrote no ckpt"
    assert (r0 / "logs").is_dir(), "rank0 wrote no tensorboard logs"
    assert (r0 / "recording").is_dir(), "rank0 wrote no recording"
    for sub in ("checkpoints", "logs", "recording"):
        assert not (r1 / sub).exists(), f"rank1 wrote {sub} (should be " \
            "rank-0 only)"

    # control: same run, one process, 2 virtual devices
    single = subprocess.run(
        cmd + ["--workdir", str(tmp_path / "single")], env=_cpu_env(2),
        cwd=REPO, capture_output=True, text=True, timeout=600)
    assert single.returncode == 0, single.stdout + single.stderr
    single_loss = _parse_loss(single.stdout, "MULTIHOST_RUNNER_LOSS")

    np.testing.assert_allclose(multi_loss, single_loss, rtol=1e-3)
    assert np.isfinite(multi_loss)


def test_two_process_loss_matches_single_process():
    port = _free_port()
    coord = f"localhost:{port}"
    cmd = [sys.executable, "-m", "fmov_pose_tpu.parallel.multihost_smoke",
           "--coordinator", coord, "--num-processes", "2"]
    procs = [subprocess.Popen(cmd + ["--process-id", str(i)],
                              env=_cpu_env(1), cwd=REPO,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed (rc={p.returncode}):\n{out}"
    multi_loss = _parse_loss(outs[0])

    # same 2-device mesh, one process
    single = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; import jax; "
         "print(f'MULTIHOST_LOSS {g.dp_train_step_tiny(2):.10f}')"],
        env=_cpu_env(2), cwd=REPO, capture_output=True, text=True,
        timeout=600)
    assert single.returncode == 0, single.stdout + single.stderr
    single_loss = _parse_loss(single.stdout)

    np.testing.assert_allclose(multi_loss, single_loss, rtol=1e-5)
    assert np.isfinite(multi_loss)
