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


def _parse_loss(stdout):
    m = re.search(r"MULTIHOST_LOSS (\S+)", stdout)
    assert m, f"no MULTIHOST_LOSS line in output:\n{stdout}"
    return float(m.group(1))


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
