"""Multi-host smoke test: a real 2-process jax.distributed CPU run drives
the data-parallel training step across a 2-device global mesh and must
produce the same loss as the single-process 2-device run.

This exercises the multi-host path the reference has no counterpart for
(SURVEY §2.3: the distributed backend is a new-design work item):
jax.distributed.initialize over a local coordinator, a Mesh spanning both
processes' devices, shard_map + psum losses, replicated Adam update.
"""

import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _env(extra_xla=""):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize pre-imports jax and pins the tunneled TPU;
    # strip it so JAX_PLATFORMS takes effect in the children
    paths = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon_site" not in p]
    if REPO not in paths:
        paths.insert(0, REPO)
    env["PYTHONPATH"] = os.pathsep.join(paths)
    env["XLA_FLAGS"] = extra_xla
    env.pop("JAX_PLATFORM_NAME", None)
    return env


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _loss(out):
    m = re.search(r"MULTIHOST_LOSS ([-+\d.eE]+)", out)
    assert m, f"worker produced no loss:\n{out}"
    return float(m.group(1))


def test_two_process_distributed_matches_single_process():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "2", str(i), str(port)],
            env=_env(), cwd=REPO, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker rc={p.returncode}:\n{out}"
    losses = [_loss(out) for out in outs]

    single = subprocess.run(
        [sys.executable, WORKER, "1", "0", "0"],
        env=_env("--xla_force_host_platform_device_count=2"),
        cwd=REPO, text=True, capture_output=True, timeout=600)
    assert single.returncode == 0, single.stdout + single.stderr
    ref = _loss(single.stdout)

    assert abs(losses[0] - losses[1]) < 1e-6 * max(1.0, abs(ref))
    for loss in losses:
        assert abs(loss - ref) < 1e-5 * max(1.0, abs(ref)), (losses, ref)
