"""Multi-host smoke entry: one DP train step under jax.distributed.

The reference is strictly single-GPU (SURVEY §2.3); our multi-host story
is that `parallel/dp.py`'s shard_map step is topology-agnostic — the mesh
just spans processes and the psums ride whatever link connects them. This
module is the executable proof: launched as N coordinated processes (CPU
backend, one virtual device each), it runs `dp_train_step_tiny` over the
global mesh and prints the loss, which `tests/test_multihost.py` asserts
equals the single-process value on an identical virtual mesh.

Usage (normally via the test):
    python -m fmov_pose_tpu.parallel.multihost_smoke \
        --coordinator localhost:PORT --num-processes 2 --process-id I
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    args = ap.parse_args()

    import jax

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id)

    import __graft_entry__ as ge

    n_devices = len(jax.devices())
    assert n_devices >= args.num_processes, (
        f"expected a global mesh, got {n_devices} devices")
    loss = ge.dp_train_step_tiny(n_devices)
    if jax.process_index() == 0:
        print(f"MULTIHOST_LOSS {loss:.10f} n_devices={n_devices}",
              flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
