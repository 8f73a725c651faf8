"""Worker process for the multi-host (multi-process jax.distributed) smoke
test — see tests/test_multihost.py.

argv: n_processes process_id coordinator_port
With n_processes == 1 it runs the same 2-device DP step on a virtual
2-device CPU mesh (XLA_FLAGS set by the caller) for the reference value.
"""

import sys


def main():
    n_proc = int(sys.argv[1])
    pid = int(sys.argv[2])
    port = sys.argv[3]

    import jax
    jax.config.update("jax_platforms", "cpu")
    if n_proc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=n_proc, process_id=pid)
        assert jax.process_count() == n_proc
    assert jax.device_count() == 2, jax.devices()

    import __graft_entry__ as ge
    loss = ge.dp_train_step_tiny(2)
    print(f"MULTIHOST_LOSS {loss:.8f}")


if __name__ == "__main__":
    main()
