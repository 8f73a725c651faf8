"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``--xla_force_host_platform_device_count`` (the driver separately
dry-run-compiles the multichip path through __graft_entry__.py).

NOTE: this environment pre-imports jax through a sitecustomize that
registers the TPU backend, so setting JAX_PLATFORMS in os.environ is too
late — we must force the platform through jax.config (backends
initialize lazily, so this still wins as long as no array op ran).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# persistent compilation cache: repeated pytest runs skip recompiles
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; got " + jax.default_backend())
assert jax.device_count() >= 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)
