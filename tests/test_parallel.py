"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    color = np.asarray(out[0])
    assert color.shape == (256, 3)
    assert np.isfinite(color).all()
