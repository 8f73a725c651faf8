"""Whole-upsample-loop kernel (ops/fused_sdf.py upsample_fused_rays) vs
the XLA per-round loop, in pallas interpret mode on CPU.

The kernel must reproduce the reference loop (`renderer.py:423-446`
semantics: up_sample -> sample_pdf -> cat_z_vals x steps) through ALL
rounds: same section alphas, same det-mode inverse-CDF draws, same
stable merge order.  Both sides run with f32 in-kernel dots here (the
structure check — production bf16 accuracy is chip-validated by
scripts/validate_upsample_tpu.py), so the only expected deltas are
cumsum/cumprod association order — z positions are continuous in the
cdf, giving a tight tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from fmov_pose_tpu.fields import nets
from fmov_pose_tpu.ops import fused_sdf
from fmov_pose_tpu.render import neus


@pytest.fixture()
def fs(monkeypatch):
    monkeypatch.setenv("FMOV_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("FMOV_FUSED_UPSAMPLE", "1")
    # lift the size gate so the XLA side's per-round evals also run the
    # rays kernel, and use f32 dots on both sides
    monkeypatch.setattr(fused_sdf, "MIN_SAMPLES_RAYS", 0)
    monkeypatch.setattr(fused_sdf, "UPSAMPLE_TILE_RAYS", 4)
    hp = jax.lax.Precision.HIGHEST
    monkeypatch.setattr(fused_sdf, "_dot",
                        lambda a, b: jnp.dot(a, b, precision=hp))
    return fused_sdf


def _rays(b, key=0):
    rng = np.random.default_rng(key)
    o = rng.normal(size=(b, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o + rng.normal(size=(b, 3)) * 0.05
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = 1.0 + rng.random((b, 1)) * 0.2
    far = near + 2.0
    return (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
            jnp.asarray(near, jnp.float32), jnp.asarray(far, jnp.float32))


def _xla_loop(params, model_cfg, o, d, z_vals, n_importance, steps):
    sdf = neus._sdf_bn(params, model_cfg, o, d, z_vals)
    for i in range(steps):
        new_z = neus.up_sample(params, model_cfg, o, d, z_vals, sdf,
                               n_importance // steps, 64.0 * 2 ** i)
        z_vals, sdf = neus.cat_z_vals(params, model_cfg, o, d, z_vals,
                                      new_z, sdf, last=(i + 1 == steps))
    return z_vals


@pytest.mark.parametrize("B,n0,imp,steps", [(6, 64, 64, 4), (5, 32, 32, 2)])
def test_upsample_kernel_matches_xla_loop(fs, B, n0, imp, steps):
    sdf_cfg = dict(ge.SDF_CFG, use_fused_train=True)
    params = {"sdf": nets.init_sdf(jax.random.key(0), sdf_cfg)}
    model_cfg = {"sdf": sdf_cfg}
    o, d, near, far = _rays(B)
    z_lin = jnp.linspace(0.0, 1.0, n0)
    z0 = near + (far - near) * z_lin[None, :]

    z_ref = _xla_loop(params, model_cfg, o, d, z0, imp, steps)
    z_ker = fs.upsample_fused_rays(
        params["sdf"], sdf_cfg, o, d, z0, imp, steps)

    assert z_ker.shape == (B, n0 + imp)
    assert bool(jnp.all(z_ker[:, 1:] >= z_ker[:, :-1]))   # sorted per ray
    assert bool(jnp.all(z_ker >= near - 1e-5))
    assert bool(jnp.all(z_ker <= far + 1e-5))
    np.testing.assert_allclose(np.asarray(z_ker), np.asarray(z_ref),
                               atol=1e-3, rtol=0)


def test_upsample_kernel_degenerate_weights(fs):
    """All-outside rays (zero in-sphere weight): the pdf falls back to
    the 1e-5 floor and draws must still be finite, sorted, in-range."""
    sdf_cfg = dict(ge.SDF_CFG, use_fused_train=True)
    params = {"sdf": nets.init_sdf(jax.random.key(1), sdf_cfg)}
    B = 4
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.normal(size=(B, 3)) + 10.0, jnp.float32)  # far away
    d = rng.normal(size=(B, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    z0 = jnp.broadcast_to(jnp.linspace(1.0, 3.0, 32)[None, :], (B, 32))
    z = fs.upsample_fused_rays(params["sdf"], sdf_cfg, o, d,
                               jnp.asarray(z0), 32, 4)
    assert bool(jnp.all(jnp.isfinite(z)))
    assert bool(jnp.all(z[:, 1:] >= z[:, :-1]))
    assert z.shape == (B, 64)


def test_supported_upsample_gates(monkeypatch):
    monkeypatch.setenv("FMOV_PALLAS_INTERPRET", "1")  # supported() on CPU
    cfg = dict(ge.SDF_CFG)
    assert fused_sdf.supported_upsample(cfg, 64, 64, 4, 65536)
    assert not fused_sdf.supported_upsample(cfg, 64, 64, 4, 1024)
    assert not fused_sdf.supported_upsample(cfg, 64, 65, 4, 65536)
    assert not fused_sdf.supported_upsample(cfg, 96, 64, 4, 65536)
    assert not fused_sdf.supported_upsample(cfg, 64, 64, 0, 65536)
