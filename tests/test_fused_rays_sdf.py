"""Plane-layout contract of the rays-variant fused SDF kernel.

ADVICE r3 (medium): `sdf_apply_grad_fused_rays` — the [3, M] channel-plane
I/O variant with in-kernel PE — had no direct unit test pinning its
contract against the nets oracle (it was only exercised end-to-end through
render in tests/test_fused_ray.py).  This test runs the kernel in
interpret mode with a small tile (padding paths exercised) and checks:

* primal triple (out [M, d_out], sdf_bn [B, n_samples], grad [3, M])
  against `nets.sdf_apply` / `nets.sdf_gradient` on the transposed input;
* every cotangent (params incl. weight-norm v/g, and the x channel-plane
  input) of a loss touching all three outputs, against the same oracle —
  i.e. the fused second-order backward (`_sdf_bwd_rays_impl`).

Structure-exact check: f32 in-kernel dots via the patched `_dot` (at toy
widths bf16 relative error is large and uninformative), which makes the
primal and the x-plane cotangent tight (<=1e-4 / 1e-5).  The param
cotangents keep a bf16 envelope: the backward kernel accumulates dws
through hard-coded bf16 dot_generals by design (fused_sdf.py
`_make_bwd_rays_kernel`, dws += lines) — those are structure-checked at
1% here and accuracy-gated on chip by scripts/validate_rays_tpu.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def fs(monkeypatch):
    # module-level jitted wrappers capture _dot at trace time; drop traces
    # made by other test modules before patching precision
    jax.clear_caches()
    monkeypatch.setenv("FMOV_PALLAS_INTERPRET", "1")
    from fmov_pose_tpu.ops import fused_sdf
    monkeypatch.setattr(fused_sdf, "TILE", 16)
    monkeypatch.setattr(fused_sdf, "MIN_SAMPLES_RAYS", 0)
    hp = jax.lax.Precision.HIGHEST
    monkeypatch.setattr(
        fused_sdf, "_dot",
        lambda a, b: jnp.dot(a, b, precision=hp,
                             preferred_element_type=jnp.float32))
    return fused_sdf


SDF_CFG = {"d_out": 17, "d_in": 3, "d_hidden": 32, "n_layers": 4,
           "skip_in": (2,), "multires": 3, "bias": 0.5, "scale": 1.0,
           "geometric_init": True, "weight_norm": True}


def _oracle(params, cfg, x_pl, n_samples):
    """The reference contract (fused_sdf._sdf_rays_bwd's FMOV_FUSED_BWD=0
    oracle): nets on [M, 3] rows, outputs re-laid to the kernel's shapes."""
    from fmov_pose_tpu.fields import nets
    pts = x_pl.T
    out = nets.sdf_apply(params, cfg, pts)
    grad = nets.sdf_gradient(params, cfg, pts)
    return out, out[:, 0].reshape(-1, n_samples), grad.T


@pytest.mark.parametrize("weight_norm", [True, False])
def test_rays_sdf_matches_oracle(fs, weight_norm):
    from fmov_pose_tpu.fields import nets
    cfg = dict(SDF_CFG, weight_norm=weight_norm)
    params = nets.init_sdf(jax.random.key(0), cfg)
    B, n_samples = 5, 8            # M=40 -> 3 tiles of 16, 8 rows padding
    M = B * n_samples
    rng = np.random.default_rng(0)
    x_pl = jnp.asarray(rng.normal(size=(3, M)) * 0.5, jnp.float32)

    assert fs.supported_rays(cfg, n_samples, M)
    got = fs.sdf_apply_grad_fused_rays(params, cfg, x_pl, n_samples)
    want = _oracle(params, cfg, x_pl, n_samples)
    assert got[0].shape == (M, cfg["d_out"])
    assert got[1].shape == (B, n_samples)
    assert got[2].shape == (3, M)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-4, rtol=1e-4)

    # second-order backward: loss touches out, sdf_bn AND the gradient
    # planes (the eikonal path), cotangents flow to params and x planes
    def loss(fn):
        def f(p, x):
            out, sdf_bn, grad_pl = fn(p, cfg, x, n_samples)
            return (out.sum() + (sdf_bn * jnp.arange(n_samples)).sum()
                    + ((grad_pl * grad_pl).sum(0) - 1.0).sum()
                    + (grad_pl * x).sum())
        return f

    gk = jax.grad(loss(fs.sdf_apply_grad_fused_rays), argnums=(0, 1))(
        params, x_pl)
    gr = jax.grad(loss(_oracle), argnums=(0, 1))(params, x_pl)
    flat_k, _ = jax.tree_util.tree_flatten(gk[0])
    flat_r, _ = jax.tree_util.tree_flatten(gr[0])
    for a, b in zip(flat_k, flat_r):
        # bf16 dws accumulation envelope (see module docstring)
        an, bn = np.linalg.norm(a), np.linalg.norm(b)
        assert np.linalg.norm(a - b) <= 1e-2 * max(bn, 1e-3), (a.shape, an, bn)
    # the x-plane cotangent is hp end-to-end -> tight
    np.testing.assert_allclose(gk[1], gr[1], atol=1e-4, rtol=1e-4)


def test_rays_sdf_single_tile_unpadded(fs):
    from fmov_pose_tpu.fields import nets
    params = nets.init_sdf(jax.random.key(1), SDF_CFG)
    B, n_samples = 1, 16           # M=16 == TILE exactly
    rng = np.random.default_rng(1)
    x_pl = jnp.asarray(rng.normal(size=(3, B * n_samples)) * 0.5, jnp.float32)
    got = fs.sdf_apply_grad_fused_rays(params, SDF_CFG, x_pl, n_samples)
    want = _oracle(params, SDF_CFG, x_pl, n_samples)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-4, rtol=1e-4)
