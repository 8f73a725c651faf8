"""Ray-level composited color kernel vs its pure-JAX oracle.

Runs the Pallas kernels in interpret mode on the CPU test mesh
(FMOV_PALLAS_INTERPRET), with a small tile so padding paths are
exercised.  Checks primal and every cotangent (params incl. weight-norm,
sdf_out/feature, u, weights) against `ray_reference`, which is itself
the already-tested featfirst composition (tests/test_fused_color_layout).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def fc(monkeypatch):
    # the fused ops are module-level @jax.jit functions that capture _dot
    # at trace time: traces created by earlier test modules (default bf16
    # dots) must not be reused after the HIGHEST-precision patches below
    jax.clear_caches()
    monkeypatch.setenv("FMOV_PALLAS_INTERPRET", "1")
    from fmov_pose_tpu.ops import fused_color
    monkeypatch.setattr(fused_color, "TILE", 16)
    # f32 in-kernel dots: this test checks the kernel STRUCTURE exactly
    # (at toy widths bf16 relative error is large and uninformative);
    # production-width bf16 accuracy is validated on chip by
    # scripts/validate_kernels_tpu.py (<1% grad-error gate).
    hp = jax.lax.Precision.HIGHEST
    monkeypatch.setattr(fused_color, "_dot",
                        lambda a, b: jnp.dot(a, b, precision=hp))
    monkeypatch.setattr(
        fused_color, "_dot_acc",
        lambda a, b: jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), precision=hp))
    return fused_color


def _params(rng, d_in, d_hidden, n_lin, weight_norm=True):
    layers = {}
    dims = [d_in] + [d_hidden] * (n_lin - 1) + [3]
    for l in range(n_lin):
        w = rng.normal(size=(dims[l + 1], dims[l])).astype(np.float32) * 0.3
        b = rng.normal(size=(dims[l + 1],)).astype(np.float32) * 0.05
        if weight_norm:
            g = np.linalg.norm(w, axis=1).astype(np.float32)
            layers[f"lin{l}"] = {"v": jnp.asarray(w), "g": jnp.asarray(g),
                                 "b": jnp.asarray(b)}
        else:
            layers[f"lin{l}"] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    return {"layers": layers}


@pytest.mark.parametrize("weight_norm", [True, False])
def test_ray_op_matches_oracle(fc, weight_norm):
    rng = np.random.default_rng(0)
    d_feat, L, n_layers = 16, 2, 2
    d_small = 9 + 6 * L
    cfg = {"n_layers": n_layers, "multires_view": L,
           "mode": "idr", "squeeze_out": True}
    B, N = 6, 8           # M=48 -> pads to 3 tiles of 16 + row padding
    M = B * N
    params = _params(rng, d_feat + d_small, 24, n_layers + 1, weight_norm)
    sdf_out = jnp.asarray(rng.normal(size=(M, 1 + d_feat)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(9, M)), jnp.float32)  # channel planes
    weights = jnp.asarray(rng.random((B, N)), jnp.float32)

    assert fc.supported_ray(cfg, N)
    got = fc.color_fused_ray(params, cfg, sdf_out, u, weights)
    want = fc.ray_reference(params, cfg, sdf_out, u, weights)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def loss_k(p, s, uu, w):
        out = fc.color_fused_ray(p, cfg, s, uu, w)
        return (out * jnp.arange(out.size).reshape(out.shape)).sum()

    def loss_r(p, s, uu, w):
        out = fc.ray_reference(p, cfg, s, uu, w)
        return (out * jnp.arange(out.size).reshape(out.shape)).sum()

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(params, sdf_out, u, weights)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(params, sdf_out, u, weights)

    # params (incl. weight-norm v/g), feature, u, weights cotangents
    flat_k, _ = jax.tree_util.tree_flatten(gk[0])
    flat_r, _ = jax.tree_util.tree_flatten(gr[0])
    for a, b in zip(flat_k, flat_r):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
    # sdf_out col 0 gets no cotangent from the color op
    np.testing.assert_allclose(gk[1][:, 0], 0.0, atol=0)
    np.testing.assert_allclose(gk[1], gr[1], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gk[2], gr[2], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gk[3], gr[3], atol=1e-4, rtol=1e-4)


def test_render_core_ray_path_matches_xla(fc, monkeypatch):
    """Full render(): fused-ray (interpret) vs plain XLA path, value and
    param-gradients, at the production net widths on a tiny ray batch."""
    import __graft_entry__ as ge
    from fmov_pose_tpu.ops import fused_sdf
    from fmov_pose_tpu.render import neus

    monkeypatch.setattr(fc, "TILE", 32)
    monkeypatch.setattr(fc, "MIN_SAMPLES", 0)
    monkeypatch.setattr(fused_sdf, "TILE", 32)
    monkeypatch.setattr(fused_sdf, "MIN_SAMPLES_RAYS", 0)
    hp = jax.lax.Precision.HIGHEST
    monkeypatch.setattr(fused_sdf, "_dot",
                        lambda a, b: jnp.dot(a, b, precision=hp))

    params = ge._field_params(jax.random.key(0))
    base_cfg = ge._model_cfg(n_samples=16, n_importance=16)
    rng = np.random.default_rng(2)
    B = 8
    o = rng.normal(size=(B, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o + rng.normal(size=(B, 3)) * 0.05
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(o, jnp.float32)
    rays_d = jnp.asarray(d, jnp.float32)
    near = jnp.full((B, 1), 1.0)
    far = jnp.full((B, 1), 3.0)

    def run(fused):
        cfg = dict(base_cfg)
        cfg["sdf"] = dict(cfg["sdf"], use_fused_train=fused)

        def loss(p):
            out = neus.render(jax.random.key(0), p, cfg, rays_o, rays_d,
                              near, far, perturb_overwrite=0.0)
            return (out["color_fine"].sum()
                    + out["gradient_error"]
                    + out["weight_sum"].sum()), out["color_fine"]

        (val, col), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return val, col, grads

    v_f, c_f, g_f = run(True)
    v_x, c_x, g_x = run(False)
    np.testing.assert_allclose(c_f, c_x, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(v_f, v_x, atol=5e-4, rtol=5e-4)
    flat_f, _ = jax.tree_util.tree_flatten(g_f)
    flat_x, _ = jax.tree_util.tree_flatten(g_x)
    for a, b in zip(flat_f, flat_x):
        an, bn = np.linalg.norm(a), np.linalg.norm(b)
        assert np.linalg.norm(a - b) <= 5e-3 * max(bn, 1e-3), (a.shape, an, bn)


def test_ray_op_unpadded_single_tile(fc):
    rng = np.random.default_rng(1)
    d_feat, L, n_layers = 8, 1, 1
    cfg = {"n_layers": n_layers, "multires_view": L,
           "mode": "idr", "squeeze_out": True}
    B, N = 2, 8           # M=16 == TILE exactly (no padding)
    M = B * N
    params = _params(rng, d_feat + 9 + 6 * L, 16, n_layers + 1, True)
    sdf_out = jnp.asarray(rng.normal(size=(M, 1 + d_feat)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(9, M)), jnp.float32)  # channel planes
    weights = jnp.asarray(rng.random((B, N)), jnp.float32)
    got = fc.color_fused_ray(params, cfg, sdf_out, u, weights)
    want = fc.ray_reference(params, cfg, sdf_out, u, weights)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
