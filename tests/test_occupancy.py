"""Occupancy-grid guided sampling (opt-in acceleration)."""

import jax
import jax.numpy as jnp
import numpy as np

from fmov_pose_tpu.render import neus, occupancy
from tests.test_render import (build_params, model_cfg, near_far,
                               rays_toward_origin)


def sphere_occ(res=64, radius=0.5):
    pts = occupancy.make_grid_points(res)
    sdf = jnp.asarray(np.linalg.norm(pts, axis=-1) - radius, jnp.float32)
    return occupancy.update_occ_grid(sdf, res)


def test_grid_is_a_surface_band():
    occ = np.asarray(sphere_occ())
    pts = occupancy.make_grid_points(64).reshape(64, 64, 64, 3)
    r = np.linalg.norm(pts, axis=-1)
    band = np.abs(r - 0.5) < 0.1
    far_away = np.abs(r - 0.5) > 0.35
    assert occ[band].mean() > 0.95          # surface band marked occupied
    assert occ[far_away].mean() < 0.05      # empty space stays empty
    assert 0.0 < occ.mean() < 0.5           # sparse overall


def test_query_occ_lookup():
    occ = sphere_occ()
    on_surface = jnp.asarray([[0.5, 0.0, 0.0], [0.0, 0.5, 0.0]])
    off_surface = jnp.asarray([[0.0, 0.0, 0.0], [0.95, 0.95, 0.95]])
    assert np.asarray(occupancy.query_occ(occ, on_surface)).min() == 1.0
    assert np.asarray(occupancy.query_occ(occ, off_surface)).max() == 0.0


def test_importance_concentrates_near_surface():
    occ = sphere_occ()
    rays_o, rays_d = rays_toward_origin(8)
    near, far = near_far(rays_o, rays_d)
    z = near + (far - near) * jnp.linspace(0, 1, 32)[None, :]
    z_all = occupancy.occupancy_importance(
        jax.random.key(0), occ, rays_o, rays_d, z, 32)
    assert z_all.shape == (8, 64)
    # extra samples land near the two sphere crossings (z ~ 1.5 and 2.5)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_all[..., None]
    r = np.linalg.norm(np.asarray(pts), axis=-1)
    near_surface = (np.abs(r - 0.5) < 0.15).mean()
    assert near_surface > 0.45  # >= importance half concentrated (uniform ~0.15)


def test_render_with_occ_matches_upsampled_depth():
    """Occ-guided render should hit the same surface depth as SDF-guided."""
    params = build_params()
    cfg = model_cfg(n_samples=32, n_importance=32)
    rays_o, rays_d = rays_toward_origin(8)
    near, far = near_far(rays_o, rays_d)
    occ = sphere_occ()
    out_ref = neus.render(jax.random.key(0), params, cfg, rays_o, rays_d,
                          near, far)
    out_occ = neus.render(jax.random.key(0), params, cfg, rays_o, rays_d,
                          near, far, occ_grid=occ)
    d_ref = np.asarray(out_ref["depth_fine"])[:, 0]
    d_occ = np.asarray(out_occ["depth_fine"])[:, 0]
    np.testing.assert_allclose(d_occ, 1.5, atol=0.1)
    np.testing.assert_allclose(d_occ, d_ref, atol=0.1)
    assert out_occ["weights"].shape == out_ref["weights"].shape


def test_render_occ_differentiable():
    params = build_params()
    cfg = model_cfg(n_samples=16, n_importance=16)
    rays_o, rays_d = rays_toward_origin(4)
    near, far = near_far(rays_o, rays_d)
    occ = sphere_occ(32)

    def loss(p):
        out = neus.render(jax.random.key(0), p, cfg, rays_o, rays_d, near,
                          far, occ_grid=occ)
        return out["color_fine"].sum() + out["gradient_error"]

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
