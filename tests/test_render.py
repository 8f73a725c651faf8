import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmov_pose_tpu.fields import nets
from fmov_pose_tpu.render import neus
from tests.test_fields import COLOR_CFG, NERF_CFG, SDF_CFG


def build_params(sharp_variance=0.6):
    k = jax.random.key(0)
    k1, k2, k3 = jax.random.split(k, 3)
    params = {
        "sdf": nets.init_sdf(k1, SDF_CFG),
        "color": nets.init_color(k2, COLOR_CFG),
        "nerf": nets.init_nerf(k3, NERF_CFG),
        "variance": {"variance": jnp.asarray(sharp_variance)},
    }
    return params


def model_cfg(n_samples=64, n_importance=0, n_outside=0, up_sample_steps=4,
              perturb=0.0):
    return {
        "sdf": SDF_CFG,
        "color": COLOR_CFG,
        "nerf": NERF_CFG,
        "renderer": neus.RenderCfg(n_samples, n_importance, n_outside,
                                   up_sample_steps, perturb),
    }


def rays_toward_origin(n=8, dist=2.0):
    """n rays from a ring at |o| = dist all aimed at the origin."""
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    o = np.stack([np.cos(ang), np.sin(ang), np.zeros(n)], -1) * dist
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def near_far(rays_o, rays_d):
    a = jnp.sum(rays_d**2, -1, keepdims=True)
    b = 2.0 * jnp.sum(rays_o * rays_d, -1, keepdims=True)
    mid = 0.5 * (-b) / a
    return mid - 1.0, mid + 1.0


def test_hit_sphere_depth_and_mask():
    """Geometric-init SDF ~ sphere r=0.5; rays from |o|=2 should see
    depth ~ 1.5 and weight_sum ~ 1."""
    params = build_params()
    cfg = model_cfg()
    rays_o, rays_d = rays_toward_origin()
    near, far = near_far(rays_o, rays_d)
    out = neus.render(jax.random.key(0), params, cfg, rays_o, rays_d, near, far)
    depth = np.asarray(out["depth_fine"])[:, 0]
    wsum = np.asarray(out["weight_sum"])[:, 0]
    np.testing.assert_allclose(depth, 1.5, atol=0.1)
    assert (wsum > 0.9).all()


def test_miss_rays_low_weight():
    params = build_params()
    cfg = model_cfg()
    o = jnp.asarray([[2.0, 0.0, 0.9]] * 4, jnp.float32)  # passes 0.9 above org
    d = jnp.asarray([[-1.0, 0.0, 0.0]] * 4, jnp.float32)
    near, far = near_far(o, d)
    out = neus.render(jax.random.key(0), params, cfg, o, d, near, far)
    assert (np.asarray(out["weight_sum"]) < 0.2).all()


def test_importance_sampling_refines_depth():
    params = build_params()
    rays_o, rays_d = rays_toward_origin()
    near, far = near_far(rays_o, rays_d)
    coarse = neus.render(jax.random.key(0), params, model_cfg(n_samples=32),
                         rays_o, rays_d, near, far)
    fine = neus.render(jax.random.key(0), params,
                       model_cfg(n_samples=32, n_importance=32),
                       rays_o, rays_d, near, far)
    err_c = np.abs(np.asarray(coarse["depth_fine"]) - 1.5).mean()
    err_f = np.abs(np.asarray(fine["depth_fine"]) - 1.5).mean()
    assert err_f <= err_c + 1e-3
    assert fine["weights"].shape[-1] == 64


def test_render_differentiable_wrt_params_and_rays():
    params = build_params()
    cfg = model_cfg(n_samples=16)
    rays_o, rays_d = rays_toward_origin(4)
    near, far = near_far(rays_o, rays_d)

    def loss(p, ro):
        out = neus.render(jax.random.key(0), p, cfg, ro, rays_d, near, far)
        return (out["color_fine"].sum() + out["gradient_error"]
                + out["weight_sum"].sum())

    gp, go = jax.grad(loss, argnums=(0, 1))(params, rays_o)
    leaves = jax.tree_util.tree_leaves(gp)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert np.isfinite(np.asarray(go)).all()
    assert float(jnp.abs(go).max()) > 0


def test_render_jit_compiles():
    params = build_params()
    cfg = model_cfg(n_samples=16, n_importance=16)
    rays_o, rays_d = rays_toward_origin(4)
    near, far = near_far(rays_o, rays_d)
    f = jax.jit(lambda p, ro, rd, n, f_: neus.render(
        jax.random.key(0), p, cfg, ro, rd, n, f_))
    out = f(params, rays_o, rays_d, near, far)
    assert out["color_fine"].shape == (4, 3)


def test_background_nerf_path_runs():
    params = build_params()
    cfg = model_cfg(n_samples=16, n_outside=8)
    rays_o, rays_d = rays_toward_origin(4)
    near, far = near_far(rays_o, rays_d)
    out = neus.render(jax.random.key(0), params, cfg, rays_o, rays_d, near, far)
    assert out["weights"].shape == (4, 16 + 8)
    assert np.isfinite(np.asarray(out["color_fine"])).all()


def test_eval_mode_stops_gradient_through_normals():
    params = build_params()
    cfg = model_cfg(n_samples=8)
    rays_o, rays_d = rays_toward_origin(2)
    near, far = near_far(rays_o, rays_d)
    out = neus.render(jax.random.key(0), params, cfg, rays_o, rays_d, near,
                      far, eval_mode=True)
    assert np.isfinite(np.asarray(out["color_fine"])).all()


def test_perturb_changes_samples():
    params = build_params()
    cfg = model_cfg(n_samples=16, perturb=1.0)
    rays_o, rays_d = rays_toward_origin(4)
    near, far = near_far(rays_o, rays_d)
    o1 = neus.render(jax.random.key(1), params, cfg, rays_o, rays_d, near, far)
    o2 = neus.render(jax.random.key(2), params, cfg, rays_o, rays_d, near, far)
    assert not np.allclose(np.asarray(o1["depth_fine"]), np.asarray(o2["depth_fine"]))
