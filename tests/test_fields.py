import jax
import jax.numpy as jnp
import numpy as np

from fmov_pose_tpu.fields import nets

SDF_CFG = {
    "d_out": 257, "d_in": 3, "d_hidden": 256, "n_layers": 8,
    "skip_in": (4,), "multires": 6, "bias": 0.5, "scale": 1.0,
    "geometric_init": True, "weight_norm": True,
}
COLOR_CFG = {
    "d_feature": 256, "mode": "idr", "d_in": 9, "d_out": 3,
    "d_hidden": 256, "n_layers": 4, "weight_norm": True,
    "multires_view": 4, "squeeze_out": True,
}
NERF_CFG = {
    "D": 8, "d_in": 4, "d_in_view": 3, "W": 256, "multires": 10,
    "multires_view": 4, "output_ch": 4, "skips": (4,), "use_viewdirs": True,
}


def test_sdf_shapes():
    params = nets.init_sdf(jax.random.key(0), SDF_CFG)
    x = jnp.zeros((17, 3))
    out = nets.sdf_apply(params, SDF_CFG, x)
    assert out.shape == (17, 257)


def test_sdf_geometric_init_is_sphere():
    """Geometric init approximates a sphere of radius ~ bias: negative
    inside, positive outside, zero-crossing near 0.5, monotone in radius."""
    params = nets.init_sdf(jax.random.key(0), SDF_CFG)
    rng = np.random.default_rng(1)
    dirs = rng.normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    means = []
    for r in [0.2, 0.4, 0.5, 0.6, 0.8, 1.0]:
        sdf = np.asarray(
            nets.sdf_only(params, SDF_CFG, jnp.asarray(r * dirs, jnp.float32)))
        means.append(sdf[:, 0].mean())
    means = np.asarray(means)
    assert means[0] < -0.05 and means[1] < -0.02   # inside: negative
    assert means[-2] > 0.02 and means[-1] > 0.05   # outside: positive
    assert abs(means[2]) < 0.1                     # crossing near r = 0.5
    assert (np.diff(means) > 0).all()              # monotone


def test_sdf_gradient_matches_per_point_jacobian():
    """The batched VJP gradient must equal the per-point jacobian.

    (A finite-difference oracle is too noisy here: f32 accumulation noise
    through 9 weight-normed layers is ~3e-4, larger than eps*grad.)
    """
    params = nets.init_sdf(jax.random.key(0), SDF_CFG)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(5, 3)) * 0.3, jnp.float32)
    g = np.asarray(nets.sdf_gradient(params, SDF_CFG, x))
    jac = np.asarray(jax.vmap(
        jax.grad(lambda p: nets.sdf_only(params, SDF_CFG, p[None])[0, 0]))(x))
    np.testing.assert_allclose(g, jac, atol=5e-3)


def test_sdf_gradient_near_unit_norm_at_init():
    """Sphere init -> eikonal property |grad| ~ 1."""
    params = nets.init_sdf(jax.random.key(0), SDF_CFG)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(32, 3)) * 0.4, jnp.float32)
    g = np.asarray(nets.sdf_gradient(params, SDF_CFG, x))
    norms = np.linalg.norm(g, axis=-1)
    # geometric init is only an approximate sphere; check the norm is O(1)
    assert norms.mean() > 0.6 and norms.mean() < 1.4
    assert (norms > 0.3).all() and (norms < 2.0).all()


def test_sdf_double_differentiable():
    """Training needs grad of a loss containing sdf_gradient (double backward)."""
    params = nets.init_sdf(jax.random.key(0), SDF_CFG)
    x = jnp.ones((4, 3)) * 0.3

    def loss(p):
        g = nets.sdf_gradient(p, SDF_CFG, x)
        return ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).mean()

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    assert any(float(jnp.abs(l).max()) > 0 for l in flat)


def test_color_shapes_and_range():
    params = nets.init_color(jax.random.key(1), COLOR_CFG)
    n = 11
    out = nets.color_apply(
        params, COLOR_CFG,
        jnp.zeros((n, 3)), jnp.ones((n, 3)), jnp.ones((n, 3)), jnp.zeros((n, 256)))
    assert out.shape == (n, 3)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()


def test_nerf_background_shapes():
    params = nets.init_nerf(jax.random.key(2), NERF_CFG)
    alpha, rgb = nets.nerf_apply(params, NERF_CFG, jnp.zeros((9, 4)), jnp.ones((9, 3)))
    assert alpha.shape == (9, 1)
    assert rgb.shape == (9, 3)


def test_variance():
    p = nets.init_variance({"init_val": 0.3})
    inv_s = float(nets.variance_inv_s(p))
    np.testing.assert_allclose(inv_s, np.exp(3.0), rtol=1e-5)


def test_weight_norm_equals_plain_at_init():
    """At init g = ||v|| so weight-normed output == raw weights output."""
    cfg = dict(SDF_CFG, weight_norm=False)
    k = jax.random.key(0)
    p_wn = nets.init_sdf(k, SDF_CFG)
    p_plain = nets.init_sdf(k, cfg)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(6, 3)) * 0.2, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(nets.sdf_apply(p_wn, SDF_CFG, x)),
        np.asarray(nets.sdf_apply(p_plain, cfg, x)),
        atol=5e-3,  # f32 rounding amplified through 9 layers
    )
