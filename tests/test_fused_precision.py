"""The in-kernel bf16 dots must be immune to the global matmul-precision
knob.

Regression guard for a real on-chip failure (round 4): with
``jax_default_matmul_precision=highest`` set globally (e.g. an f32
quality eval), every in-kernel ``jnp.dot``/``dot_general`` that did not
pass an explicit ``precision=`` inherited ``contract_precision<fp32>``
on its *bf16* operands, and Mosaic rejected the kernel at compile time::

    Mosaic failed to compile TPU kernel: Bad lhs type
    %10347 = "tpu.matmul"(...) <{..., precision = #tpu.contract_precision<fp32>}>
        : (vector<1024x128xbf16>, vector<128x128xbf16>, ...)

The fix pins ``precision=Precision.DEFAULT`` on every bf16 in-kernel dot
(fused_sdf._dot and the dws/dbs accumulation dot_generals;
fused_color._dot/_dot_acc).  Mosaic lowering itself cannot run on CPU,
so this test asserts the *trace-level* contract: under a global
``highest`` default, the jaxprs of the fused kernels must contain no
HIGHEST-precision dot with bf16 operands.  (The deliberate HIGHEST dots
— PE/selection matmuls — are f32 x f32, which Mosaic accepts.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmov_pose_tpu.fields import nets

SDF_CFG = {"d_out": 17, "d_in": 3, "d_hidden": 32, "n_layers": 4,
           "skip_in": (2,), "multires": 3, "bias": 0.5, "scale": 1.0,
           "geometric_init": True, "weight_norm": True}
COLOR_CFG = {"d_feature": 16, "mode": "idr", "d_in": 9, "d_out": 3,
             "d_hidden": 32, "n_layers": 4, "weight_norm": True,
             "multires_view": 2, "squeeze_out": True}


def _bf16_highest_dots(jaxpr) -> list:
    """All dot_general eqns (recursively) with a bf16 operand and HIGHEST
    precision — the combination Mosaic rejects in-kernel."""
    bad = []

    def walk(jx):
        for eqn in jx.eqns:
            for sub in jax.core.jaxprs_in_params(eqn.params):
                walk(sub)
            if eqn.primitive.name != "dot_general":
                continue
            prec = eqn.params.get("precision")
            if prec is None:
                continue
            if not any(p == jax.lax.Precision.HIGHEST
                       for p in np.ravel(prec).tolist()):
                continue
            if any(v.aval.dtype == jnp.bfloat16 for v in eqn.invars):
                bad.append(eqn)

    walk(jaxpr)
    return bad


@pytest.fixture()
def interp(monkeypatch):
    jax.clear_caches()
    monkeypatch.setenv("FMOV_PALLAS_INTERPRET", "1")
    yield
    jax.clear_caches()


def test_sdf_kernels_no_bf16_highest(interp):
    from fmov_pose_tpu.ops import fused_sdf
    params = nets.init_sdf(jax.random.key(0), SDF_CFG)
    x = jnp.zeros((64, 3), jnp.float32)

    with jax.default_matmul_precision("highest"):
        def loss(p):
            s, g = fused_sdf.sdf_apply_grad_fused(p, SDF_CFG, x)
            return jnp.sum(s) + jnp.sum(g)
        jx = jax.make_jaxpr(jax.grad(loss))(params)
        assert not _bf16_highest_dots(jx.jaxpr)

        jx2 = jax.make_jaxpr(
            lambda p: fused_sdf.sdf_only_fused(p, SDF_CFG, x))(params)
        assert not _bf16_highest_dots(jx2.jaxpr)

        x_pl = jnp.zeros((3, 64), jnp.float32)

        def loss_rays(p):
            out, sbn, gr = fused_sdf.sdf_apply_grad_fused_rays(
                p, SDF_CFG, x_pl, 8)
            return jnp.sum(out) + jnp.sum(sbn) + jnp.sum(gr)
        jx3 = jax.make_jaxpr(jax.grad(loss_rays))(params)
        assert not _bf16_highest_dots(jx3.jaxpr)


def test_color_kernels_no_bf16_highest(interp):
    from fmov_pose_tpu.ops import fused_color
    params = nets.init_color(jax.random.key(0), COLOR_CFG)
    B, N = 4, 8
    M = B * N
    pts = jnp.zeros((M, 3))
    dirs = jnp.ones((M, 3)) / np.sqrt(3.0)
    normals = jnp.ones((M, 3))
    feature = jnp.zeros((M, COLOR_CFG["d_feature"]))

    with jax.default_matmul_precision("highest"):
        def loss(p):
            c = fused_color.color_fused_featfirst(
                p, COLOR_CFG, pts, dirs, normals, feature)
            return jnp.sum(c)
        jx = jax.make_jaxpr(jax.grad(loss))(params)
        assert not _bf16_highest_dots(jx.jaxpr)

        sdf_out = jnp.zeros((M, 1 + COLOR_CFG["d_feature"]))
        u = jnp.concatenate([pts, dirs, normals], axis=1).T
        weights = jnp.full((B, N), 1.0 / N)

        def loss_ray(p):
            c = fused_color.color_fused_ray(
                p, COLOR_CFG, sdf_out, u, weights)
            return jnp.sum(c)
        jx2 = jax.make_jaxpr(jax.grad(loss_ray))(params)
        assert not _bf16_highest_dots(jx2.jaxpr)


def test_fused_forward_still_runs_under_highest(interp):
    """Numerics smoke: interpret-mode forward under the global knob."""
    from fmov_pose_tpu.ops import fused_sdf
    params = nets.init_sdf(jax.random.key(0), SDF_CFG)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(48, 3)) * 0.4, jnp.float32)
    base = fused_sdf.sdf_apply_fused(params, SDF_CFG, x)
    jax.clear_caches()
    with jax.default_matmul_precision("highest"):
        hi = fused_sdf.sdf_apply_fused(params, SDF_CFG, x)
    # in-kernel dots are pinned -> the kernel result is unchanged by the
    # global knob (only XLA-side prep outside the kernel could differ)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(base),
                               atol=5e-6, rtol=5e-6)
