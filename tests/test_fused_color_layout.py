"""Feature-first color-input layout algebra (ops/fused_color.py).

The Pallas kernels don't run on CPU, but the layout transform is pure
jnp: apply_from_concat on (permuted params, feature-first xc) must equal
apply_from_concat on (original params, standard xc) — values AND grads.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fmov_pose_tpu.core.embedder import positional_encode
from fmov_pose_tpu.fields import nets
from fmov_pose_tpu.ops import fused_color

CFG = {
    "d_feature": 32, "mode": "idr", "d_in": 9, "d_out": 3,
    "d_hidden": 32, "n_layers": 2, "weight_norm": True,
    "multires_view": 4, "squeeze_out": True,
}


def _data(rng, n=17):
    pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)) * 0.3
    d = rng.normal(size=(n, 3))
    dirs = jnp.asarray(
        (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32))
    nrm = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    ft = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32)) * 0.3
    return pts, dirs, nrm, ft


def _std_xc(pts, dirs, nrm, ft):
    vpe = positional_encode(dirs, CFG["multires_view"])
    return jnp.concatenate([pts, vpe, nrm, ft], axis=-1)


def test_featfirst_assembly_and_permute_match(rng):
    params = nets.init_color(jax.random.key(0), CFG)
    pts, dirs, nrm, ft = _data(rng)

    out_std = fused_color.apply_from_concat(
        params, CFG, _std_xc(pts, dirs, nrm, ft))
    xc2 = fused_color.assemble_featfirst(CFG, pts, dirs, nrm, ft)
    p2 = fused_color.permute_params_featfirst(params, CFG)
    out_ff = fused_color.apply_from_concat(p2, CFG, xc2)
    np.testing.assert_allclose(np.asarray(out_ff), np.asarray(out_std),
                               rtol=1e-5, atol=1e-6)


def test_featfirst_grads_match(rng):
    params = nets.init_color(jax.random.key(1), CFG)
    pts, dirs, nrm, ft = _data(rng)
    ct = jnp.asarray(rng.normal(size=(17, 3)).astype(np.float32))

    def loss_std(p, pt, di, nr, f):
        return (fused_color.apply_from_concat(
            p, CFG, _std_xc(pt, di, nr, f)) * ct).sum()

    def loss_ff(p, pt, di, nr, f):
        xc2 = fused_color.assemble_featfirst(CFG, pt, di, nr, f)
        p2 = fused_color.permute_params_featfirst(p, CFG)
        return (fused_color.apply_from_concat(p2, CFG, xc2) * ct).sum()

    gs = jax.grad(loss_std, argnums=(0, 1, 2, 3, 4))(
        params, pts, dirs, nrm, ft)
    gf = jax.grad(loss_ff, argnums=(0, 1, 2, 3, 4))(
        params, pts, dirs, nrm, ft)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
