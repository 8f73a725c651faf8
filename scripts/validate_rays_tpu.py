"""Validate the rays-variant fused path against the plain XLA render on
the real chip.

Covers what tests/test_fused_ray.py cannot: production widths + REAL
Mosaic lowering (not interpret).  Gate: every param-gradient within 1%
relative L2, same as scripts/validate_kernels_tpu.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_rays_tpu.py
"""
import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from fmov_pose_tpu.render import neus


def main():
    params = ge._field_params(jax.random.key(0))
    base_cfg = ge._model_cfg(n_samples=64, n_importance=64)
    rng = np.random.default_rng(2)
    B = 1024
    o = rng.normal(size=(B, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o + rng.normal(size=(B, 3)) * 0.05
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(o, jnp.float32)
    rays_d = jnp.asarray(d, jnp.float32)
    near = jnp.full((B, 1), 1.0)
    far = jnp.full((B, 1), 3.0)

    def make_loss(fused):
        cfg = dict(base_cfg)
        cfg["sdf"] = dict(cfg["sdf"], use_fused_train=fused)

        def loss(p):
            out = neus.render(jax.random.key(0), p, cfg, rays_o, rays_d,
                              near, far, perturb_overwrite=0.0)
            return (out["color_fine"].sum() + out["gradient_error"]
                    + out["weight_sum"].sum())
        return jax.jit(jax.value_and_grad(loss))

    vf, gf = make_loss(True)(params)
    vx, gx = make_loss(False)(params)
    print(f"loss fused={float(vf):.6f} xla={float(vx):.6f} "
          f"rel={abs(float(vf - vx)) / abs(float(vx)):.2e}")
    worst, worst_name = 0.0, ""
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gf),
                            jax.tree_util.tree_leaves(gx)):
        an = float(jnp.linalg.norm(a.astype(jnp.float32)))
        bn = float(jnp.linalg.norm(b.astype(jnp.float32)))
        dn = float(jnp.linalg.norm((a - b).astype(jnp.float32)))
        rel = dn / (bn + 1e-8)
        if rel > worst:
            worst, worst_name = rel, jax.tree_util.keystr(path)
        print(f"{jax.tree_util.keystr(path):45s} rel={rel:.3e} "
              f"(|g|={bn:.3e})")
    print(f"worst: {worst:.3e} {worst_name}")
    assert worst < 0.01, f"grad error {worst:.3e} exceeds 1% gate"
    print("OK: rays fused path within 1% of XLA")


if __name__ == "__main__":
    main()
