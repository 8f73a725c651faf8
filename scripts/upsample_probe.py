"""Break the phase-2 upsample loop (renderer.py:423-446 equivalent) into
its primitive costs on the real chip: SDF evals vs sample_pdf
(searchsorted) vs cat_z_vals (argsort merge).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/upsample_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from fmov_pose_tpu.core.sampling import sample_pdf
from fmov_pose_tpu.render import neus


def timeit(f, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    n_rays = 8192
    model_cfg = ge._model_cfg(n_samples=64, n_importance=64)
    for net in ("sdf", "color", "nerf"):
        model_cfg[net] = dict(model_cfg[net], compute_dtype="bfloat16")
    model_cfg["sdf"]["use_fused_train"] = True
    params = ge._field_params(jax.random.key(0))

    rng = np.random.default_rng(0)
    o = rng.normal(size=(n_rays, 3))
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = -o + rng.normal(size=(n_rays, 3)) * 0.05
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(o, jnp.float32)
    rays_d = jnp.asarray(d, jnp.float32)
    near = jnp.full((n_rays, 1), 1.0)
    far = jnp.full((n_rays, 1), 3.0)
    z_lin = jnp.linspace(0.0, 1.0, 64)
    z_vals0 = near + (far - near) * z_lin[None, :]

    sdf_fn = neus._sdf_only_fn(model_cfg)

    # (a) the 5 SDF eval batches alone (64 + 4x16 new samples per ray)
    def sdf_evals(p):
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals0[..., :, None]
        acc = sdf_fn(p["sdf"], pts.reshape(-1, 3)).sum()
        for i in range(4):
            sub = z_vals0[:, i * 16:(i + 1) * 16]
            pts = rays_o[:, None, :] + rays_d[:, None, :] * sub[..., :, None]
            acc += sdf_fn(p["sdf"], pts.reshape(-1, 3)).sum()
        return acc

    print(f"5 sdf evals (fused): {timeit(jax.jit(sdf_evals), params):8.2f} ms")

    # (b) sample_pdf x4 at the real shapes
    w = jnp.asarray(rng.random((n_rays, 63)), jnp.float32)

    def pdf4(weights):
        acc = 0.0
        for i in range(4):
            acc += sample_pdf(z_vals0, weights, 16).sum()
        return acc

    print(f"sample_pdf x4:       {timeit(jax.jit(pdf4), w):8.2f} ms")

    # (c) cat_z_vals x4 (argsort merge + sdf requery is excluded: pass last)
    new_z = jnp.asarray(rng.random((n_rays, 16)) * 2 + 1, jnp.float32)
    sdf_vals = jnp.asarray(rng.random((n_rays, 64)), jnp.float32)

    def cat4(z, s):
        acc = 0.0
        for i in range(4):
            z2, s2 = neus.cat_z_vals(params, model_cfg, rays_o, rays_d,
                                     z[:, :64], new_z, s, last=True)
            acc += z2.sum()
        return acc

    print(f"argsort merge x4:    {timeit(jax.jit(cat4), z_vals0, sdf_vals):8.2f} ms")

    # (d) the up_sample weight math alone x4
    def upw4(s):
        acc = 0.0
        for i in range(4):
            acc += neus.up_sample(params, model_cfg, rays_o, rays_d,
                                  z_vals0, s, 16, 64.0 * 2 ** i).sum()
        return acc

    print(f"up_sample (w+pdf) x4:{timeit(jax.jit(upw4), sdf_vals):8.2f} ms")

    # (e) whole loop for reference
    def whole(p):
        z_vals = z_vals0
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., :, None]
        sdf = sdf_fn(p["sdf"], pts.reshape(-1, 3)).reshape(n_rays, 64)
        for i in range(4):
            nz = neus.up_sample(p, model_cfg, rays_o, rays_d, z_vals, sdf,
                                16, 64.0 * 2 ** i)
            z_vals, sdf = neus.cat_z_vals(p, model_cfg, rays_o, rays_d,
                                          z_vals, nz, sdf, last=(i == 3))
        return z_vals.sum()

    print(f"whole upsample loop: {timeit(jax.jit(whole), params):8.2f} ms")


if __name__ == "__main__":
    main()
