"""Perf diagnostics on the real chip: where does the step time go?"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from fmov_pose_tpu.fields import nets
from fmov_pose_tpu.render import neus


def timeit(f, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    model_cfg = ge._model_cfg(n_samples=32, n_importance=0)
    params = ge._field_params(jax.random.key(0))
    sdf_cfg = model_cfg["sdf"]

    for n_pts in (32768, 262144):
        pts = jnp.asarray(np.random.default_rng(0).normal(
            size=(n_pts, 3)) * 0.3, jnp.float32)

        f_fwd = jax.jit(lambda p, x: nets.sdf_apply(p, sdf_cfg, x))
        t = timeit(f_fwd, params["sdf"], pts)
        flops = n_pts * (39 * 256 + 6 * 256 * 256 + 256 * 217 + 256 * 257) * 2
        print(f"sdf fwd      n={n_pts}: {t*1e3:7.2f} ms  {flops/t/1e12:6.2f} TF/s")

        f_grad = jax.jit(lambda p, x: nets.sdf_gradient(p, sdf_cfg, x))
        t = timeit(f_grad, params["sdf"], pts)
        print(f"sdf fwd+grad n={n_pts}: {t*1e3:7.2f} ms  {3*flops/t/1e12:6.2f} TF/s")

        def loss(p, x):
            g = nets.sdf_gradient(p, sdf_cfg, x)
            out = nets.sdf_apply(p, sdf_cfg, x)
            return ((jnp.linalg.norm(g, axis=-1) - 1) ** 2).mean() + out.sum()

        f_full = jax.jit(jax.grad(loss))
        t = timeit(f_full, params["sdf"], pts)
        print(f"sdf 2nd-ord  n={n_pts}: {t*1e3:7.2f} ms  {8*flops/t/1e12:6.2f} TF/s(est)")

    # full render forward (no grad), batch 1024 x 32
    rays_o = jnp.asarray(np.random.default_rng(1).normal(size=(1024, 3)), jnp.float32)
    rays_o = rays_o / jnp.linalg.norm(rays_o, axis=-1, keepdims=True) * 2
    rays_d = -rays_o / 2
    near = jnp.full((1024, 1), 1.0)
    far = jnp.full((1024, 1), 3.0)
    f_render = jax.jit(lambda p: neus.render(
        jax.random.key(0), p, model_cfg, rays_o, rays_d, near, far)["color_fine"])
    t = timeit(f_render, params)
    print(f"render fwd 1024x32: {t*1e3:7.2f} ms")

    def render_loss(p):
        out = neus.render(jax.random.key(0), p, model_cfg, rays_o, rays_d,
                          near, far)
        return out["color_fine"].sum() + out["gradient_error"]

    f_rgrad = jax.jit(jax.grad(render_loss))
    t = timeit(f_rgrad, params)
    print(f"render grad 1024x32: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
