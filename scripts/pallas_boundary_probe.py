"""Measure the pallas-boundary layout costs that shaped ops/fused_sdf.py.

Findings from the round-2 perf hunt this probe re-measures (v5e, 1M
points, tile 1024):

  * The 8x256 MLP matmul chain runs at ~100-150 TF/s in a clean Pallas
    kernel (transcendentals cost ~10%) — the production kernels are
    boundary-bound, not compute-bound.
  * Feeding a kernel an input materialized from the loop-form positional
    encoding (13 slice/concat pieces of 3-wide arrays, 42x lane padding)
    cost 2.3x end-to-end: 60 ms vs 26 ms for the fwd+grad wrapper. The
    loop form was replaced by the matmul form (fused_sdf._pe_mm); this
    probe records the wrapper's current time so a regression re-opens
    the question.
  * The color [N, 289] xc concat + backward split costs ~24 ms on top of
    the ~19 ms kernel. A fully split-input kernel measured a WASH
    (3-wide inputs DMA 42x-padded), so the concat path is shipped; the
    overhead is re-measured here.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/pallas_boundary_probe.py
One TPU process at a time.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from fmov_pose_tpu.core.embedder import positional_encode
from fmov_pose_tpu.ops import fused_color, fused_sdf

N = 1 << 20


def timeit(f, *args, n=15, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    sdf_cfg = dict(ge.SDF_CFG)
    params = ge._field_params(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(N, 3)) * 0.4, jnp.float32)

    def fwd_only(p, x):
        return fused_sdf.sdf_only_fused(p, sdf_cfg, x).sum()

    print(f"sdf fwd-only kernel:          "
          f"{timeit(jax.jit(fwd_only), params['sdf'], x):7.2f} ms"
          "   (round-2 reference: ~11)")

    def fwd_grad(p, x):
        out, grad = fused_sdf.sdf_apply_grad_fused(p, sdf_cfg, x)
        return out.sum() + grad.sum()

    print(f"sdf fwd+grad wrapper:         "
          f"{timeit(jax.jit(fwd_grad), params['sdf'], x):7.2f} ms"
          "   (matmul PE ~26; loop-form PE was ~60)")

    def second_order(p, x):
        out, grad = fused_sdf.sdf_apply_grad_fused(p, sdf_cfg, x)
        return out.sum() + ((jnp.linalg.norm(grad, axis=-1) - 1) ** 2).sum()

    print(f"sdf 2nd-order fwd+bwd:        "
          f"{timeit(jax.jit(jax.grad(second_order)), params['sdf'], x):7.2f}"
          " ms   (round-2 reference: ~70; was 143 with loop-form PE)")

    c_cfg = ge.COLOR_CFG
    cp = params["color"]
    pts = jnp.asarray(rng.normal(size=(N, 3)) * 0.3, jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    nrm = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    ft = jnp.asarray(rng.normal(size=(N, 256)) * 0.3, jnp.float32)
    xc0 = jnp.asarray(rng.normal(size=(N, 289)) * 0.3, jnp.float32)

    def prebuilt(p, xc):
        return fused_color.color_fused(p, c_cfg, xc).sum()

    def assembled(p, pt, di, nr, f):
        vpe = positional_encode(di, c_cfg["multires_view"])
        xc = jnp.concatenate([pt, vpe, nr, f], axis=-1)
        return fused_color.color_fused(p, c_cfg, xc).sum()

    t1 = timeit(jax.jit(jax.grad(prebuilt)), cp, xc0)
    t2 = timeit(jax.jit(jax.grad(assembled, argnums=(0, 1, 2, 3, 4))),
                cp, pts, dirs, nrm, ft)
    print(f"color fwd+bwd prebuilt xc:    {t1:7.2f} ms   (~19)")
    print(f"color fwd+bwd with assembly:  {t2:7.2f} ms "
          f"(assembly overhead {t2 - t1:+.2f} ms, ~24 known)")


if __name__ == "__main__":
    main()
