"""Validate the fused second-order backward against the XLA reference."""
import os, time
import jax, jax.numpy as jnp, numpy as np
import __graft_entry__ as ge
from fmov_pose_tpu.fields import nets
from fmov_pose_tpu.ops import fused_sdf

params = ge._field_params(jax.random.key(0))["sdf"]
cfg = ge.SDF_CFG
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.normal(size=(4096,3))*0.3, jnp.float32)
ct_out = jnp.asarray(rng.normal(size=(4096,257))*0.1, jnp.float32)
ct_grad = jnp.asarray(rng.normal(size=(4096,3))*0.1, jnp.float32)

def loss_fused(p, x):
    out, grad = fused_sdf.sdf_apply_grad_fused(p, cfg, x)
    return (out*ct_out).sum() + (grad*ct_grad).sum()

def loss_ref(p, x):
    out = nets.sdf_apply(p, cfg, x)
    grad = nets.sdf_gradient(p, cfg, x)
    return (out*ct_out).sum() + (grad*ct_grad).sum()

gp_f, gx_f = jax.grad(loss_fused, argnums=(0,1))(params, pts)
gp_r, gx_r = jax.grad(loss_ref, argnums=(0,1))(params, pts)

paths_f = jax.tree_util.tree_leaves_with_path(gp_f)
flat_r = jax.tree_util.tree_leaves(gp_r)
worst = 0; worst_name = ""
for (path, lf), lr in zip(paths_f, flat_r):
    d = float(jnp.abs(lf - lr).max())
    rel = d / (float(jnp.abs(lr).max()) + 1e-8)
    if rel > worst: worst, worst_name = rel, jax.tree_util.keystr(path)
    print(f"{jax.tree_util.keystr(path):40s} absmax_diff={d:.3e} rel={rel:.3e}")
print("x grad diff:", float(jnp.abs(gx_f-gx_r).max()),
      "rel:", float(jnp.abs(gx_f-gx_r).max()/(jnp.abs(gx_r).max()+1e-8)))
print("worst param rel:", worst, worst_name)

# speed at 262k
big = jnp.asarray(rng.normal(size=(262144,3))*0.3, jnp.float32)
cto = jnp.ones((262144,257)); ctg = jnp.ones((262144,3))
def L_fused(p, x):
    out, grad = fused_sdf.sdf_apply_grad_fused(p, cfg, x)
    return out.sum() + (grad*grad).sum()
def L_ref(p, x):
    out = nets.sdf_apply(p, cfg, x)
    g = nets.sdf_gradient(p, cfg, x)
    return out.sum() + (g*g).sum()
for name, L in (("fused", L_fused), ("ref", L_ref)):
    f = jax.jit(jax.grad(L))
    for _ in range(3): o = f(params, big)
    jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(15): o = f(params, big)
    jax.block_until_ready(o)
    print(f"2nd-order bwd {name}: {(time.perf_counter()-t0)/15*1e3:7.2f} ms")

# ---------------------------------------------------------------------------
# fused color kernel (ops/fused_color.py): forward + first-order backward
# ---------------------------------------------------------------------------
from fmov_pose_tpu.ops import fused_color

c_cfg = ge.COLOR_CFG
c_params = ge._field_params(jax.random.key(1))["color"]
N = 4096
xc = jnp.asarray(rng.normal(size=(N, 289)) * 0.3, jnp.float32)
ct_col = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)

col_f = fused_color.color_fused(c_params, c_cfg, xc)
col_r = fused_color.apply_from_concat(c_params, c_cfg, xc)
fwd_diff = float(jnp.abs(col_f - col_r).max())
print(f"color fwd absmax_diff={fwd_diff:.3e}")

def closs_fused(p, x):
    return (fused_color.color_fused(p, c_cfg, x) * ct_col).sum()

def closs_ref(p, x):
    return (fused_color.apply_from_concat(p, c_cfg, x) * ct_col).sum()

cgp_f, cgx_f = jax.grad(closs_fused, argnums=(0, 1))(c_params, xc)
cgp_r, cgx_r = jax.grad(closs_ref, argnums=(0, 1))(c_params, xc)
worst_c = 0.0
for (path, lf), lr in zip(jax.tree_util.tree_leaves_with_path(cgp_f),
                          jax.tree_util.tree_leaves(cgp_r)):
    d = float(jnp.abs(lf - lr).max())
    rel = d / (float(jnp.abs(lr).max()) + 1e-8)
    worst_c = max(worst_c, rel)
    print(f"color {jax.tree_util.keystr(path):34s} absmax_diff={d:.3e} "
          f"rel={rel:.3e}")
print("color xc grad diff:", float(jnp.abs(cgx_f - cgx_r).max()),
      "rel:", float(jnp.abs(cgx_f - cgx_r).max()
                    / (jnp.abs(cgx_r).max() + 1e-8)))
print("color worst param rel:", worst_c)

big_xc = jnp.asarray(rng.normal(size=(262144, 289)) * 0.3, jnp.float32)
def CL_fused(p, x):
    return fused_color.color_fused(p, c_cfg, x).sum()
def CL_ref(p, x):
    return fused_color.apply_from_concat(p, c_cfg, x).sum()
for name, L in (("fused", CL_fused), ("ref", CL_ref)):
    f = jax.jit(jax.grad(L))
    for _ in range(3):
        o = f(c_params, big_xc)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(15):
        o = f(c_params, big_xc)
    jax.block_until_ready(o)
    print(f"color fwd+bwd {name}: {(time.perf_counter()-t0)/15*1e3:7.2f} ms")
