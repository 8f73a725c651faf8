"""Pallas-fused SDF field evaluation (TPU kernel).

The SDF MLP is tiny (8x256) so the XLA implementation is HBM-bound: every
inter-layer activation round-trips to HBM (measured ~44 TF/s-equivalent,
i.e. bandwidth- not FLOP-limited).  This kernel keeps the whole network
resident in VMEM — weights (~2.2 MB) plus one tile of activations — so the
only HBM traffic is the (pre-encoded) input points and the requested
outputs.

Positional encoding and its Jacobian-transpose stay OUTSIDE the kernel:
per-frequency [T, 3] slices pad to 128 lanes in VMEM (42x waste, blew the
scoped-VMEM stack), while XLA handles them as cheap fused pointwise ops.

Entry points (all `jax.custom_vjp`: kernel primal, XLA-reference backward,
so differentiation through them is exactly the pure-JAX gradient):

* ``sdf_only_fused / sdf_apply_fused`` — the forward used by the
  gradient-free SDF-guided upsampling (`renderer.py:423-446`), grid/mesh
  evaluation, and eval renders.
* ``sdf_apply_grad_fused`` — forward + in-kernel reverse pass for
  d(sdf)/dx (single delta stream over VMEM-resident pre-activations).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fmov_pose_tpu.core.embedder import positional_encode
from fmov_pose_tpu.fields import nets

TILE = 512
VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128 MB VMEM/core


def _materialize(params, cfg):
    """Weight-norm -> dense [in, out] f32 weights + [1, out] biases."""
    dims = nets.sdf_dims(cfg)
    n_lin = len(dims) - 1
    ws, bs = [], []
    for l in range(n_lin):
        p = params["layers"][f"lin{l}"]
        if "v" in p:
            v = p["v"]
            w = v * (p["g"] / (jnp.linalg.norm(v, axis=1) + 1e-12))[:, None]
        else:
            w = p["w"]
        ws.append(w.T)
        bs.append(p["b"][None, :])
    return ws, bs


def _softplus100(x):
    return jax.nn.softplus(100.0 * x) / 100.0


def _pe_vjp(xs: jnp.ndarray, d_inputs: jnp.ndarray, multires: int):
    """Jacobian-transpose of the positional encoding.

    xs: [N, 3] (already input-scaled); d_inputs: [N, 3*(1+2L)] cotangent
    w.r.t. the encoded features. Returns [N, 3] cotangent w.r.t. xs.
    """
    gx = d_inputs[:, 0:3]
    for i in range(multires):
        f = 2.0 ** i
        s_cols = d_inputs[:, 3 + 6 * i:6 + 6 * i]
        c_cols = d_inputs[:, 6 + 6 * i:9 + 6 * i]
        gx = gx + s_cols * f * jnp.cos(xs * f) - c_cols * f * jnp.sin(xs * f)
    return gx


def _dot(a, b):
    """bf16 x bf16 -> f32 MXU dot (weights are cast once per tile)."""
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _forward_tile(inputs, ws, bs, cfg, keep_preacts=False):
    skip_in = tuple(cfg.get("skip_in", (4,)))
    scale = cfg.get("scale", 1.0)
    n_lin = len(ws)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    h = inputs
    preacts = []
    for l in range(n_lin):
        if l in skip_in:
            h = jnp.concatenate([h, inputs], axis=-1) * inv_sqrt2
        pre = _dot(h, ws[l]) + bs[l]
        if l < n_lin - 1:
            if keep_preacts:
                preacts.append(pre)
            h = _softplus100(pre)
        else:
            h = pre
    out = jnp.concatenate([h[:, :1] / scale, h[:, 1:]], axis=-1)
    return out, preacts


def _make_fwd_kernel(cfg, n_lin, want_feature):
    def kernel(*refs):
        xe_ref = refs[0]
        ws = [refs[1 + i][:] for i in range(n_lin)]
        bs = [refs[1 + n_lin + i][:] for i in range(n_lin)]
        out_ref = refs[1 + 2 * n_lin]
        out, _ = _forward_tile(xe_ref[:], ws, bs, cfg)
        if want_feature:
            out_ref[:] = out
        else:
            out_ref[:] = out[:, :1]
    return kernel


def _make_fwd_grad_kernel(cfg, n_lin):
    skip_in = tuple(cfg.get("skip_in", (4,)))
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    def kernel(*refs):
        # inputs: xe, ws[0..n-1], bs[0..n-1], wts[0..n-2] (pre-transposed),
        # w_last_col [1, in_last]
        xe_ref = refs[0]
        ws = [refs[1 + i][:] for i in range(n_lin)]
        bs = [refs[1 + n_lin + i][:] for i in range(n_lin)]
        wts = [refs[1 + 2 * n_lin + i][:] for i in range(n_lin - 1)]
        w_last_col = refs[3 * n_lin][:]
        out_ref = refs[3 * n_lin + 1]
        dinp_ref = refs[3 * n_lin + 2]

        inputs = xe_ref[:]
        out, preacts = _forward_tile(inputs, ws, bs, cfg, keep_preacts=True)
        out_ref[:] = out

        # reverse pass for the scalar sdf output (pre-/scale column 0)
        delta = jnp.broadcast_to(
            w_last_col, (inputs.shape[0], w_last_col.shape[1]))
        d_inputs = jnp.zeros_like(inputs)
        for l in range(n_lin - 2, -1, -1):
            dact = jax.nn.sigmoid(100.0 * preacts[l])
            delta = delta * dact
            delta = _dot(delta, wts[l])
            if l in skip_in:
                h_dim = wts[l].shape[1] - inputs.shape[1]
                d_inputs = d_inputs + delta[:, h_dim:] * inv_sqrt2
                delta = delta[:, :h_dim] * inv_sqrt2
        dinp_ref[:] = d_inputs + delta

    return kernel


def _pad_to_tile(x):
    n = x.shape[0]
    pad = (-n) % TILE
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], 0)
    return x, n


def _weight_specs(ws, bs):
    return ([pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
             for w in ws]
            + [pl.BlockSpec(b.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for b in bs])


@partial(jax.jit, static_argnames=("cfg_key", "want_feature"))
def _sdf_forward_impl(ws, bs, x, cfg_key, want_feature):
    cfg = dict(cfg_key)
    n_lin = len(ws)
    pe_dim = ws[0].shape[0]
    xe = positional_encode(x * cfg.get("scale", 1.0), cfg["multires"])
    xe, n = _pad_to_tile(xe)
    grid = xe.shape[0] // TILE
    d_out = cfg["d_out"] if want_feature else 1
    kernel = _make_fwd_kernel(cfg, n_lin, want_feature)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((TILE, pe_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + _weight_specs(ws, bs),
        out_specs=pl.BlockSpec((TILE, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xe.shape[0], d_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(xe, *ws, *bs)
    return out[:n]


@partial(jax.jit, static_argnames=("cfg_key",))
def _sdf_forward_grad_impl(ws, bs, x, cfg_key):
    cfg = dict(cfg_key)
    n_lin = len(ws)
    pe_dim = ws[0].shape[0]
    scale = cfg.get("scale", 1.0)
    xs = x * scale
    xe = positional_encode(xs, cfg["multires"])
    xe, n = _pad_to_tile(xe)
    grid = xe.shape[0] // TILE
    d_out = cfg["d_out"]
    wts = [w.T for w in ws[:-1]]          # host-side transposes, once
    w_last_col = ws[-1][:, 0][None, :]
    kernel = _make_fwd_grad_kernel(cfg, n_lin)
    out, d_inputs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((TILE, pe_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + _weight_specs(ws, bs)
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in wts]
        + [pl.BlockSpec(w_last_col.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((TILE, d_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, pe_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((xe.shape[0], d_out), jnp.float32),
            jax.ShapeDtypeStruct((xe.shape[0], pe_dim), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(xe, *ws, *bs, *wts, w_last_col)
    # PE jacobian^T in XLA; the d/dx scale and the /scale on the sdf output
    # cancel, matching nets.sdf_gradient exactly
    grad = _pe_vjp(xs, d_inputs[:n], cfg["multires"])
    return out[:n], grad


def _cfg_key(cfg):
    keys = ("d_out", "d_in", "d_hidden", "n_layers", "multires", "scale")
    items = [(k, cfg[k]) for k in keys if k in cfg]
    items.append(("skip_in", tuple(cfg.get("skip_in", (4,)))))
    return tuple(items)


def supported(cfg) -> bool:
    return (cfg.get("d_in", 3) == 3 and cfg.get("multires", 0) > 0
            and len(tuple(cfg.get("skip_in", (4,)))) == 1
            and jax.default_backend() != "cpu")


# ------------------------------------------------------------------
# public ops (custom_vjp: kernel primal, XLA reference backward).
# custom_vjp nondiff args must be hashable -> cfg travels as _cfg_key.
# ------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _sdf_only_op(params, cfg_key, x):
    ws, bs = _materialize(params, dict(cfg_key))
    return _sdf_forward_impl(ws, bs, x, cfg_key, False)


def _sdf_only_fwd(params, cfg_key, x):
    return _sdf_only_op(params, cfg_key, x), (params, x)


def _sdf_only_bwd(cfg_key, res, ct):
    params, x = res
    cfg = dict(cfg_key)
    _, vjp = jax.vjp(lambda p, pts: nets.sdf_only(p, cfg, pts), params, x)
    return vjp(ct)


_sdf_only_op.defvjp(_sdf_only_fwd, _sdf_only_bwd)


def sdf_only_fused(params, cfg, x):
    return _sdf_only_op(params, _cfg_key(cfg), x)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _sdf_apply_op(params, cfg_key, x):
    ws, bs = _materialize(params, dict(cfg_key))
    return _sdf_forward_impl(ws, bs, x, cfg_key, True)


def _sdf_apply_fwd(params, cfg_key, x):
    return _sdf_apply_op(params, cfg_key, x), (params, x)


def _sdf_apply_bwd(cfg_key, res, ct):
    params, x = res
    cfg = dict(cfg_key)
    _, vjp = jax.vjp(lambda p, pts: nets.sdf_apply(p, cfg, pts), params, x)
    return vjp(ct)


_sdf_apply_op.defvjp(_sdf_apply_fwd, _sdf_apply_bwd)


def sdf_apply_fused(params, cfg, x):
    return _sdf_apply_op(params, _cfg_key(cfg), x)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _sdf_apply_grad_op(params, cfg_key, x):
    ws, bs = _materialize(params, dict(cfg_key))
    return _sdf_forward_grad_impl(ws, bs, x, cfg_key)


def _sdf_apply_grad_fwd(params, cfg_key, x):
    return _sdf_apply_grad_op(params, cfg_key, x), (params, x)


def _sdf_apply_grad_bwd(cfg_key, res, cts):
    params, x = res
    cfg = dict(cfg_key)

    def ref(p, pts):
        out = nets.sdf_apply(p, cfg, pts)
        grad = nets.sdf_gradient(p, cfg, pts)
        return out, grad

    _, vjp = jax.vjp(ref, params, x)
    return vjp(cts)


_sdf_apply_grad_op.defvjp(_sdf_apply_grad_fwd, _sdf_apply_grad_bwd)


def sdf_apply_grad_fused(params, cfg, x):
    """(out [N, d_out], grad [N, 3]) in one fused kernel."""
    return _sdf_apply_grad_op(params, _cfg_key(cfg), x)
