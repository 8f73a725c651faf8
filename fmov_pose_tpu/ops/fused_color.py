"""Pallas-fused IDR color network (TPU kernel).

Companion to ops/fused_sdf.py for the phase-2 hot path
(`/root/reference/models/renderer.py:286`, fields.py:128-193): the color
MLP is 4x256 over a 289-wide input ([pts(3), view_pe(27), normals(3),
feature(256)]), so the XLA path round-trips four [N, 256] activation
buffers to HBM per direction — at phase-2 scale (1M samples/step) that is
~GBs of traffic per step. This kernel keeps weights (~1.2 MB) and the
activation tile in VMEM; backward recomputes the forward in-kernel
(activations never touch HBM) and accumulates weight/bias cotangents
across the grid.

Unlike the SDF kernel there is no second-order term: the color net is
first-order in all of its inputs. Its input cotangent xcbar [N, 289]
splits OUTSIDE the kernel into (pts, view_pe -> PE-vjp for dirs, normals
-> feeds the SDF kernel's ct_grad, feature -> ct on sdf_out[:, 1:]), so
the two fused kernels compose through plain XLA pointwise glue.

custom_vjp: Pallas primal + Pallas backward, with the pure-JAX backward
as a correctness oracle (FMOV_FUSED_COLOR_BWD=0).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = int(os.environ.get("FMOV_KERNEL_TILE", "1024"))
VMEM_LIMIT = 100 * 1024 * 1024


def _interpret() -> bool:
    """Run pallas_calls in interpret mode (CPU tests / shard_map dry
    runs).  Read per-call so tests can toggle via monkeypatch.setenv."""
    return os.environ.get("FMOV_PALLAS_INTERPRET", "0") == "1"
# below this many samples the per-call overhead (weight streaming into
# VMEM, launch, pad) beats the HBM savings — measured crossover on v5e:
# batch 512 x 32 (16k samples) regressed 128k -> 84k rays/s fused, while
# 262k-sample blocks run 1.77x faster fused
MIN_SAMPLES = int(os.environ.get("FMOV_FUSED_COLOR_MIN", "65536"))


def _materialize(params, n_lin):
    """Weight-norm -> dense [in, out] f32 weights + [1, out] biases."""
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


def _dot(a, b):
    # precision pinned: a global jax_default_matmul_precision=highest
    # otherwise stamps fp32 contract precision on the bf16 operands and
    # Mosaic rejects the kernel ("Bad lhs type").
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   precision=jax.lax.Precision.DEFAULT,
                   preferred_element_type=jnp.float32)


def _dot_acc(a, b):
    """a^T @ b with f32 accumulation (weight-cotangent accumulation)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)


def apply_from_concat(params, cfg, xc):
    """Pure-JAX reference: nets.color_apply semantics on the prebuilt
    [N, 289] concat (mode=idr, squeeze_out=True)."""
    n_lin = cfg["n_layers"] + 1
    ws, bs = _materialize(params, n_lin)
    h = xc
    for l in range(n_lin):
        h = h @ ws[l] + bs[l]
        if l < n_lin - 1:
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h)


def _make_fwd_kernel(n_lin):
    def kernel(*refs):
        xc_ref = refs[0]
        ws = [refs[1 + i][:] for i in range(n_lin)]
        bs = [refs[1 + n_lin + i][:] for i in range(n_lin)]
        out_ref = refs[1 + 2 * n_lin]
        h = xc_ref[:]
        for l in range(n_lin):
            h = _dot(h, ws[l]) + bs[l]
            if l < n_lin - 1:
                h = jnp.maximum(h, 0.0)
        out_ref[:] = jax.nn.sigmoid(h)
    return kernel


def _make_bwd_kernel(n_lin):
    """Recompute-forward backward: given ct on the sigmoid output,
    emit xcbar and accumulate weight/bias cotangents across the grid."""
    def kernel(*refs):
        xc_ref, ct_ref = refs[0], refs[1]
        ws = [refs[2 + i][:] for i in range(n_lin)]
        bs = [refs[2 + n_lin + i][:] for i in range(n_lin)]
        wts = [refs[2 + 2 * n_lin + i][:] for i in range(n_lin)]
        xcbar_ref = refs[2 + 3 * n_lin]
        dws = [refs[3 + 3 * n_lin + i] for i in range(n_lin)]
        dbs = [refs[3 + 4 * n_lin + i] for i in range(n_lin)]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for l in range(n_lin):
                dws[l][:] = jnp.zeros_like(dws[l])
                dbs[l][:] = jnp.zeros_like(dbs[l])

        xc = xc_ref[:]
        # forward, stashing post-relu activations
        acts = [xc]
        h = xc
        for l in range(n_lin):
            h = _dot(h, ws[l]) + bs[l]
            if l < n_lin - 1:
                h = jnp.maximum(h, 0.0)
                acts.append(h)
        out = jax.nn.sigmoid(h)

        zbar = ct_ref[:] * out * (1.0 - out)
        for l in range(n_lin - 1, -1, -1):
            dws[l][:] += _dot_acc(acts[l], zbar)
            dbs[l][:] += jnp.sum(zbar, axis=0, keepdims=True)
            ibar = _dot(zbar, wts[l])
            if l > 0:
                zbar = ibar * (acts[l] > 0.0).astype(jnp.float32)
        xcbar_ref[:] = ibar

    return kernel


def _pad_to_tile(x):
    n = x.shape[0]
    pad = (-n) % TILE
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], 0)
    return x, n


def _w_specs(arrs):
    return [pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for a in arrs]


@partial(jax.jit, static_argnames=("n_lin",))
def _color_fwd_impl(ws, bs, xc, n_lin):
    d_in = xc.shape[1]
    d_out = ws[-1].shape[1]
    xc, n = _pad_to_tile(xc)
    grid = xc.shape[0] // TILE
    out = pl.pallas_call(
        _make_fwd_kernel(n_lin),
        grid=(grid,),
        in_specs=[pl.BlockSpec((TILE, d_in), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + _w_specs(ws) + _w_specs(bs),
        out_specs=pl.BlockSpec((TILE, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xc.shape[0], d_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(xc, *ws, *bs)
    return out[:n]


@partial(jax.jit, static_argnames=("n_lin",))
def _color_bwd_impl(ws, bs, xc, ct, n_lin):
    d_in = xc.shape[1]
    d_out = ws[-1].shape[1]
    xc, n = _pad_to_tile(xc)
    ct, _ = _pad_to_tile(ct)
    grid = xc.shape[0] // TILE
    wts = [w.T for w in ws]
    out_shapes = ([jax.ShapeDtypeStruct((xc.shape[0], d_in), jnp.float32)]
                  + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
                  + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs])
    out_specs = ([pl.BlockSpec((TILE, d_in), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
                 + _w_specs(ws) + _w_specs(bs))
    outs = pl.pallas_call(
        _make_bwd_kernel(n_lin),
        grid=(grid,),
        in_specs=[pl.BlockSpec((TILE, d_in), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + _w_specs(ws) + _w_specs(bs) + _w_specs(wts),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(xc, ct, *ws, *bs, *wts)
    xcbar = outs[0][:n]
    dws = list(outs[1:1 + n_lin])
    dbs = [b[0] for b in outs[1 + n_lin:]]
    return xcbar, dws, dbs


def _cfg_key(cfg):
    return (("n_layers", cfg["n_layers"]),)


def supported(cfg) -> bool:
    return (cfg.get("mode", "idr") == "idr"
            and cfg.get("squeeze_out", True)
            and (jax.default_backend() != "cpu" or _interpret()))


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _color_op(params, cfg_key, xc):
    n_lin = dict(cfg_key)["n_layers"] + 1
    ws, bs = _materialize(params, n_lin)
    return _color_fwd_impl(ws, bs, xc, n_lin)


def _color_fwd(params, cfg_key, xc):
    return _color_op(params, cfg_key, xc), (params, xc)


def _color_bwd(cfg_key, res, ct):
    import os
    params, xc = res
    cfg = dict(cfg_key)
    if os.environ.get("FMOV_FUSED_COLOR_BWD", "1") == "0":
        _, vjp = jax.vjp(
            lambda p, x: apply_from_concat(p, cfg, x), params, xc)
        return vjp(ct)
    n_lin = cfg["n_layers"] + 1
    (ws, bs), mat_vjp = jax.vjp(lambda p: _materialize(p, n_lin), params)
    xcbar, dws, dbs = _color_bwd_impl(ws, bs, xc, ct, n_lin)
    (pbar,) = mat_vjp((dws, [db[None, :] for db in dbs]))
    return pbar, xcbar


_color_op.defvjp(_color_fwd, _color_bwd)


def color_fused(params, cfg, xc):
    """Fused IDR color net on the prebuilt concat input [N, 289]."""
    return _color_op(params, _cfg_key(cfg), xc)


# ------------------------------------------------------------------
# Feature-first input layout.
#
# The standard xc order [pts(3) | view_pe(27) | normals(3) | feat(256)]
# forces the concat to materialize from 3/27-wide pieces (42x lane
# padding at the pallas boundary; measured ~24 ms of the ~43 ms color
# fwd+bwd at 1M points).  Reordering to [feat(256) | small(33)] makes
# the big piece a lane-aligned copy and the 33-wide tail ONE selection
# matmul + sin/cos select (see assemble_featfirst) — measured ~8 ms
# faster end-to-end.  The first layer's weights are column-permuted to
# match; weight-norm is invariant (the norm runs over the full input
# axis), and autodiff un-permutes the cotangent through the concat.
# ------------------------------------------------------------------


def _ff_tables_np(multires_view: int, d_small: int):
    """[9 -> d_small] selection/frequency/kind tables for
    [pts | PE(dirs) | normals]."""
    import numpy as _np
    G = _np.zeros((9, d_small), _np.float32)
    freq = _np.ones((1, d_small), _np.float32)
    kind = _np.zeros((1, d_small), _np.float32)  # 0 id, 1 sin, 2 cos
    for j in range(3):
        G[j, j] = 1.0
    c = 3
    for j in range(3):          # identity part of the view PE
        G[3 + j, c] = 1.0
        c += 1
    for i in range(multires_view):
        f = 2.0 ** i
        for j in range(3):
            G[3 + j, c] = 1.0
            freq[0, c] = f
            kind[0, c] = 1.0
            c += 1
        for j in range(3):
            G[3 + j, c] = 1.0
            freq[0, c] = f
            kind[0, c] = 2.0
            c += 1
    for j in range(3):
        G[6 + j, c] = 1.0
        c += 1
    assert c == d_small, (c, d_small)
    return G, freq, kind


def assemble_featfirst(cfg, pts, dirs, normals, feature):
    """Build the feature-first color input [N, d_feat + 33] with one
    selection matmul instead of narrow-piece concats."""
    L = cfg["multires_view"]
    d_small = 9 + 6 * L
    G, f, kind = (jnp.asarray(t) for t in _ff_tables_np(L, d_small))
    u = jnp.concatenate([pts, dirs, normals], axis=-1)
    R = jnp.dot(u, G, precision=jax.lax.Precision.HIGHEST)
    Rf = R * f
    small = jnp.where(kind == 0, R,
                      jnp.where(kind == 1, jnp.sin(Rf), jnp.cos(Rf)))
    return jnp.concatenate([feature, small], axis=-1)


def permute_params_featfirst(params, cfg):
    """Column-permute lin0 to the feature-first input order.

    Differentiable (plain concat): grads flow back to the original
    layout.  Weight-norm g/norm are invariant under input permutation."""
    d_small = 9 + 6 * cfg["multires_view"]
    lin0 = params["layers"]["lin0"]
    key = "v" if "v" in lin0 else "w"
    m = lin0[key]  # [out, d_in_total], columns in standard xc order
    m2 = jnp.concatenate([m[:, d_small:], m[:, :d_small]], axis=1)
    layers = dict(params["layers"])
    layers["lin0"] = dict(lin0, **{key: m2})
    return dict(params, layers=layers)


def color_fused_featfirst(params, cfg, pts, dirs, normals, feature):
    """color_fused on the feature-first layout (same math as the
    standard-order concat up to bf16 partial-sum order)."""
    xc2 = assemble_featfirst(cfg, pts, dirs, normals, feature)
    p2 = permute_params_featfirst(params, cfg)
    return _color_op(p2, _cfg_key(cfg), xc2)


# ------------------------------------------------------------------
# Ray-level composited kernel (round 3).
#
# The featfirst wrapper still pays ~22 ms of HBM boundary traffic at 1M
# samples (glue_probe.py: kernel 18.1 ms, +15.5 ms assembly/permute/vjp
# glue, +6.9 ms [B,N,3] compositing): the [M,289] concat and its [M,289]
# cotangent each materialize 384-lane-padded (1.5 GB), the [M,3] color
# output pads 42x, and the composite runs on [B,N,3] (minor dim 3).
# This variant moves ALL of it in-kernel:
#   inputs  sdf_out [M,257] (feature sliced in-kernel -> no [M,256]
#           copy), u [M,9] = [pts|dirs|normals] (PE tail built in-kernel
#           from the same selection matmul), weights [B,N]
#   outputs color [B,3] (composited over each ray's N samples in VMEM)
# backward recomputes forward in-kernel and emits d_weights [B,N],
# ubar [M,9], featbar [M,257] (col 0 zero) + accumulated dws/dbs.
# Requires TILE % n_samples == 0 (each tile holds whole rays) and no
# NeRF++ background mixing (render_core gates on background_alpha=None).
# ------------------------------------------------------------------


def _materialize_ff(params, cfg, n_lin):
    """Dense weights with lin0 rows permuted to [feat | small] order.
    Row-permutation commutes with weight-norm (norm is over the full
    input axis), so this equals permute_params_featfirst + _materialize."""
    ws, bs = _materialize(params, n_lin)
    d_small = 9 + 6 * cfg["multires_view"]
    ws = list(ws)
    ws[0] = jnp.concatenate([ws[0][d_small:], ws[0][:d_small]], axis=0)
    return ws, bs


def _make_ray_fwd_kernel(n_lin, n_samples, d_feat):
    hp = jax.lax.Precision.HIGHEST

    def kernel(*refs):
        sdf_ref, u_ref, w_ref, g_ref, f_ref, k_ref = refs[:6]
        ws = [refs[6 + i][:] for i in range(n_lin)]
        bs = [refs[6 + n_lin + i][:] for i in range(n_lin)]
        out_ref = refs[6 + 2 * n_lin]
        feat = sdf_ref[:, 1:1 + d_feat]
        # u arrives as (9, T) channel planes ([M, 9] pads 9 -> 128 lanes
        # in HBM); the selection matmul is exact one-hot picks read
        # through a transposed-lhs dot_general.  Value operand must stay
        # f32 (in-kernel jnp.dot defaults to bf16 -> 1e-3 PE drift).
        r = jax.lax.dot_general(u_ref[:], g_ref[:],
                                (((0,), (0,)), ((), ())), precision=hp)
        rf = r * f_ref[:]
        kind = k_ref[:]
        small = jnp.where(kind == 0.0, r,
                          jnp.where(kind == 1.0, jnp.sin(rf), jnp.cos(rf)))
        h = jnp.concatenate([feat, small], axis=-1)
        for l in range(n_lin):
            h = _dot(h, ws[l]) + bs[l]
            if l < n_lin - 1:
                h = jnp.maximum(h, 0.0)
        c = jax.nn.sigmoid(h)                       # (TILE, 3)
        rays = c.shape[0] // n_samples
        c3 = c.reshape(rays, n_samples, 3)
        out_ref[:] = jnp.sum(c3 * w_ref[:][:, :, None], axis=1)

    return kernel


def _make_ray_bwd_kernel(n_lin, n_samples, d_feat):
    hp = jax.lax.Precision.HIGHEST

    def kernel(*refs):
        sdf_ref, u_ref, w_ref, ct_ref, g_ref, f_ref, k_ref = refs[:7]
        ws = [refs[7 + i][:] for i in range(n_lin)]
        bs = [refs[7 + n_lin + i][:] for i in range(n_lin)]
        wts = [refs[7 + 2 * n_lin + i][:] for i in range(n_lin)]
        featbar_ref = refs[7 + 3 * n_lin]
        ubar_ref = refs[8 + 3 * n_lin]
        dw_ref = refs[9 + 3 * n_lin]
        dws = [refs[10 + 3 * n_lin + i] for i in range(n_lin)]
        dbs = [refs[10 + 4 * n_lin + i] for i in range(n_lin)]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for l in range(n_lin):
                dws[l][:] = jnp.zeros_like(dws[l])
                dbs[l][:] = jnp.zeros_like(dbs[l])

        feat = sdf_ref[:, 1:1 + d_feat]
        # u as (9, T) planes, as in the forward kernel
        r = jax.lax.dot_general(u_ref[:], g_ref[:],
                                (((0,), (0,)), ((), ())), precision=hp)
        rf = r * f_ref[:]
        kind = k_ref[:]
        small = jnp.where(kind == 0.0, r,
                          jnp.where(kind == 1.0, jnp.sin(rf), jnp.cos(rf)))
        xc = jnp.concatenate([feat, small], axis=-1)
        acts = [xc]
        h = xc
        for l in range(n_lin):
            h = _dot(h, ws[l]) + bs[l]
            if l < n_lin - 1:
                h = jnp.maximum(h, 0.0)
                acts.append(h)
        c = jax.nn.sigmoid(h)                        # (TILE, 3)
        rays = c.shape[0] // n_samples
        c3 = c.reshape(rays, n_samples, 3)
        w = w_ref[:]
        ct = ct_ref[:]                               # (rays, 3)
        dw_ref[:] = jnp.sum(c3 * ct[:, None, :], axis=2)
        cbar = (ct[:, None, :] * w[:, :, None]).reshape(-1, 3)
        zbar = cbar * c * (1.0 - c)
        for l in range(n_lin - 1, -1, -1):
            dws[l][:] += _dot_acc(acts[l], zbar)
            dbs[l][:] += jnp.sum(zbar, axis=0, keepdims=True)
            ibar = _dot(zbar, wts[l])
            if l > 0:
                zbar = ibar * (acts[l] > 0.0).astype(jnp.float32)
        featbar = ibar[:, :d_feat]
        featbar_ref[:] = jnp.concatenate(
            [jnp.zeros_like(featbar[:, :1]), featbar], axis=-1)
        smallbar = ibar[:, d_feat:]
        dsel = jnp.where(kind == 0.0, jnp.ones_like(rf),
                         jnp.where(kind == 1.0, jnp.cos(rf) * f_ref[:],
                                   -jnp.sin(rf) * f_ref[:]))
        # ubar written as (9, T) planes: operand-swapped (sb*dsel) @ G^T
        ubar_ref[:] = jax.lax.dot_general(
            g_ref[:], smallbar * dsel, (((1,), (1,)), ((), ())),
            precision=hp)

    return kernel


def _ray_cfg_key(cfg, n_samples, d_sdf):
    return (("n_layers", cfg["n_layers"]),
            ("multires_view", cfg["multires_view"]),
            ("n_samples", n_samples), ("d_sdf", d_sdf))


def supported_ray(cfg, n_samples: int) -> bool:
    return supported(cfg) and TILE % n_samples == 0


def _pad_rows(x, rows):
    pad = rows - x.shape[0]
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x


def _pad_cols(x, cols):
    """Pad a channel-plane [C, M] array along M."""
    pad = cols - x.shape[1]
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((x.shape[0], pad), x.dtype)], 1)
    return x


@partial(jax.jit, static_argnames=("ck",))
def _ray_fwd_impl(ws, bs, sdf_out, u, weights, ck):
    cfg = dict(ck)
    n_lin = cfg["n_layers"] + 1
    N = cfg["n_samples"]
    d_sdf = cfg["d_sdf"]
    d_feat = d_sdf - 1
    M, B = sdf_out.shape[0], weights.shape[0]
    M_pad = M + ((-M) % TILE)
    B_pad = M_pad // N
    rays_per_tile = TILE // N
    sdf_p = _pad_rows(sdf_out, M_pad)
    u_p = _pad_cols(u, M_pad)                 # u: [9, M] channel planes
    w_p = _pad_rows(weights, B_pad)
    G, f, kind = (jnp.asarray(t)
                  for t in _ff_tables_np(cfg["multires_view"],
                                         9 + 6 * cfg["multires_view"]))
    grid = M_pad // TILE
    tile_specs = [
        pl.BlockSpec((TILE, d_sdf), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, N), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        _make_ray_fwd_kernel(n_lin, N, d_feat),
        grid=(grid,),
        in_specs=tile_specs + _w_specs([G, f, kind]) + _w_specs(ws)
        + _w_specs(bs),
        out_specs=pl.BlockSpec((rays_per_tile, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, 3), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(sdf_p, u_p, w_p, G, f, kind, *ws, *bs)
    return out[:B]


@partial(jax.jit, static_argnames=("ck",))
def _ray_bwd_impl(ws, bs, sdf_out, u, weights, ct, ck):
    cfg = dict(ck)
    n_lin = cfg["n_layers"] + 1
    N = cfg["n_samples"]
    d_sdf = cfg["d_sdf"]
    d_feat = d_sdf - 1
    M, B = sdf_out.shape[0], weights.shape[0]
    M_pad = M + ((-M) % TILE)
    B_pad = M_pad // N
    rays_per_tile = TILE // N
    sdf_p = _pad_rows(sdf_out, M_pad)
    u_p = _pad_cols(u, M_pad)                 # u: [9, M] channel planes
    w_p = _pad_rows(weights, B_pad)
    ct_p = _pad_rows(ct, B_pad)
    G, f, kind = (jnp.asarray(t)
                  for t in _ff_tables_np(cfg["multires_view"],
                                         9 + 6 * cfg["multires_view"]))
    grid = M_pad // TILE
    wts = [w.T for w in ws]
    in_specs = [
        pl.BlockSpec((TILE, d_sdf), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, N), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, 3), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + _w_specs([G, f, kind]) + _w_specs(ws) + _w_specs(bs) + _w_specs(wts)
    out_specs = (
        [pl.BlockSpec((TILE, d_sdf), lambda i: (i, 0),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((9, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
         pl.BlockSpec((rays_per_tile, N), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)]
        + _w_specs(ws) + _w_specs(bs))
    out_shapes = (
        [jax.ShapeDtypeStruct((M_pad, d_sdf), jnp.float32),
         jax.ShapeDtypeStruct((9, M_pad), jnp.float32),
         jax.ShapeDtypeStruct((B_pad, N), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs])
    outs = pl.pallas_call(
        _make_ray_bwd_kernel(n_lin, N, d_feat),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(sdf_p, u_p, w_p, ct_p, G, f, kind, *ws, *bs, *wts)
    featbar = outs[0][:M]
    ubar = outs[1][:, :M]
    dwgt = outs[2][:B]
    dws = list(outs[3:3 + n_lin])
    dbs = [b[0] for b in outs[3 + n_lin:]]
    return featbar, ubar, dwgt, dws, dbs


def ray_reference(params, cfg, sdf_out, u, weights):
    """Pure-JAX oracle with identical math (feature-first concat,
    selection-matmul PE tail, per-ray composite).  u is [9, M] planes."""
    feat = sdf_out[:, 1:]
    small_in = assemble_featfirst(
        cfg, u[0:3].T, u[3:6].T, u[6:9].T, feat)
    p2 = permute_params_featfirst(params, cfg)
    c = apply_from_concat(p2, cfg, small_in)
    B, N = weights.shape
    return (c.reshape(B, N, 3) * weights[:, :, None]).sum(axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _ray_op(params, ck, sdf_out, u, weights):
    cfg = dict(ck)
    ws, bs = _materialize_ff(params, cfg, cfg["n_layers"] + 1)
    return _ray_fwd_impl(ws, bs, sdf_out, u, weights, ck)


def _ray_fwd(params, ck, sdf_out, u, weights):
    return _ray_op(params, ck, sdf_out, u, weights), (params, sdf_out, u,
                                                      weights)


def _ray_bwd(ck, res, ct):
    params, sdf_out, u, weights = res
    cfg = dict(ck)
    if os.environ.get("FMOV_FUSED_COLOR_BWD", "1") == "0":
        _, vjp = jax.vjp(
            lambda p, s, uu, w: ray_reference(p, cfg, s, uu, w),
            params, sdf_out, u, weights)
        return vjp(ct)
    n_lin = cfg["n_layers"] + 1
    (ws, bs), mat_vjp = jax.vjp(
        lambda p: _materialize_ff(p, cfg, n_lin), params)
    featbar, ubar, dwgt, dws, dbs = _ray_bwd_impl(
        ws, bs, sdf_out, u, weights, ct, ck)
    (pbar,) = mat_vjp((dws, [db[None, :] for db in dbs]))
    return pbar, featbar, ubar, dwgt


_ray_op.defvjp(_ray_fwd, _ray_bwd)


def color_fused_ray(params, cfg, sdf_out, u, weights):
    """Composited fused color: sdf_out [M, 1+d_feat] (raw fused-SDF
    output), u [9, M] CHANNEL PLANES = [pts|dirs|normals] rows, weights
    [B, N] (M = B*N).  The planes layout keeps the 9-wide geometry out
    of 128-lane padded HBM tiles (~14x traffic).  Returns color [B, 3].
    Gradients flow to params, sdf_out (feature columns), u, and
    weights."""
    B, N = weights.shape
    ck = _ray_cfg_key(cfg, N, sdf_out.shape[1])
    return _ray_op(params, ck, sdf_out, u, weights)
