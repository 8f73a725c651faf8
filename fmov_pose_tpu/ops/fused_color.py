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
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _dot_acc(a, b):
    """a^T @ b with f32 accumulation (weight-cotangent accumulation)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


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
#   inputs  feat [M,256] lane-ALIGNED (f32 or bf16, straight from the
#           rays SDF kernel), u [M,9] = [pts|dirs|normals] (PE tail
#           built in-kernel from the same selection matmul),
#           weights [B,N]; lin0 pre-split host-side (w0a/w0b) so the
#           [T,289] concat never materializes
#   outputs color [B,3] (composited over each ray's N samples in VMEM)
# backward recomputes forward in-kernel and emits d_weights [B,N],
# ubar [M,9], featbar [M,256] aligned (feat's dtype) + accumulated
# dws/dbs (lin0 as dw0a+dw0b, host re-concats).
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


def _build_u(o_ref, d_ref, z_ref, g3_ref, n_samples, hp):
    """u [T, 9] = [pts | dirs | normals] from per-ray geometry + grad
    planes, in-kernel (the [M, 9] array this replaces pads 9 -> 128
    lanes in HBM: 512 MB at 1M samples)."""
    from fmov_pose_tpu.ops.fused_sdf import (
        _ray_onehots, _flat_from_ray, _build_xs)
    T = n_samples * z_ref.shape[0]
    O, Smask = _ray_onehots(T, n_samples)
    pts, d_t, z_flat = _build_xs(o_ref, d_ref, z_ref, O, Smask, hp)
    normals = jnp.concatenate(
        [_flat_from_ray(O, Smask, g3_ref[c], hp) for c in range(3)],
        axis=-1)
    return jnp.concatenate([pts, d_t, normals], axis=-1), \
        (O, Smask, d_t, z_flat)


def _make_ray_fwd_kernel(n_lin, n_samples):
    hp = jax.lax.Precision.HIGHEST

    def kernel(*refs):
        # feat arrives lane-ALIGNED [T, 256] (sliced off the raw
        # [T, 257] sdf output it used to be: the 1-lane offset forced a
        # full-tile lane rotation and the 257-wide f32 DMA padded to 384
        # lanes), lin0 is pre-split host-side into w0a [256, 256] /
        # w0b [d_small, 256] so the [T, 289] concat never materializes,
        # and the geometry arrives per-ray (pts/dirs/normals built
        # in-kernel from o/d/z + g3 planes: no 42x-padded [M, 9] DMA).
        feat_ref, o_ref, d_ref, z_ref, g3_ref, w_ref = refs[:6]
        g_ref, f_ref, k_ref = refs[6], refs[7], refs[8]
        w0a = refs[9][:]
        w0b = refs[10][:]
        ws = [refs[11 + i][:] for i in range(n_lin - 1)]
        bs = [refs[10 + n_lin + i][:] for i in range(n_lin)]
        out_ref = refs[10 + 2 * n_lin]
        u, _ = _build_u(o_ref, d_ref, z_ref, g3_ref, n_samples, hp)
        # selection matmul is exact one-hot picks; value operand must stay
        # f32 (in-kernel jnp.dot defaults to bf16 -> 1e-3 PE drift)
        r = jnp.dot(u, g_ref[:], precision=hp)
        rf = r * f_ref[:]
        kind = k_ref[:]
        small = jnp.where(kind == 0.0, r,
                          jnp.where(kind == 1.0, jnp.sin(rf), jnp.cos(rf)))
        h = _dot(feat_ref[:], w0a) + _dot(small, w0b) + bs[0]
        for l in range(1, n_lin):
            h = jnp.maximum(h, 0.0)
            h = _dot(h, ws[l - 1]) + bs[l]
        c = jax.nn.sigmoid(h)                       # (TILE, 3)
        rays = c.shape[0] // n_samples
        c3 = c.reshape(rays, n_samples, 3)
        out_ref[:] = jnp.sum(c3 * w_ref[:][:, :, None], axis=1)

    return kernel


def _make_ray_bwd_kernel(n_lin, n_samples, feat_dtype):
    hp = jax.lax.Precision.HIGHEST

    def kernel(*refs):
        # split-lin0 mirror of the fwd kernel: dws[0] leaves as
        # dw0a [256, 256] + dw0b [d_small, 256] (host re-concats), the
        # feature cotangent leaves ALIGNED [T, 256] (no zero-column
        # prepend, no lane-offset store), and the geometry cotangent
        # leaves as per-ray reductions through pts = o + d*z
        # (obar/dbar [R, 3], zbar [R, N], g3bar planes [3, R, N])
        feat_ref, o_ref, d_ref, z_ref, g3_ref, w_ref, ct_ref = refs[:7]
        g_ref, f_ref, k_ref = refs[7], refs[8], refs[9]
        w0a = refs[10][:]
        w0b = refs[11][:]
        ws = [refs[12 + i][:] for i in range(n_lin - 1)]
        bs = [refs[11 + n_lin + i][:] for i in range(n_lin)]
        w0at = refs[11 + 2 * n_lin][:]
        w0bt = refs[12 + 2 * n_lin][:]
        wts = [refs[13 + 2 * n_lin + i][:] for i in range(n_lin - 1)]
        featbar_ref = refs[12 + 3 * n_lin]
        obar_ref = refs[13 + 3 * n_lin]
        dbar_ref = refs[14 + 3 * n_lin]
        zraybar_ref = refs[15 + 3 * n_lin]
        g3bar_ref = refs[16 + 3 * n_lin]
        dw_ref = refs[17 + 3 * n_lin]
        dw0a_ref = refs[18 + 3 * n_lin]
        dw0b_ref = refs[19 + 3 * n_lin]
        dws = [refs[20 + 3 * n_lin + i] for i in range(n_lin - 1)]
        dbs = [refs[19 + 4 * n_lin + i] for i in range(n_lin)]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dw0a_ref[:] = jnp.zeros_like(dw0a_ref)
            dw0b_ref[:] = jnp.zeros_like(dw0b_ref)
            for l in range(n_lin - 1):
                dws[l][:] = jnp.zeros_like(dws[l])
            for l in range(n_lin):
                dbs[l][:] = jnp.zeros_like(dbs[l])

        feat = feat_ref[:]
        u, (O, Smask, d_t, z_flat) = _build_u(
            o_ref, d_ref, z_ref, g3_ref, n_samples, hp)
        r = jnp.dot(u, g_ref[:], precision=hp)
        rf = r * f_ref[:]
        kind = k_ref[:]
        small = jnp.where(kind == 0.0, r,
                          jnp.where(kind == 1.0, jnp.sin(rf), jnp.cos(rf)))
        h = _dot(feat, w0a) + _dot(small, w0b) + bs[0]
        acts = []
        for l in range(1, n_lin):
            h = jnp.maximum(h, 0.0)
            acts.append(h)
            h = _dot(h, ws[l - 1]) + bs[l]
        c = jax.nn.sigmoid(h)                        # (TILE, 3)
        rays = c.shape[0] // n_samples
        c3 = c.reshape(rays, n_samples, 3)
        w = w_ref[:]
        ct = ct_ref[:]                               # (rays, 3)
        dw_ref[:] = jnp.sum(c3 * ct[:, None, :], axis=2)
        cbar = (ct[:, None, :] * w[:, :, None]).reshape(-1, 3)
        zbar = cbar * c * (1.0 - c)
        for l in range(n_lin - 1, 0, -1):
            dws[l - 1][:] += _dot_acc(acts[l - 1], zbar)
            dbs[l][:] += jnp.sum(zbar, axis=0, keepdims=True)
            ibar = _dot(zbar, wts[l - 1])
            zbar = ibar * (acts[l - 1] > 0.0).astype(jnp.float32)
        dw0a_ref[:] += _dot_acc(feat, zbar)
        dw0b_ref[:] += _dot_acc(small, zbar)
        dbs[0][:] += jnp.sum(zbar, axis=0, keepdims=True)
        featbar_ref[:] = _dot(zbar, w0at).astype(feat_dtype)
        smallbar = _dot(zbar, w0bt)
        dsel = jnp.where(kind == 0.0, jnp.ones_like(rf),
                         jnp.where(kind == 1.0, jnp.cos(rf) * f_ref[:],
                                   -jnp.sin(rf) * f_ref[:]))
        ubar = jnp.dot(smallbar * dsel, g_ref[:].T, precision=hp)
        # split and reduce per-ray through pts = o + d*z
        from fmov_pose_tpu.ops.fused_sdf import _ray_from_flat
        ptsbar = ubar[:, 0:3]
        dirsbar = ubar[:, 3:6]
        obar_ref[:] = jax.lax.dot_general(
            O, ptsbar, (((0,), (0,)), ((), ())),
            precision=hp, preferred_element_type=jnp.float32)
        dbar_ref[:] = jax.lax.dot_general(
            O, ptsbar * z_flat + dirsbar, (((0,), (0,)), ((), ())),
            precision=hp, preferred_element_type=jnp.float32)
        s = jnp.sum(ptsbar * d_t, axis=1, keepdims=True)
        zraybar_ref[:] = _ray_from_flat(O, Smask, s, hp)
        for c_i in range(3):
            g3bar_ref[c_i] = _ray_from_flat(
                O, Smask, ubar[:, 6 + c_i:7 + c_i], hp)

    return kernel


def _ray_cfg_key(cfg, n_samples, d_feat):
    return (("n_layers", cfg["n_layers"]),
            ("multires_view", cfg["multires_view"]),
            ("n_samples", n_samples), ("d_feat", d_feat))


def supported_ray(cfg, n_samples: int) -> bool:
    return supported(cfg) and TILE % n_samples == 0


def _pad_rows(x, rows):
    pad = rows - x.shape[0]
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x


def _split_lin0(ws, d_feat):
    """lin0 [d_feat + d_small, 256] -> (w0a [d_feat, 256], w0b)."""
    return ws[0][:d_feat], ws[0][d_feat:]


def _pad_ray_inputs(feat, o, d, z, g3, weights, rays_per_tile, N):
    B = weights.shape[0]
    b_pad = B + ((-B) % rays_per_tile)
    m_pad = b_pad * N
    feat = _pad_rows(feat, m_pad)
    o = _pad_rows(o, b_pad)
    d = _pad_rows(d, b_pad)
    z = _pad_rows(z, b_pad)
    w = _pad_rows(weights, b_pad)
    if g3.shape[1] != b_pad:
        g3 = jnp.concatenate(
            [g3, jnp.zeros((3, b_pad - g3.shape[1], N), g3.dtype)], 1)
    return feat, o, d, z, g3, w, b_pad, m_pad


@partial(jax.jit, static_argnames=("ck",))
def _ray_fwd_impl(ws, bs, feat, o, d, z, g3, weights, ck):
    cfg = dict(ck)
    n_lin = cfg["n_layers"] + 1
    N = cfg["n_samples"]
    d_feat = cfg["d_feat"]
    B = weights.shape[0]
    rays_per_tile = TILE // N
    feat_p, o_p, d_p, z_p, g3_p, w_p, b_pad, m_pad = _pad_ray_inputs(
        feat, o, d, z, g3, weights, rays_per_tile, N)
    G, f, kind = (jnp.asarray(t)
                  for t in _ff_tables_np(cfg["multires_view"],
                                         9 + 6 * cfg["multires_view"]))
    grid = m_pad // TILE
    w0a, w0b = _split_lin0(ws, d_feat)
    ray3_spec = pl.BlockSpec((rays_per_tile, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    rayn_spec = pl.BlockSpec((rays_per_tile, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    g3_spec = pl.BlockSpec((3, rays_per_tile, N), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    tile_specs = [
        pl.BlockSpec((TILE, d_feat), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        ray3_spec, ray3_spec, rayn_spec, g3_spec, rayn_spec,
    ]
    out = pl.pallas_call(
        _make_ray_fwd_kernel(n_lin, N),
        grid=(grid,),
        in_specs=tile_specs + _w_specs([G, f, kind])
        + _w_specs([w0a, w0b]) + _w_specs(ws[1:]) + _w_specs(bs),
        out_specs=ray3_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, 3), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(feat_p, o_p, d_p, z_p, g3_p, w_p, G, f, kind, w0a, w0b,
      *ws[1:], *bs)
    return out[:B]


@partial(jax.jit, static_argnames=("ck",))
def _ray_bwd_impl(ws, bs, feat, o, d, z, g3, weights, ct, ck):
    cfg = dict(ck)
    n_lin = cfg["n_layers"] + 1
    N = cfg["n_samples"]
    d_feat = cfg["d_feat"]
    M, B = feat.shape[0], weights.shape[0]
    rays_per_tile = TILE // N
    feat_p, o_p, d_p, z_p, g3_p, w_p, b_pad, m_pad = _pad_ray_inputs(
        feat, o, d, z, g3, weights, rays_per_tile, N)
    ct_p = _pad_rows(ct, b_pad)
    G, f, kind = (jnp.asarray(t)
                  for t in _ff_tables_np(cfg["multires_view"],
                                         9 + 6 * cfg["multires_view"]))
    grid = m_pad // TILE
    w0a, w0b = _split_lin0(ws, d_feat)
    wts = [w.T for w in ws[1:]]
    ray3_spec = pl.BlockSpec((rays_per_tile, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    rayn_spec = pl.BlockSpec((rays_per_tile, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    g3_spec = pl.BlockSpec((3, rays_per_tile, N), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((TILE, d_feat), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        ray3_spec, ray3_spec, rayn_spec, g3_spec, rayn_spec, ray3_spec,
    ] + _w_specs([G, f, kind]) + _w_specs([w0a, w0b]) + _w_specs(ws[1:]) \
        + _w_specs(bs) + _w_specs([w0a.T, w0b.T]) + _w_specs(wts)
    out_specs = (
        [pl.BlockSpec((TILE, d_feat), lambda i: (i, 0),
                      memory_space=pltpu.VMEM),
         ray3_spec, ray3_spec, rayn_spec, g3_spec, rayn_spec]
        + _w_specs([w0a, w0b]) + _w_specs(ws[1:]) + _w_specs(bs))
    out_shapes = (
        [jax.ShapeDtypeStruct((m_pad, d_feat), feat.dtype),
         jax.ShapeDtypeStruct((b_pad, 3), jnp.float32),
         jax.ShapeDtypeStruct((b_pad, 3), jnp.float32),
         jax.ShapeDtypeStruct((b_pad, N), jnp.float32),
         jax.ShapeDtypeStruct((3, b_pad, N), jnp.float32),
         jax.ShapeDtypeStruct((b_pad, N), jnp.float32)]
        + [jax.ShapeDtypeStruct(w0a.shape, jnp.float32),
           jax.ShapeDtypeStruct(w0b.shape, jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws[1:]]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs])
    outs = pl.pallas_call(
        _make_ray_bwd_kernel(n_lin, N, feat.dtype),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(feat_p, o_p, d_p, z_p, g3_p, w_p, ct_p, G, f, kind, w0a, w0b,
      *ws[1:], *bs, w0a.T, w0b.T, *wts)
    featbar = outs[0][:M]
    obar, dbar, zbar = outs[1][:B], outs[2][:B], outs[3][:B]
    g3bar = outs[4][:, :B]
    dwgt = outs[5][:B]
    dw0 = jnp.concatenate([outs[6], outs[7]], axis=0)
    dws = [dw0] + list(outs[8:7 + n_lin])
    dbs = [b[0] for b in outs[7 + n_lin:]]
    return featbar, obar, dbar, zbar, g3bar, dwgt, dws, dbs


def ray_reference(params, cfg, feat, o, d, z, g3, weights):
    """Pure-JAX oracle with identical math (feature-first concat,
    selection-matmul PE tail, per-ray composite, pts = o + d*z)."""
    B, N = weights.shape
    pts = (o[:, None, :] + d[:, None, :] * z[..., None]).reshape(-1, 3)
    dirs = jnp.broadcast_to(d[:, None, :], (B, N, 3)).reshape(-1, 3)
    normals = jnp.moveaxis(g3, 0, -1).reshape(-1, 3)
    small_in = assemble_featfirst(
        cfg, pts, dirs, normals, feat.astype(jnp.float32))
    p2 = permute_params_featfirst(params, cfg)
    c = apply_from_concat(p2, cfg, small_in)
    return (c.reshape(B, N, 3) * weights[:, :, None]).sum(axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _ray_op(params, ck, feat, o, d, z, g3, weights):
    cfg = dict(ck)
    ws, bs = _materialize_ff(params, cfg, cfg["n_layers"] + 1)
    return _ray_fwd_impl(ws, bs, feat, o, d, z, g3, weights, ck)


def _ray_fwd(params, ck, feat, o, d, z, g3, weights):
    return (_ray_op(params, ck, feat, o, d, z, g3, weights),
            (params, feat, o, d, z, g3, weights))


def _ray_bwd(ck, res, ct):
    params, feat, o, d, z, g3, weights = res
    cfg = dict(ck)
    if os.environ.get("FMOV_FUSED_COLOR_BWD", "1") == "0":
        _, vjp = jax.vjp(
            lambda p, s, oo, dd, zz, gg, w: ray_reference(
                p, cfg, s, oo, dd, zz, gg, w),
            params, feat, o, d, z, g3, weights)
        return vjp(ct)
    n_lin = cfg["n_layers"] + 1
    (ws, bs), mat_vjp = jax.vjp(
        lambda p: _materialize_ff(p, cfg, n_lin), params)
    featbar, obar, dbar, zbar, g3bar, dwgt, dws, dbs = _ray_bwd_impl(
        ws, bs, feat, o, d, z, g3, weights, ct, ck)
    (pbar,) = mat_vjp((dws, [db[None, :] for db in dbs]))
    return pbar, featbar, obar, dbar, zbar, g3bar, dwgt


_ray_op.defvjp(_ray_fwd, _ray_bwd)


def color_fused_ray(params, cfg, feat, rays_o, rays_d, z_mid, g3,
                    weights):
    """Composited fused color from per-ray geometry: feat [B*N, d_feat]
    (ALIGNED fused-SDF feature, f32 or bf16), rays_o/rays_d [B, 3],
    z_mid [B, N], g3 [3, B, N] gradient planes, weights [B, N].
    pts/dirs/normals are built IN-KERNEL (no 42x-padded [M, 9] u array
    crosses HBM).  Returns color [B, 3].  Gradients flow to params,
    feat (in feat's dtype), rays_o, rays_d, z_mid, g3 and weights."""
    B, N = weights.shape
    ck = _ray_cfg_key(cfg, N, feat.shape[1])
    return _ray_op(params, ck, feat, rays_o, rays_d, z_mid, g3, weights)
