"""Pallas-fused SDF field evaluation (TPU kernel).

The SDF MLP is tiny (8x256) so the XLA implementation is HBM-bound: every
inter-layer activation round-trips to HBM (measured ~44 TF/s-equivalent,
i.e. bandwidth- not FLOP-limited).  This kernel keeps the whole network
resident in VMEM — weights (~2.2 MB) plus one tile of activations — so the
only HBM traffic is the (pre-encoded) input points and the requested
outputs.

Positional encoding and its Jacobian-transpose stay OUTSIDE the kernel,
in MATMUL form (see the lane-friendly PE section below): the original
loop form — thirteen [N, 3] slice/concat pieces — materializes with 42x
lane padding at the pallas boundary and measured 2.3x slower end-to-end
(60 ms vs 26 ms fwd+grad at 1M points); the matmul form is one [3 -> D]
selection dot plus full-width selects, bitwise-identical values.

Entry points (all `jax.custom_vjp`: kernel primal, XLA-reference backward,
so differentiation through them is exactly the pure-JAX gradient):

* ``sdf_only_fused / sdf_apply_fused`` — the forward used by the
  gradient-free SDF-guided upsampling (`renderer.py:423-446`), grid/mesh
  evaluation, and eval renders.
* ``sdf_apply_grad_fused`` — forward + in-kernel reverse pass for
  d(sdf)/dx (single delta stream over VMEM-resident pre-activations).
"""

from __future__ import annotations

import functools
import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fmov_pose_tpu.fields import nets

TILE = int(os.environ.get("FMOV_KERNEL_TILE", "1024"))
# default 1024: measured best across the fused kernels at phase-2 scale
# (scripts/tile_sweep.py, v5e: 2nd-order 138.9 ms vs 143.4 @512 per 1M pts)
VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128 MB VMEM/core


def _interpret() -> bool:
    """Run pallas_calls in interpret mode (CPU tests / shard_map dry
    runs).  Read per-call so tests can toggle via monkeypatch.setenv."""
    return os.environ.get("FMOV_PALLAS_INTERPRET", "0") == "1"


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


def _act_pair(z):
    """softplus(100z)/100 and sigmoid(100z) from ONE exp (the kernels are
    transcendental-bound on the VPU otherwise)."""
    E = jnp.exp(-100.0 * jnp.abs(z))
    sp = jnp.maximum(z, 0.0) + jnp.log1p(E) * 0.01
    pos = z >= 0
    sig = jnp.where(pos, 1.0 / (1.0 + E), E / (1.0 + E))
    return sp, sig


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


def _pe_jvp(xs: jnp.ndarray, t: jnp.ndarray, multires: int):
    """Jacobian of the positional encoding applied to tangent t [N, 3]:
    returns [N, 3*(1+2L)] (the diagonal-per-dim structure of PE)."""
    cols = [t]
    for i in range(multires):
        f = 2.0 ** i
        cols.append(t * f * jnp.cos(xs * f))
        cols.append(-t * f * jnp.sin(xs * f))
    return jnp.concatenate(cols, axis=-1)


def _pe_second_term(xs, d_inputs, ct_grad, multires):
    """d/dxs of pe_vjp(xs, d_inputs) contracted with ct_grad [N, 3].

    pe_vjp = d0 + sum_i f (s_i cos(f xs) - c_i sin(f xs)); its xs-derivative
    is diagonal per dim: sum_i f^2 (-s_i sin - c_i cos)."""
    out = jnp.zeros_like(ct_grad)
    for i in range(multires):
        f = 2.0 ** i
        s_cols = d_inputs[:, 3 + 6 * i:6 + 6 * i]
        c_cols = d_inputs[:, 6 + 6 * i:9 + 6 * i]
        out = out + ct_grad * (f * f) * (
            -s_cols * jnp.sin(xs * f) - c_cols * jnp.cos(xs * f))
    return out


def _dot(a, b):
    """bf16 x bf16 -> f32 MXU dot (weights are cast once per tile)."""
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _dot_lastcol(inp, w_col):
    """[T, W] x [1, W] -> [T, 1] bf16 contraction with f32 accumulation.

    Written as an explicit bf16-round -> f32 multiply -> lane reduction:
    Mosaic rejects the equivalent narrow dot_general (its 1-wide-output
    multiply+reduce lowering emits a bf16->f32 `vector.broadcast` that
    fails MLIR verification on v5e, jax 0.9).  f32 products of
    bf16-rounded operands are exact (<=16 significand bits each), so this
    matches the MXU contraction up to f32 summation order.
    """
    a = inp.astype(jnp.bfloat16).astype(jnp.float32)
    b = w_col.astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.sum(a * b, axis=-1, keepdims=True)


# ------------------------------------------------------------------
# Lane-friendly (matmul-form) positional encoding.
#
# The loop-form helpers above assemble/consume the [N, 3(1+2L)] encoding
# through thirteen 3-wide slices.  Fused into a reduction XLA handles
# that fine, but feeding a pallas_call forces the concat to MATERIALIZE,
# and 3-wide minor dims pad 42x on TPU: the layout copies cost more than
# the whole MLP kernel (measured 60 ms vs 26 ms for the fwd+grad wrapper
# at 1M points on v5e).  The matmul form replaces every slice/concat
# with one [3 -> D] selection matmul plus a full-width select:
#     R  = xs @ G          (G one-hot: R_c = xs_{dim(c)}, exact in f32)
#     xe = select(kind, R, sin(R f), cos(R f))
# which is bitwise-identical to `positional_encode` (same sin/cos calls,
# single-nonzero dot rows).  Jacobian / second-derivative diagonals are
# full-width selects too, so pe_vjp / pe_jvp / the second-order term each
# become one elementwise pass and at most one [D -> 3] matmul.
# ------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _pe_tables_np(multires: int):
    D = 3 * (1 + 2 * multires)
    G = np.zeros((3, D), np.float32)
    freq = np.ones((1, D), np.float32)
    kind = np.zeros((1, D), np.int32)  # 0 = identity, 1 = sin, 2 = cos
    for j in range(3):
        G[j, j] = 1.0
    c = 3
    for i in range(multires):
        f = 2.0 ** i
        for j in range(3):
            G[j, c] = 1.0
            freq[0, c] = f
            kind[0, c] = 1
            c += 1
        for j in range(3):
            G[j, c] = 1.0
            freq[0, c] = f
            kind[0, c] = 2
            c += 1
    return G, freq, kind


def _pe_tables(multires: int):
    G, freq, kind = _pe_tables_np(multires)
    return jnp.asarray(G), jnp.asarray(freq), jnp.asarray(kind)


_HI = jax.lax.Precision.HIGHEST


def _pe_mm(xs: jnp.ndarray, multires: int) -> jnp.ndarray:
    """positional_encode(xs, multires), matmul form ([N, 3] -> [N, D])."""
    G, f, kind = _pe_tables(multires)
    R = jnp.dot(xs, G, precision=_HI)
    Rf = R * f
    return jnp.where(kind == 0, R,
                     jnp.where(kind == 1, jnp.sin(Rf), jnp.cos(Rf)))


def _pe_jac_diag(xs: jnp.ndarray, multires: int) -> jnp.ndarray:
    """d xe_c / d xs_{dim(c)} as a full-width [N, D] array."""
    G, f, kind = _pe_tables(multires)
    R = jnp.dot(xs, G, precision=_HI)
    Rf = R * f
    return jnp.where(kind == 0, jnp.ones_like(R),
                     jnp.where(kind == 1, f * jnp.cos(Rf),
                               -f * jnp.sin(Rf)))


def _pe_vjp_mm(xs, d_inputs, multires):
    """= _pe_vjp (Jacobian-transpose), matmul form."""
    G, _, _ = _pe_tables(multires)
    return jnp.dot(d_inputs * _pe_jac_diag(xs, multires), G.T, precision=_HI)


def _pe_jvp_mm(xs, t, multires):
    """= _pe_jvp (Jacobian applied to tangent t [N, 3]), matmul form."""
    G, _, _ = _pe_tables(multires)
    return jnp.dot(t, G, precision=_HI) * _pe_jac_diag(xs, multires)


def _pe_second_mm(xs, d_inputs, ct_grad, multires):
    """= _pe_second_term, matmul form: d/dxs of pe_vjp contracted with
    ct_grad [N, 3].  Second derivative diagonal: -f^2 sin / -f^2 cos."""
    G, f, kind = _pe_tables(multires)
    R = jnp.dot(xs, G, precision=_HI)
    Rf = R * f
    d2 = jnp.where(kind == 0, jnp.zeros_like(R),
                   jnp.where(kind == 1, -(f * f) * jnp.sin(Rf),
                             -(f * f) * jnp.cos(Rf)))
    ct_R = jnp.dot(ct_grad, G, precision=_HI)
    return jnp.dot(ct_R * d_inputs * d2, G.T, precision=_HI)


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


class _PETile:
    """In-kernel matmul-form PE on one (TILE, 3) block.

    Round 3: the PE and every derivative of it used to run in XLA around
    the pallas boundary — each pass streams [M, 39]-padded arrays through
    HBM (~4-5 ms apiece at 1M pts; trace_step.py select/pad fusions
    totalled ~30 ms/step).  In VMEM the selects are cheap, but the
    sin/cos pair must be computed ONCE and shared by the encoding, the
    Jacobian diagonal and the second-derivative diagonal."""

    def __init__(self, xs_s, g_ref, f_ref, k_ref):
        hp = jax.lax.Precision.HIGHEST
        self.f = f_ref[:]
        self.kind = k_ref[:]
        self.G = g_ref[:]
        self.R = jnp.dot(xs_s, self.G, precision=hp)
        Rf = self.R * self.f
        self.sin = jnp.sin(Rf)
        self.cos = jnp.cos(Rf)

    def xe(self):
        return jnp.where(self.kind == 0, self.R,
                         jnp.where(self.kind == 1, self.sin, self.cos))

    def jac(self):
        return jnp.where(self.kind == 0, jnp.ones_like(self.R),
                         jnp.where(self.kind == 1, self.f * self.cos,
                                   -self.f * self.sin))

    def d2(self):
        f2 = self.f * self.f
        return jnp.where(self.kind == 0, jnp.zeros_like(self.R),
                         jnp.where(self.kind == 1, -f2 * self.sin,
                                   -f2 * self.cos))


def _ray_onehots(tile, n_samples):
    """(O [tile, R], S [tile, N]) one-hots with O[t, t//N] = S[t, t%N] = 1.

    Mosaic cannot shape-cast across the lane dim ((R, N) <-> (tile, 1)),
    so the ray<->flat sdf layout changes run as exact one-hot
    contractions instead (f32 one-hot dots are exact)."""
    rays = tile // n_samples
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, rays), 0)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, rays), 1)
    O = (t_iota // n_samples == r_iota).astype(jnp.float32)
    t2 = jax.lax.broadcasted_iota(jnp.int32, (tile, n_samples), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (tile, n_samples), 1)
    S = (t2 % n_samples == j2).astype(jnp.float32)
    return O, S


def _make_fwd_kernel(cfg, n_lin, want_feature):
    def kernel(*refs):
        xs_ref = refs[0]
        g_ref, f_ref, k_ref = refs[1], refs[2], refs[3]
        ws = [refs[4 + i][:] for i in range(n_lin)]
        bs = [refs[4 + n_lin + i][:] for i in range(n_lin)]
        out_ref = refs[4 + 2 * n_lin]
        xs_s = xs_ref[:] * cfg.get("scale", 1.0)
        xe = _PETile(xs_s, g_ref, f_ref, k_ref).xe()
        out, _ = _forward_tile(xe, ws, bs, cfg)
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
        scale = cfg.get("scale", 1.0)
        # forward with shared-exp activations, caching the sigmoids
        h = inputs
        sigs = []
        for l in range(n_lin):
            inp = (jnp.concatenate([h, inputs], axis=-1) * inv_sqrt2
                   if l in skip_in else h)
            z = _dot(inp, ws[l]) + bs[l]
            if l < n_lin - 1:
                h, sig = _act_pair(z)
                sigs.append(sig)
            else:
                h = z
        out_ref[:] = jnp.concatenate([h[:, :1] / scale, h[:, 1:]], axis=-1)

        # reverse pass for the scalar sdf output (pre-/scale column 0)
        delta = jnp.broadcast_to(
            w_last_col, (inputs.shape[0], w_last_col.shape[1]))
        d_inputs = jnp.zeros_like(inputs)
        for l in range(n_lin - 2, -1, -1):
            delta = delta * sigs[l]
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


# ------------------------------------------------------------------
# fused second-order backward (reverse over the fwd+grad graph)
# ------------------------------------------------------------------
#
# Notation (skip at layer S, L linears, s = softplus(100.)/100):
#   forward:  i0 = xe;  inp_l = concat[i_l, xe]/sqrt2 if l==S else i_l
#             z_l = inp_l @ W_l + b_l;  i_{l+1} = s(z_l) (l<L-1);  y = z_{L-1}
#   grad chain (reverse for scalar y0):
#             d_{L-1} = W_{L-1}[:, 0]
#             for l = L-2..0: e_l = d_{l+1} * s'(z_l); f_l = e_l @ W_l^T
#                 if l==S: gpe += f_l[:, h:]/sqrt2; d_l = f_l[:, :h]/sqrt2
#                 else:    d_l = f_l
#             g = d_0 + gpe        (cotangent on xe)
# VJP of (y, g) wrt (W, b, xe) given (ybar, gbar):
#   Phase A (ascend l): reverse the grad chain.
#     dbar_0 = gbar; at l==S the gpe branch also receives gbar.
#     fbar = [dbar_l/sqrt2, gbar/sqrt2] at skip else dbar_l
#     ebar = fbar @ W_l;        Wbar_l += fbar^T e_l
#     dbar_{l+1} = ebar * s'(z_l)
#     zbar_chain_l = ebar * d_{l+1} * s''(z_l)      <- Hessian term
#     at l = L-1: Wbar_{L-1}[:, 0] += sum_N dbar_{L-1}
#   Phase B (descend l): reverse the forward chain with the zbar seeds.
#     zbar_{L-1} = ybar
#     Wbar_l += inp_l^T zbar_l;  bbar_l += sum zbar_l
#     inpbar = zbar_l @ W_l^T;  split at skip (xe part -> xebar)
#     zbar_{l-1} = ibar_l * s'(z_{l-1}) + zbar_chain_{l-1}
#     xebar += ibar_0
# s'(z) = sigmoid(100z); s''(z) = 100 s' (1 - s').


def _make_bwd_kernel_biased(cfg, n_lin):
    """Like _make_bwd_kernel but takes biases so z includes them."""
    skip_in = tuple(cfg.get("skip_in", (4,)))
    S = skip_in[0] if skip_in else -1
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    def kernel(*refs):
        xe_ref, ybar_ref, gbar_ref = refs[0], refs[1], refs[2]
        ws = [refs[3 + i][:] for i in range(n_lin)]
        bs = [refs[3 + n_lin + i][:] for i in range(n_lin)]
        wts = [refs[3 + 2 * n_lin + i][:] for i in range(n_lin)]
        xebar_ref = refs[3 + 3 * n_lin]
        dws = [refs[4 + 3 * n_lin + i] for i in range(n_lin)]
        dbs = [refs[4 + 4 * n_lin + i] for i in range(n_lin)]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for l in range(n_lin):
                dws[l][:] = jnp.zeros_like(dws[l])
                dbs[l][:] = jnp.zeros_like(dbs[l])

        xe = xe_ref[:]
        ybar = ybar_ref[:]
        gbar = gbar_ref[:]
        T = xe.shape[0]

        # forward, storing activations and sigmoids (one exp per layer)
        acts = []   # acts[l] = s(z_l), l < L-1
        sigs = []   # sigs[l] = s'(z_l)
        h = xe
        for l in range(n_lin):
            inp = (jnp.concatenate([h, xe], axis=-1) * inv_sqrt2
                   if l == S else h)
            z = _dot(inp, ws[l]) + bs[l]
            if l < n_lin - 1:
                h, sig = _act_pair(z)
                acts.append(h)
                sigs.append(sig)

        # primal gradient chain, storing d_l
        ds = [None] * n_lin
        ds[n_lin - 1] = jnp.broadcast_to(
            wts[n_lin - 1][0:1, :], (T, wts[n_lin - 1].shape[1]))
        for l in range(n_lin - 2, -1, -1):
            e = ds[l + 1] * sigs[l]
            f = _dot(e, wts[l])
            if l == S:
                ds[l] = f[:, :wts[l].shape[1] - xe.shape[1]] * inv_sqrt2
            else:
                ds[l] = f

        # Phase A: reverse the gradient chain (ascend l)
        zbar_chain = [None] * n_lin
        dbar = gbar
        for l in range(0, n_lin - 1):
            if l == S:
                fbar = jnp.concatenate(
                    [dbar * inv_sqrt2, gbar * inv_sqrt2], axis=-1)
            else:
                fbar = dbar
            sp = sigs[l]
            e = ds[l + 1] * sp
            dws[l][:] += jax.lax.dot_general(
                fbar.astype(jnp.bfloat16), e.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            ebar = _dot(fbar, ws[l])
            dbar = ebar * sp
            spp = 100.0 * sp * (1.0 - sp)
            zbar_chain[l] = ebar * ds[l + 1] * spp
        col_bar = jnp.sum(dbar, axis=0, keepdims=True)
        onehot = (jax.lax.broadcasted_iota(
            jnp.int32, (1, ws[n_lin - 1].shape[1]), 1) == 0).astype(
            jnp.float32)
        dws[n_lin - 1][:] += jax.lax.dot_general(
            col_bar, onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        # Phase B: reverse the forward chain (descend l)
        xebar = jnp.zeros_like(xe)
        zbar = ybar
        for l in range(n_lin - 1, -1, -1):
            if l == 0:
                inp = xe
            else:
                prev = acts[l - 1]
                inp = (jnp.concatenate([prev, xe], axis=-1) * inv_sqrt2
                       if l == S else prev)
            dws[l][:] += jax.lax.dot_general(
                inp.astype(jnp.bfloat16), zbar.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            dbs[l][:] += jnp.sum(zbar, axis=0, keepdims=True)
            inpbar = _dot(zbar, wts[l])
            if l == S:
                h_dim = wts[l].shape[1] - xe.shape[1]
                xebar = xebar + inpbar[:, h_dim:] * inv_sqrt2
                ibar = inpbar[:, :h_dim] * inv_sqrt2
            else:
                ibar = inpbar
            if l == 0:
                xebar = xebar + ibar
            else:
                extra = zbar_chain[l - 1]
                zbar = ibar * sigs[l - 1] + (extra if extra is not None
                                             else 0.0)
        xebar_ref[:] = xebar

    return kernel


def _weight_specs(ws, bs):
    return ([pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
             for w in ws]
            + [pl.BlockSpec(b.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for b in bs])


def _pe_table_specs(multires):
    G, f, kind = _pe_tables(multires)
    specs = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM) for t in (G, f, kind)]
    return (G, f, kind), specs


@partial(jax.jit, static_argnames=("cfg_key", "want_feature"))
def _sdf_forward_impl(ws, bs, x, cfg_key, want_feature):
    cfg = dict(cfg_key)
    n_lin = len(ws)
    xs, n = _pad_to_tile(x)
    grid = xs.shape[0] // TILE
    d_out = cfg["d_out"] if want_feature else 1
    (G, f, kind), table_specs = _pe_table_specs(cfg["multires"])
    kernel = _make_fwd_kernel(cfg, n_lin, want_feature)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + table_specs + _weight_specs(ws, bs),
        out_specs=pl.BlockSpec((TILE, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xs.shape[0], d_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(xs, G, f, kind, *ws, *bs)
    return out[:n]


@partial(jax.jit, static_argnames=("cfg_key",))
def _sdf_forward_grad_impl(ws, bs, x, cfg_key):
    cfg = dict(cfg_key)
    n_lin = len(ws)
    pe_dim = ws[0].shape[0]
    scale = cfg.get("scale", 1.0)
    xs = x * scale
    xe = _pe_mm(xs, cfg["multires"])
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
        interpret=_interpret(),
    )(xe, *ws, *bs, *wts, w_last_col)
    # PE jacobian^T in XLA; the d/dx scale and the /scale on the sdf output
    # cancel, matching nets.sdf_gradient exactly
    grad = _pe_vjp_mm(xs, d_inputs[:n], cfg["multires"])
    return out[:n], grad, d_inputs[:n]


@partial(jax.jit, static_argnames=("cfg_key",))
def _sdf_bwd_impl(ws, bs, x, ybar, gbar_inp, cfg_key):
    """Fused second-order backward kernel dispatch.

    ybar: cotangent on the raw last-layer output z_{L-1} [N, d_out];
    gbar_inp: cotangent on d_inputs (pre PE-vjp) [N, pe_dim].
    Returns (dws [in,out] list, dbs list, xebar [N, pe_dim]).
    """
    cfg = dict(cfg_key)
    n_lin = len(ws)
    pe_dim = ws[0].shape[0]
    scale = cfg.get("scale", 1.0)
    xe = _pe_mm(x * scale, cfg["multires"])
    xe, n = _pad_to_tile(xe)
    ybar_p, _ = _pad_to_tile(ybar)
    gbar_p, _ = _pad_to_tile(gbar_inp)
    grid = xe.shape[0] // TILE
    d_out = cfg["d_out"]
    wts = [w.T for w in ws]
    kernel = _make_bwd_kernel_biased(cfg, n_lin)
    out_shapes = (
        [jax.ShapeDtypeStruct((xe.shape[0], pe_dim), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs])
    out_specs = (
        [pl.BlockSpec((TILE, pe_dim), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in ws]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for b in bs])
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((TILE, pe_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, pe_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + _weight_specs(ws, bs)
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in wts],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(xe, ybar_p, gbar_p, *ws, *bs, *wts)
    xebar = outs[0][:n]
    dws = list(outs[1:1 + n_lin])
    dbs = [b[0] for b in outs[1 + n_lin:]]
    return dws, dbs, xebar


# ------------------------------------------------------------------
# Rays variant (round 3): in-kernel PE + split outputs/cotangents.
#
# The train path's boundary glue around the fwd+grad / 2nd-order kernels
# (xe builds, pe_vjp/jvp/second chains, the [M,257] ybar pad_add, the
# [M,1]->[B,N] sdf reshape) measured ~30 ms/step at 1M samples
# (trace_step.py).  This variant takes raw xs [M,3], does PE and ALL of
# its derivative algebra in VMEM, and returns
#     (out [M, d_out], sdf_bn [B, N], grad [M, 3])
# with the backward taking the naturally-shaped cotangents
# (ct_out [M,d_out], ct_sdf [B,N], ct_grad [M,3]) — nothing wider than
# 3 lanes crosses HBM except the d_out feature row the color kernel
# needs anyway.
# ------------------------------------------------------------------


def _flat_from_ray(O, Smask, ray_vals, hp):
    """[R, N] per-ray values -> [T, 1] flat column (exact one-hot)."""
    return jnp.sum(jnp.dot(O, ray_vals, precision=hp) * Smask,
                   axis=1, keepdims=True)


def _ray_from_flat(O, Smask, col, hp):
    """[T, 1] flat column -> [R, N] per-ray layout (exact one-hot)."""
    return jax.lax.dot_general(
        O, col * Smask, (((0,), (0,)), ((), ())),
        precision=hp, preferred_element_type=jnp.float32)


def _build_xs(o_ref, d_ref, z_ref, O, Smask, hp):
    """pts [T, 3] from per-ray origin/dir [R, 3] + z [R, N] in-kernel.

    The [M, 3] pts array this replaces stores 128-lane padded in HBM
    (42x: 512 MB at 1M samples) and was written by XLA + read by every
    kernel pass; per-ray blocks are a few KB."""
    o_t = jnp.dot(O, o_ref[:], precision=hp)
    d_t = jnp.dot(O, d_ref[:], precision=hp)
    z_flat = _flat_from_ray(O, Smask, z_ref[:], hp)
    return o_t + d_t * z_flat, d_t, z_flat


def _make_fwd_grad_rays_kernel(cfg, n_lin, n_samples, feat_dtype):
    skip_in = tuple(cfg.get("skip_in", (4,)))
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    hp = jax.lax.Precision.HIGHEST

    def kernel(*refs):
        # weights arrive with the LAST layer pre-split host-side into
        # w_feat [256, d_out-1] / b_feat and the sdf column w_last_col
        # [1, 256] / b_sdf [1, 1]: the feature then leaves the kernel as
        # an ALIGNED [T, 256] block (a [T, 257] out forces a lane-offset
        # slice in every consumer and pads its DMA tiles 257->384 lanes).
        # Geometry arrives PER-RAY (o/d [R,3], z [R,N]) and pts is built
        # in-kernel; the gradient leaves as [3]-leading channel planes
        # g3 [3, R, N] (fully lane-packed) instead of [T, 3] (42x pad).
        o_ref, d_ref, z_ref = refs[0], refs[1], refs[2]
        g_ref, f_ref, k_ref = refs[3], refs[4], refs[5]
        ws = [refs[6 + i][:] for i in range(n_lin - 1)]
        w_feat = refs[5 + n_lin][:]
        bs = [refs[6 + n_lin + i][:] for i in range(n_lin - 1)]
        b_feat = refs[5 + 2 * n_lin][:]
        b_sdf = refs[6 + 2 * n_lin][:]
        wts = [refs[7 + 2 * n_lin + i][:] for i in range(n_lin - 1)]
        w_last_col = refs[6 + 3 * n_lin][:]
        feat_ref = refs[7 + 3 * n_lin]
        sdfbn_ref = refs[8 + 3 * n_lin]
        g3_ref = refs[9 + 3 * n_lin]

        T = n_samples * z_ref.shape[0]
        O, Smask = _ray_onehots(T, n_samples)
        xs, _, _ = _build_xs(o_ref, d_ref, z_ref, O, Smask, hp)

        scale = cfg.get("scale", 1.0)
        xs_s = xs * scale
        pe = _PETile(xs_s, g_ref, f_ref, k_ref)
        xe = pe.xe()

        h = xe
        sigs = []
        for l in range(n_lin - 1):
            inp = (jnp.concatenate([h, xe], axis=-1) * inv_sqrt2
                   if l in skip_in else h)
            z = _dot(inp, ws[l]) + bs[l]
            h, sig = _act_pair(z)
            sigs.append(sig)
        inp_last = (jnp.concatenate([h, xe], axis=-1) * inv_sqrt2
                    if (n_lin - 1) in skip_in else h)
        feat_ref[:] = (_dot(inp_last, w_feat) + b_feat).astype(feat_dtype)
        # sdf via the same bf16 contraction the fused [256,257] matmul
        # used for its column 0 (w_last_col is [1, 256]: contract lanes)
        sdf_col = (_dot_lastcol(inp_last, w_last_col) + b_sdf) / scale
        # sdf_bn[r, j] = sdf_col[r*N + j, 0]: exact one-hot contraction
        sdfbn_ref[:] = _ray_from_flat(O, Smask, sdf_col, hp)

        delta = jnp.broadcast_to(
            w_last_col, (xe.shape[0], w_last_col.shape[1]))
        d_inputs = jnp.zeros_like(xe)
        for l in range(n_lin - 2, -1, -1):
            delta = delta * sigs[l]
            delta = _dot(delta, wts[l])
            if l in skip_in:
                h_dim = wts[l].shape[1] - xe.shape[1]
                d_inputs = d_inputs + delta[:, h_dim:] * inv_sqrt2
                delta = delta[:, :h_dim] * inv_sqrt2
        d_inputs = d_inputs + delta
        # scale * (1/scale) on the sdf column cancels: grad is wrt raw x
        grad = jnp.dot(d_inputs * pe.jac(), g_ref[:].T, precision=hp)
        for c in range(3):
            g3_ref[c] = _ray_from_flat(O, Smask, grad[:, c:c + 1], hp)

    return kernel


def _make_fwd_rays_only_kernel(cfg, n_lin, n_samples):
    skip_in = tuple(cfg.get("skip_in", (4,)))
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    hp = jax.lax.Precision.HIGHEST

    def kernel(*refs):
        # forward-only sibling of _make_fwd_grad_rays_kernel for the
        # gradient-free upsample loop (`renderer.py:168-242` runs under
        # no_grad): per-ray o/d [R, 3] + z [R, N] in, sdf [R, N] out —
        # no feature, no grad chain, and neither the [M, 3] pts nor a
        # [M, 1] sdf column (both 42x/128x lane-padded) touch HBM
        o_ref, d_ref, z_ref = refs[0], refs[1], refs[2]
        g_ref, f_ref, k_ref = refs[3], refs[4], refs[5]
        ws = [refs[6 + i][:] for i in range(n_lin - 1)]
        bs = [refs[5 + n_lin + i][:] for i in range(n_lin - 1)]
        b_sdf = refs[4 + 2 * n_lin][:]
        w_last_col = refs[5 + 2 * n_lin][:]
        sdfbn_ref = refs[6 + 2 * n_lin]

        T = n_samples * z_ref.shape[0]
        O, Smask = _ray_onehots(T, n_samples)
        xs, _, _ = _build_xs(o_ref, d_ref, z_ref, O, Smask, hp)

        scale = cfg.get("scale", 1.0)
        pe = _PETile(xs * scale, g_ref, f_ref, k_ref)
        xe = pe.xe()

        h = xe
        for l in range(n_lin - 1):
            inp = (jnp.concatenate([h, xe], axis=-1) * inv_sqrt2
                   if l in skip_in else h)
            h = _softplus100(_dot(inp, ws[l]) + bs[l])
        inp_last = (jnp.concatenate([h, xe], axis=-1) * inv_sqrt2
                    if (n_lin - 1) in skip_in else h)
        # same bf16 lane contraction as the fwd+grad kernel's column 0
        sdf_col = (_dot_lastcol(inp_last, w_last_col) + b_sdf) / scale
        sdfbn_ref[:] = _ray_from_flat(O, Smask, sdf_col, hp)

    return kernel


def _make_bwd_rays_kernel(cfg, n_lin, n_samples):
    skip_in = tuple(cfg.get("skip_in", (4,)))
    S = skip_in[0] if skip_in else -1
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    hp = jax.lax.Precision.HIGHEST
    L = n_lin - 1   # hidden linears; the last layer arrives SPLIT

    def kernel(*refs):
        # Last layer is handled in split form (w_feat / w_last_col), so
        # no [T, 257] ybar concat, no wasted last-layer matmul in the
        # forward recompute, and the feature cotangent arrives as an
        # ALIGNED [T, 256] block.  Weight grads for it leave as
        # dwfeat [256, 256] + dwcolT [1, 256] (the column grad
        # TRANSPOSED: both Phase A's col_bar and Phase B's sum(inp*ct0)
        # are naturally [1, 256] rows — the host re-assembles).
        # Geometry arrives per-ray (o/d/z) and pts is rebuilt in-kernel;
        # the grad cotangent arrives as planes ct_g3 [3, R, N] and the
        # xs cotangent leaves as per-ray reductions obar/dbar [R, 3] +
        # zbar [R, N] — nothing 42x-padded crosses HBM.
        o_ref, d_ref, z_ref = refs[0], refs[1], refs[2]
        ctfeat_ref, ctsdf_ref, ctg3_ref = refs[3], refs[4], refs[5]
        g_ref, f_ref, k_ref = refs[6], refs[7], refs[8]
        ws = [refs[9 + i][:] for i in range(L)]
        bs = [refs[9 + L + i][:] for i in range(L)]
        wts = [refs[9 + 2 * L + i][:] for i in range(L)]
        wfeat_t_ref = refs[9 + 3 * L]
        w_last_col = refs[10 + 3 * L][:]
        obar_ref = refs[11 + 3 * L]
        dbar_ref = refs[12 + 3 * L]
        zbar_ref = refs[13 + 3 * L]
        dws = [refs[14 + 3 * L + i] for i in range(L)]
        dwfeat_ref = refs[14 + 4 * L]
        dwcolt_ref = refs[15 + 4 * L]
        dbs = [refs[16 + 4 * L + i] for i in range(L)]
        dbfeat_ref = refs[16 + 5 * L]
        dbsdf_ref = refs[17 + 5 * L]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for l in range(L):
                dws[l][:] = jnp.zeros_like(dws[l])
                dbs[l][:] = jnp.zeros_like(dbs[l])
            dwfeat_ref[:] = jnp.zeros_like(dwfeat_ref)
            dwcolt_ref[:] = jnp.zeros_like(dwcolt_ref)
            dbfeat_ref[:] = jnp.zeros_like(dbfeat_ref)
            dbsdf_ref[:] = jnp.zeros_like(dbsdf_ref)

        T = n_samples * z_ref.shape[0]
        O, Smask = _ray_onehots(T, n_samples)
        xs, d_t, z_flat = _build_xs(o_ref, d_ref, z_ref, O, Smask, hp)

        scale = cfg.get("scale", 1.0)
        xs_s = xs * scale
        pe = _PETile(xs_s, g_ref, f_ref, k_ref)
        xe = pe.xe()
        jac = pe.jac()

        ct_feat = ctfeat_ref[:].astype(jnp.float32)
        # ct_sdf [R, N] -> flat column [T, 1] via exact one-hot dots
        ct0 = _flat_from_ray(O, Smask, ctsdf_ref[:], hp) / scale
        ct_grad = jnp.concatenate(
            [_flat_from_ray(O, Smask, ctg3_ref[c], hp) for c in range(3)],
            axis=-1)
        ct_grad_G = jnp.dot(ct_grad, g_ref[:], precision=hp)
        gbar = ct_grad_G * jac                      # pe_jvp(xs, ct_grad)

        # forward, storing activations and sigmoids (hidden layers only:
        # the split form never needs the last pre-activation)
        acts = []
        sigs = []
        h = xe
        for l in range(L):
            inp = (jnp.concatenate([h, xe], axis=-1) * inv_sqrt2
                   if l == S else h)
            z = _dot(inp, ws[l]) + bs[l]
            h, sig = _act_pair(z)
            acts.append(h)
            sigs.append(sig)

        # primal gradient chain, storing d_l and the full xe-cotangent
        # (d_inputs, needed for the PE second-derivative term)
        ds = [None] * n_lin
        ds[n_lin - 1] = jnp.broadcast_to(
            w_last_col, (T, w_last_col.shape[1]))
        d_inputs = jnp.zeros_like(xe)
        for l in range(n_lin - 2, -1, -1):
            e = ds[l + 1] * sigs[l]
            fm = _dot(e, wts[l])
            if l == S:
                h_dim = wts[l].shape[1] - xe.shape[1]
                d_inputs = d_inputs + fm[:, h_dim:] * inv_sqrt2
                ds[l] = fm[:, :h_dim] * inv_sqrt2
            else:
                ds[l] = fm
        d_inputs = d_inputs + ds[0]

        # Phase A: reverse the gradient chain (ascend l)
        zbar_chain = [None] * n_lin
        dbar = gbar
        for l in range(0, L):
            if l == S:
                fbar = jnp.concatenate(
                    [dbar * inv_sqrt2, gbar * inv_sqrt2], axis=-1)
            else:
                fbar = dbar
            sp = sigs[l]
            e = ds[l + 1] * sp
            dws[l][:] += jax.lax.dot_general(
                fbar.astype(jnp.bfloat16), e.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            ebar = _dot(fbar, ws[l])
            dbar = ebar * sp
            spp = 100.0 * sp * (1.0 - sp)
            zbar_chain[l] = ebar * ds[l + 1] * spp
        dwcolt_ref[:] += jnp.sum(dbar, axis=0, keepdims=True)

        # Phase B: reverse the forward chain, last (split) layer first
        inp_last = (jnp.concatenate([acts[L - 1], xe], axis=-1) * inv_sqrt2
                    if L == S else acts[L - 1])
        dwfeat_ref[:] += jax.lax.dot_general(
            inp_last.astype(jnp.bfloat16), ct_feat.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dwcolt_ref[:] += jnp.sum(inp_last * ct0, axis=0, keepdims=True)
        dbfeat_ref[:] += jnp.sum(ct_feat, axis=0, keepdims=True)
        dbsdf_ref[:] += jnp.sum(ct0, axis=0, keepdims=True)
        inpbar = _dot(ct_feat, wfeat_t_ref[:]) + ct0 * w_last_col
        xebar = jnp.zeros_like(xe)
        if L == S:
            h_dim = inpbar.shape[1] - xe.shape[1]
            xebar = xebar + inpbar[:, h_dim:] * inv_sqrt2
            ibar = inpbar[:, :h_dim] * inv_sqrt2
        else:
            ibar = inpbar
        zbar = ibar * sigs[L - 1] + (zbar_chain[L - 1]
                                     if zbar_chain[L - 1] is not None
                                     else 0.0)
        for l in range(L - 1, -1, -1):
            if l == 0:
                inp = xe
            else:
                prev = acts[l - 1]
                inp = (jnp.concatenate([prev, xe], axis=-1) * inv_sqrt2
                       if l == S else prev)
            dws[l][:] += jax.lax.dot_general(
                inp.astype(jnp.bfloat16), zbar.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            dbs[l][:] += jnp.sum(zbar, axis=0, keepdims=True)
            inpbar = _dot(zbar, wts[l])
            if l == S:
                h_dim = wts[l].shape[1] - xe.shape[1]
                xebar = xebar + inpbar[:, h_dim:] * inv_sqrt2
                ibar = inpbar[:, :h_dim] * inv_sqrt2
            else:
                ibar = inpbar
            if l == 0:
                xebar = xebar + ibar
            else:
                extra = zbar_chain[l - 1]
                zbar = ibar * sigs[l - 1] + (extra if extra is not None
                                             else 0.0)

        # xs cotangent fully in-kernel: pe_vjp(xs, xebar) + second term,
        # then reduced per-ray THROUGH pts = o + d*z (exact one-hot
        # contractions): obar = sum_j xsbar, dbar = sum_j z*xsbar,
        # zbar = <xsbar, d> per sample
        xsbar = jnp.dot(xebar * jac + ct_grad_G * d_inputs * pe.d2(),
                        g_ref[:].T, precision=hp) * scale
        obar_ref[:] = jax.lax.dot_general(
            O, xsbar, (((0,), (0,)), ((), ())),
            precision=hp, preferred_element_type=jnp.float32)
        dbar_ref[:] = jax.lax.dot_general(
            O, xsbar * z_flat, (((0,), (0,)), ((), ())),
            precision=hp, preferred_element_type=jnp.float32)
        s = jnp.sum(xsbar * d_t, axis=1, keepdims=True)
        zbar_ref[:] = _ray_from_flat(O, Smask, s, hp)

    return kernel


# dtype of the [M, d_feat] feature crossing to the color kernel.  bf16
# is BIT-IDENTICAL downstream: the color kernel's first matmul casts its
# operand to bf16 anyway, so rounding at the store equals rounding at
# the load — and the tensor is ~1 GB/step at 1M samples (f32), the
# single largest HBM crossing left on the fused path.
FEAT_DTYPE = (jnp.bfloat16
              if os.environ.get("FMOV_FEAT_BF16", "1") == "1"
              else jnp.float32)


def _pad_rays(o, d, z, rays_per_tile):
    B = z.shape[0]
    b_pad = B + ((-B) % rays_per_tile)
    if b_pad != B:
        pad = b_pad - B
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], 0)
        d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)], 0)
        z = jnp.concatenate([z, jnp.zeros((pad, z.shape[1]), z.dtype)], 0)
    return o, d, z, b_pad


@partial(jax.jit, static_argnames=("cfg_key", "n_samples"))
def _sdf_fwd_grad_rays_impl(ws, bs, o, d, z, cfg_key, n_samples):
    cfg = dict(cfg_key)
    n_lin = len(ws)
    d_feat = cfg["d_out"] - 1
    rays_per_tile = TILE // n_samples
    B = z.shape[0]
    o_p, d_p, z_p, b_pad = _pad_rays(o, d, z, rays_per_tile)
    m_pad = b_pad * n_samples
    grid = m_pad // TILE
    (G, f, kind), table_specs = _pe_table_specs(cfg["multires"])
    wts = [w.T for w in ws[:-1]]
    w_last_col = ws[-1][:, 0][None, :]
    w_feat = ws[-1][:, 1:]
    b_feat = bs[-1][:, 1:]
    b_sdf = bs[-1][:, :1]
    ws_in = list(ws[:-1]) + [w_feat]
    bs_in = list(bs[:-1]) + [b_feat]
    kernel = _make_fwd_grad_rays_kernel(cfg, n_lin, n_samples, FEAT_DTYPE)
    ray3_spec = pl.BlockSpec((rays_per_tile, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    rayn_spec = pl.BlockSpec((rays_per_tile, n_samples), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    feat, sdf_bn, g3 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[ray3_spec, ray3_spec, rayn_spec]
        + table_specs + _weight_specs(ws_in, bs_in)
        + [pl.BlockSpec(b_sdf.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in wts]
        + [pl.BlockSpec(w_last_col.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((TILE, d_feat), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            rayn_spec,
            pl.BlockSpec((3, rays_per_tile, n_samples),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, d_feat), FEAT_DTYPE),
            jax.ShapeDtypeStruct((b_pad, n_samples), jnp.float32),
            jax.ShapeDtypeStruct((3, b_pad, n_samples), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(o_p, d_p, z_p, G, f, kind, *ws_in, *bs_in, b_sdf, *wts, w_last_col)
    return feat[:B * n_samples], sdf_bn[:B], g3[:, :B]


@partial(jax.jit, static_argnames=("cfg_key", "n_samples"))
def _sdf_only_rays_impl(ws, bs, o, d, z, cfg_key, n_samples):
    cfg = dict(cfg_key)
    n_lin = len(ws)
    rays_per_tile = TILE // n_samples
    B = z.shape[0]
    o_p, d_p, z_p, b_pad = _pad_rays(o, d, z, rays_per_tile)
    grid = (b_pad * n_samples) // TILE
    (G, f, kind), table_specs = _pe_table_specs(cfg["multires"])
    ws_h = list(ws[:-1])
    bs_h = list(bs[:-1])
    b_sdf = bs[-1][:, :1]
    w_last_col = ws[-1][:, 0][None, :]
    kernel = _make_fwd_rays_only_kernel(cfg, n_lin, n_samples)
    ray3_spec = pl.BlockSpec((rays_per_tile, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    rayn_spec = pl.BlockSpec((rays_per_tile, n_samples), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    sdf_bn = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[ray3_spec, ray3_spec, rayn_spec]
        + table_specs + _weight_specs(ws_h, bs_h)
        + [pl.BlockSpec(b_sdf.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec(w_last_col.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=rayn_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, n_samples), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(o_p, d_p, z_p, G, f, kind, *ws_h, *bs_h, b_sdf, w_last_col)
    return sdf_bn[:B]


@partial(jax.jit, static_argnames=("cfg_key", "n_samples"))
def _sdf_bwd_rays_impl(ws, bs, o, d, z, ct_feat, ct_sdf, ct_g3, cfg_key,
                       n_samples):
    cfg = dict(cfg_key)
    n_lin = len(ws)
    L = n_lin - 1
    d_feat = cfg["d_out"] - 1
    rays_per_tile = TILE // n_samples
    B = z.shape[0]
    o_p, d_p, z_p, b_pad = _pad_rays(o, d, z, rays_per_tile)
    m_pad = b_pad * n_samples
    ctfeat_p = ct_feat
    if ctfeat_p.shape[0] != m_pad:
        ctfeat_p = jnp.concatenate(
            [ctfeat_p, jnp.zeros((m_pad - ctfeat_p.shape[0], d_feat),
                                 ctfeat_p.dtype)], 0)
    ct_sdf_p = ct_sdf
    ct_g3_p = ct_g3
    if ct_sdf_p.shape[0] != b_pad:
        pad = b_pad - ct_sdf_p.shape[0]
        ct_sdf_p = jnp.concatenate(
            [ct_sdf_p, jnp.zeros((pad, n_samples), ct_sdf_p.dtype)], 0)
        ct_g3_p = jnp.concatenate(
            [ct_g3_p, jnp.zeros((3, pad, n_samples), ct_g3_p.dtype)], 1)
    grid = m_pad // TILE
    (G, f, kind), table_specs = _pe_table_specs(cfg["multires"])
    ws_h, bs_h = list(ws[:-1]), list(bs[:-1])
    wts = [w.T for w in ws_h]
    wfeat_t = ws[-1][:, 1:].T
    w_last_col = ws[-1][:, 0][None, :]
    kernel = _make_bwd_rays_kernel(cfg, n_lin, n_samples)
    d_hid = ws[-1].shape[0]
    ray3_spec = pl.BlockSpec((rays_per_tile, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    rayn_spec = pl.BlockSpec((rays_per_tile, n_samples), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    g3_spec = pl.BlockSpec((3, rays_per_tile, n_samples),
                           lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    out_shapes = (
        [jax.ShapeDtypeStruct((b_pad, 3), jnp.float32),
         jax.ShapeDtypeStruct((b_pad, 3), jnp.float32),
         jax.ShapeDtypeStruct((b_pad, n_samples), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws_h]
        + [jax.ShapeDtypeStruct((d_hid, d_feat), jnp.float32),
           jax.ShapeDtypeStruct((1, d_hid), jnp.float32)]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs_h]
        + [jax.ShapeDtypeStruct((1, d_feat), jnp.float32),
           jax.ShapeDtypeStruct((1, 1), jnp.float32)])
    out_specs = tuple(
        [ray3_spec, ray3_spec, rayn_spec]
        + [pl.BlockSpec(s.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for s in out_shapes[3:]])
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[ray3_spec, ray3_spec, rayn_spec,
                  pl.BlockSpec((TILE, d_feat), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  rayn_spec, g3_spec]
        + table_specs + _weight_specs(ws_h, bs_h)
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in wts]
        + [pl.BlockSpec(wfeat_t.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec(w_last_col.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(o_p, d_p, z_p, ctfeat_p, ct_sdf_p, ct_g3_p, G, f, kind,
      *ws_h, *bs_h, *wts, wfeat_t, w_last_col)
    obar, dbar, zbar = outs[0][:B], outs[1][:B], outs[2][:B]
    dws = list(outs[3:3 + L])
    dwfeat, dwcolt = outs[3 + L], outs[4 + L]
    dbs_h = [b[0] for b in outs[5 + L:5 + 2 * L]]
    dbfeat, dbsdf = outs[5 + 2 * L], outs[6 + 2 * L]
    # re-assemble the reference-shaped last-layer grads
    dws.append(jnp.concatenate([dwcolt.T, dwfeat], axis=1))
    dbs_h.append(jnp.concatenate([dbsdf, dbfeat], axis=1)[0])
    return obar, dbar, zbar, dws, dbs_h


def _cfg_key(cfg):
    keys = ("d_out", "d_in", "d_hidden", "n_layers", "multires", "scale")
    items = [(k, cfg[k]) for k in keys if k in cfg]
    items.append(("skip_in", tuple(cfg.get("skip_in", (4,)))))
    return tuple(items)


def supported(cfg) -> bool:
    return (cfg.get("d_in", 3) == 3 and cfg.get("multires", 0) > 0
            and len(tuple(cfg.get("skip_in", (4,)))) == 1
            and (jax.default_backend() != "cpu" or _interpret()))


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
    out, grad, _ = _sdf_forward_grad_impl(ws, bs, x, cfg_key)
    return out, grad


def _sdf_apply_grad_fwd(params, cfg_key, x):
    ws, bs = _materialize(params, dict(cfg_key))
    out, grad, d_inputs = _sdf_forward_grad_impl(ws, bs, x, cfg_key)
    return (out, grad), (params, x, d_inputs)


def _sdf_apply_grad_bwd_ref(cfg_key, res, cts):
    """XLA reference backward (correctness oracle / opt-out path)."""
    params, x, _ = res
    cfg = dict(cfg_key)

    def ref(p, pts):
        out = nets.sdf_apply(p, cfg, pts)
        grad = nets.sdf_gradient(p, cfg, pts)
        return out, grad

    _, vjp = jax.vjp(ref, params, x)
    return vjp(cts)


def _sdf_apply_grad_bwd(cfg_key, res, cts):
    """Fused second-order backward: one Pallas kernel computes every
    weight/bias/input cotangent of (out, grad) with all intermediates in
    VMEM (see the derivation above _make_bwd_kernel_biased)."""
    import os
    if os.environ.get("FMOV_FUSED_BWD", "1") == "0":
        return _sdf_apply_grad_bwd_ref(cfg_key, res, cts)
    params, x, d_inputs = res
    cfg = dict(cfg_key)
    scale = cfg.get("scale", 1.0)
    multires = cfg["multires"]
    ct_out, ct_grad = cts
    xs = x * scale

    # out = [z[:, :1]/scale, z[:, 1:]]  ->  cotangent on raw z
    ybar = jnp.concatenate([ct_out[:, :1] / scale, ct_out[:, 1:]], axis=-1)
    # grad = pe_vjp(xs, d_inputs)  ->  cotangent on d_inputs (linear part)
    gbar_inp = _pe_jvp_mm(xs, ct_grad, multires)

    (ws, bs), mat_vjp = jax.vjp(
        lambda p: _materialize(p, cfg), params)
    dws, dbs, xebar = _sdf_bwd_impl(ws, bs, x, ybar, gbar_inp, cfg_key)

    # xs cotangent: through PE for the forward input, plus the
    # xs-dependence of pe_vjp itself (second PE derivative)
    xsbar = _pe_vjp_mm(xs, xebar, multires) \
        + _pe_second_mm(xs, d_inputs, ct_grad, multires)
    xbar = xsbar * scale

    (pbar,) = mat_vjp((dws, [db[None, :] for db in dbs]))
    return pbar, xbar


_sdf_apply_grad_op.defvjp(_sdf_apply_grad_fwd, _sdf_apply_grad_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _sdf_rays_op(params, cfg_key, o, d, z):
    ws, bs = _materialize(params, dict(cfg_key))
    return _sdf_fwd_grad_rays_impl(ws, bs, o, d, z, cfg_key, z.shape[1])


def _sdf_rays_fwd(params, cfg_key, o, d, z):
    return _sdf_rays_op(params, cfg_key, o, d, z), (params, o, d, z)


def _sdf_rays_bwd(cfg_key, res, cts):
    params, o, d, z = res
    ct_feat, ct_sdf, ct_g3 = cts
    n_samples = z.shape[1]
    if os.environ.get("FMOV_FUSED_BWD", "1") == "0":
        # XLA reference oracle through the unfused nets
        cfg = dict(cfg_key)

        def ref(p, oo, dd, zz):
            pts = (oo[:, None, :] + dd[:, None, :]
                   * zz[..., None]).reshape(-1, 3)
            out = nets.sdf_apply(p, cfg, pts)
            grad = nets.sdf_gradient(p, cfg, pts)
            sdf_bn = out[:, 0].reshape(-1, n_samples)
            g3 = jnp.moveaxis(grad.reshape(-1, n_samples, 3), -1, 0)
            return out[:, 1:].astype(FEAT_DTYPE), sdf_bn, g3

        _, vjp = jax.vjp(ref, params, o, d, z)
        return vjp((ct_feat, ct_sdf, ct_g3))
    (ws, bs), mat_vjp = jax.vjp(
        lambda p: _materialize(p, dict(cfg_key)), params)
    obar, dbar, zbar, dws, dbs = _sdf_bwd_rays_impl(
        ws, bs, o, d, z, ct_feat, ct_sdf, ct_g3, cfg_key, n_samples)
    (pbar,) = mat_vjp((dws, [db[None, :] for db in dbs]))
    return pbar, obar, dbar, zbar


_sdf_rays_op.defvjp(_sdf_rays_fwd, _sdf_rays_bwd)


def sdf_apply_grad_fused_rays(params, cfg, rays_o, rays_d, z_mid):
    """(feat [B*N, d_out-1], sdf_bn [B, N], g3 [3, B, N]) from per-ray
    geometry (rays_o/rays_d [B, 3], z_mid [B, N]): pts are built
    IN-KERNEL, PE and every PE-derivative chain are fused, the last
    layer is split so the feature leaves lane-ALIGNED (FEAT_DTYPE, bf16
    by default — bit-identical to the color kernel's own bf16 cast),
    and the gradient leaves as fully lane-packed channel planes instead
    of a 42x-padded [M, 3].  The backward reduces the pts cotangent
    per-ray through pts = o + d*z (obar/dbar [B, 3], zbar [B, N]).
    Requires TILE % N == 0 (each tile holds whole rays)."""
    return _sdf_rays_op(params, _cfg_key(cfg), rays_o, rays_d, z_mid)


def sdf_only_fused_rays(params, cfg, rays_o, rays_d, z_vals):
    """sdf [B, N] at pts = o + d*z, geometry built IN-KERNEL.

    Forward-only: the SDF-guided upsample loop runs under no_grad in the
    reference (`renderer.py:424`), so no vjp is defined and EVERY input
    is detached here — rays_o/rays_d carry pose-network tangents inside
    the train step, and jvp tracing needs a rule at the pallas_call
    itself even when the output's tangent is dropped downstream.
    Matches sdf_only_fused(pts)[:, 0] up to the shared bf16 matmul
    rounding (identical contraction order for the sdf column)."""
    cfg_key = _cfg_key(cfg)
    ws, bs = _materialize(params, dict(cfg_key))
    sg = jax.lax.stop_gradient
    return _sdf_only_rays_impl(
        sg(ws), sg(bs), sg(rays_o), sg(rays_d), sg(z_vals),
        cfg_key, z_vals.shape[1])


# below this many total samples the rays variant loses to the plain
# fused kernels: its in-kernel PE trades HBM passes for VPU
# transcendentals, a win only once the boundary traffic dominates —
# measured v5e crossover: batch 512 x 64 (32k samples) regressed
# 182.4k -> 147.5k rays/s, while 4096 x 128 (524k) gained 57.8k -> 63.0k
MIN_SAMPLES_RAYS = int(os.environ.get("FMOV_FUSED_RAYS_MIN", "65536"))


def supported_rays(cfg, n_samples: int, n_pts: int = None) -> bool:
    ok = supported(cfg) and TILE % n_samples == 0
    if n_pts is not None:
        ok = ok and n_pts >= MIN_SAMPLES_RAYS
    return ok


# ------------------------------------------------------------------
# Whole-upsample-loop kernel (round 3): the SDF-guided hierarchical
# sampling loop (`renderer.py:374-446`: 4x {section alpha -> weights ->
# inverse-CDF draw -> SDF eval at new z -> sorted merge}) runs start to
# finish in ONE forward-only pallas kernel.  The XLA loop — even with
# fused per-round evals — still pays 4 variadic lax.sorts, 4 compare-all
# sample_pdf passes and 5 kernel-boundary crossings per step (~10 ms of
# the phase-2 step at 8192x128 on v5e).  In VMEM per ray tile:
#   * transmittance cumprod / CDF cumsum: log-step lane-shift trees,
#   * inverse-CDF draw: the det-mode u grid is static, so each of the k
#     draws is a handful of masked lane reductions,
#   * merge: k sequential sorted insertions (ascending draws ->
#     stable-tie equivalent to the variadic sort in core/sampling.py),
# and the per-round SDF evals reuse the in-kernel PE+MLP of
# _make_fwd_rays_only_kernel.  Forward-only: the loop runs under
# stop_gradient (`renderer.py:424` no_grad), no vjp is defined.
# Gated by FMOV_FUSED_UPSAMPLE_FULL (default OFF until validated on a
# real chip — interpret mode cannot catch Mosaic lowering failures; set
# =1 to enable) on top of the usual fused-train + size gates.
# ------------------------------------------------------------------

_SENT = 1e10      # sentinel for not-yet-filled z lanes (sorts after all z)
_BIG = 1e30       # masked-reduction identity


def _shr_lanes(x, n, fill):
    """Shift right by n along the lane (last) dim, filling with `fill`."""
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (n,), fill, x.dtype), x[..., :-n]], axis=-1)


def _shl_lanes(x, n, fill):
    return jnp.concatenate(
        [x[..., n:], jnp.full(x.shape[:-1] + (n,), fill, x.dtype)], axis=-1)


def _cumsum_lanes(x, width):
    """Inclusive prefix sum along lanes (log-step shifted adds)."""
    s = 1
    while s < width:
        x = x + _shr_lanes(x, s, 0.0)
        s *= 2
    return x


def _cumprod_excl_lanes(q, width):
    """Exclusive prefix product along lanes: out[j] = prod_{i<j} q[i]."""
    s = 1
    p = q
    while s < width:
        p = p * _shr_lanes(p, s, 1.0)
        s *= 2
    return _shr_lanes(p, 1, 1.0)


def _make_upsample_rays_kernel(cfg, n_lin, n0, k, steps, inv_s_base):
    skip_in = tuple(cfg.get("skip_in", (4,)))
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    hp = jax.lax.Precision.HIGHEST
    W = n0 + k * steps
    u_grid = np.linspace(0.5 / k, 1.0 - 0.5 / k, k).astype(np.float64)

    def kernel(*refs):
        o_ref, d_ref, z0_ref = refs[0], refs[1], refs[2]
        g_ref, f_ref, k_ref = refs[3], refs[4], refs[5]
        ws = [refs[6 + i][:] for i in range(n_lin - 1)]
        bs = [refs[5 + n_lin + i][:] for i in range(n_lin - 1)]
        b_sdf = refs[4 + 2 * n_lin][:]
        w_last_col = refs[5 + 2 * n_lin][:]
        zout_ref = refs[6 + 2 * n_lin]

        R = z0_ref.shape[0]
        o = o_ref[:]
        d = d_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)

        def eval_sdf(zblock, n):
            """sdf [R, n] at pts = o + d*z — the fwd-only rays MLP."""
            T = R * n
            O, Smask = _ray_onehots(T, n)
            o_t = jnp.dot(O, o, precision=hp)
            d_t = jnp.dot(O, d, precision=hp)
            z_flat = _flat_from_ray(O, Smask, zblock, hp)
            xs = o_t + d_t * z_flat
            pe = _PETile(xs * cfg.get("scale", 1.0), g_ref, f_ref, k_ref)
            xe = pe.xe()
            h = xe
            for l in range(n_lin - 1):
                inp = (jnp.concatenate([h, xe], axis=-1) * inv_sqrt2
                       if l in skip_in else h)
                h = _softplus100(_dot(inp, ws[l]) + bs[l])
            inp_last = (jnp.concatenate([h, xe], axis=-1) * inv_sqrt2
                        if (n_lin - 1) in skip_in else h)
            sdf_col = (_dot_lastcol(inp_last, w_last_col)
                       + b_sdf) / cfg.get("scale", 1.0)
            return _ray_from_flat(O, Smask, sdf_col, hp)

        # ray-constant radius coefficients: |o + z d|^2 expanded
        o2 = jnp.sum(o * o, axis=-1, keepdims=True)
        od = jnp.sum(o * d, axis=-1, keepdims=True)
        d2 = jnp.sum(d * d, axis=-1, keepdims=True)

        pad = W - n0
        zbuf = jnp.concatenate(
            [z0_ref[:], jnp.full((R, pad), _SENT, jnp.float32)], axis=-1)
        sdfbuf = jnp.concatenate(
            [eval_sdf(z0_ref[:], n0), jnp.zeros((R, pad), jnp.float32)],
            axis=-1)

        for i in range(steps):
            n_i = n0 + i * k
            inv_s = inv_s_base * 2.0 ** i
            # --- section alpha on the current union (up_sample math) ---
            z_next = _shl_lanes(zbuf, 1, _SENT)
            s_next = _shl_lanes(sdfbuf, 1, 0.0)
            rad = o2 + 2.0 * zbuf * od + zbuf * zbuf * d2
            rad_next = _shl_lanes(rad, 1, _SENT)
            inside = ((rad < 1.0) | (rad_next < 1.0)).astype(jnp.float32)
            mid_sdf = (sdfbuf + s_next) * 0.5
            cos_val = (s_next - sdfbuf) / (z_next - zbuf + 1e-5)
            prev_cos = _shr_lanes(cos_val, 1, 0.0)
            cos_val = jnp.minimum(prev_cos, cos_val)
            cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside
            dist = z_next - zbuf
            prev_cdf = jax.nn.sigmoid((mid_sdf - cos_val * dist * 0.5)
                                      * inv_s)
            next_cdf = jax.nn.sigmoid((mid_sdf + cos_val * dist * 0.5)
                                      * inv_s)
            alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
            ivalid = lane < (n_i - 1)
            alpha = jnp.where(ivalid, alpha, 0.0)
            q = jnp.where(ivalid, 1.0 - alpha + 1e-7, 1.0)
            weights = alpha * _cumprod_excl_lanes(q, W)

            # --- sample_pdf (det mode), masked compare-all ---
            w = jnp.where(ivalid, weights + 1e-5, 0.0)
            pdf = w / jnp.sum(w, axis=-1, keepdims=True)
            cdf_edge = _shr_lanes(_cumsum_lanes(pdf, W), 1, 0.0)
            evalid = lane < n_i
            last_cdf = jnp.max(jnp.where(evalid, cdf_edge, -_BIG),
                               axis=-1, keepdims=True)
            last_bin = jnp.max(jnp.where(evalid, zbuf, -_BIG),
                               axis=-1, keepdims=True)
            cols = []
            for u in u_grid:
                u = float(u)
                le = evalid & (cdf_edge <= u)
                # count == 0 is impossible: edge 0 has cdf 0 <= u (u > 0)
                cnt = jnp.sum(le.astype(jnp.float32), axis=-1,
                              keepdims=True)
                cdf_b = jnp.max(jnp.where(le, cdf_edge, -_BIG),
                                axis=-1, keepdims=True)
                bin_b = jnp.max(jnp.where(le, zbuf, -_BIG),
                                axis=-1, keepdims=True)
                gt = evalid & jnp.logical_not(le)
                cdf_a = jnp.min(jnp.where(gt, cdf_edge, _BIG),
                                axis=-1, keepdims=True)
                bin_a = jnp.min(jnp.where(gt, zbuf, _BIG),
                                axis=-1, keepdims=True)
                empty_hi = cnt >= float(n_i)
                cdf_a = jnp.where(empty_hi, last_cdf, cdf_a)
                bin_a = jnp.where(empty_hi, last_bin, bin_a)
                denom = cdf_a - cdf_b
                denom = jnp.where(denom < 1e-5, jnp.ones_like(denom),
                                  denom)
                cols.append(bin_b + (u - cdf_b) / denom * (bin_a - bin_b))
            new_z = jnp.concatenate(cols, axis=-1)          # [R, k] asc

            # --- SDF at the new samples (skipped on the last round,
            #     `renderer.py:222-242` last=True) ---
            if i + 1 < steps:
                new_sdf = eval_sdf(new_z, k)
            else:
                new_sdf = jnp.zeros((R, k), jnp.float32)

            # --- k sorted insertions == stable two-list merge: draws
            #     ascend, so insert-after-equals reproduces the variadic
            #     sort's tie order (all existing before new) ---
            for j in range(k):
                b_j = new_z[:, j:j + 1]
                s_j = new_sdf[:, j:j + 1]
                cur_n = n_i + j
                le_z = (zbuf <= b_j) & (lane < cur_n)
                cnt = jnp.sum(le_z.astype(jnp.float32), axis=-1,
                              keepdims=True).astype(jnp.int32)
                z_sh = _shr_lanes(zbuf, 1, 0.0)
                s_sh = _shr_lanes(sdfbuf, 1, 0.0)
                at = lane == cnt
                before = lane < cnt
                zbuf = jnp.where(before, zbuf, jnp.where(at, b_j, z_sh))
                sdfbuf = jnp.where(before, sdfbuf,
                                   jnp.where(at, s_j, s_sh))

        zout_ref[:] = zbuf

    return kernel


UPSAMPLE_TILE_RAYS = int(os.environ.get("FMOV_UPSAMPLE_TILE_RAYS", "32"))


@partial(jax.jit, static_argnames=("cfg_key", "n0", "k", "steps",
                                   "inv_s_base"))
def _upsample_rays_impl(ws, bs, o, d, z0, cfg_key, n0, k, steps,
                        inv_s_base):
    cfg = dict(cfg_key)
    n_lin = len(ws)
    W = n0 + k * steps
    R = UPSAMPLE_TILE_RAYS
    B = z0.shape[0]
    o_p, d_p, z_p, b_pad = _pad_rays(o, d, z0, R)
    grid = b_pad // R
    (G, f, kind), table_specs = _pe_table_specs(cfg["multires"])
    ws_h = list(ws[:-1])
    bs_h = list(bs[:-1])
    b_sdf = bs[-1][:, :1]
    w_last_col = ws[-1][:, 0][None, :]
    kernel = _make_upsample_rays_kernel(cfg, n_lin, n0, k, steps,
                                        inv_s_base)
    ray3_spec = pl.BlockSpec((R, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    z0_spec = pl.BlockSpec((R, n0), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    z_full = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[ray3_spec, ray3_spec, z0_spec]
        + table_specs + _weight_specs(ws_h, bs_h)
        + [pl.BlockSpec(b_sdf.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec(w_last_col.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(o_p, d_p, z_p, G, f, kind, *ws_h, *bs_h, b_sdf, w_last_col)
    return z_full[:B]


def upsample_fused_rays(params, cfg, rays_o, rays_d, z_vals, n_importance,
                        steps, inv_s_base=64.0):
    """z [B, n0 + n_importance] — the full SDF-guided upsample loop
    (`renderer.py:423-446`: up_sample/cat_z_vals x steps) in one
    forward-only kernel.  z_vals [B, n0] must be per-ray ascending (it
    is: linspace + per-ray scalar perturb).  No vjp — the loop runs
    under no_grad in the reference, so every input is detached here
    (rays carry pose tangents inside the train step and jvp tracing
    needs a rule at the pallas_call itself)."""
    cfg_key = _cfg_key(cfg)
    ws, bs = _materialize(params, dict(cfg_key))
    k = n_importance // steps
    sg = jax.lax.stop_gradient
    return _upsample_rays_impl(
        sg(ws), sg(bs), sg(rays_o), sg(rays_d), sg(z_vals),
        cfg_key, z_vals.shape[1], k, steps, float(inv_s_base))


def supported_upsample(cfg, n0: int, n_importance: int, steps: int,
                       n_pts: int = None) -> bool:
    """Gate for upsample_fused_rays: same fused-train support + the
    det-mode shape contract (equal draws per round, <= 128 lanes)."""
    if not supported(cfg) or steps <= 0:
        return False
    k = n_importance // steps
    ok = (k >= 1 and k * steps == n_importance and n0 + n_importance <= 128)
    if n_pts is not None:
        ok = ok and n_pts >= MIN_SAMPLES_RAYS
    return ok


def sdf_apply_grad_fused(params, cfg, x):
    """(out [N, d_out], grad [N, 3]) in one fused kernel, with a fused
    second-order backward (set FMOV_FUSED_BWD=0 for the XLA reference)."""
    return _sdf_apply_grad_op(params, _cfg_key(cfg), x)
