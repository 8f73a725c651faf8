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
    """bf16 x bf16 -> f32 MXU dot (weights are cast once per tile).

    precision is pinned to DEFAULT: without it a global
    jax_default_matmul_precision=highest stamps contract_precision<fp32>
    onto the bf16 operands and Mosaic rejects the kernel ("Bad lhs
    type").  bf16 x bf16 single-pass is the intended semantics here
    regardless of the global knob."""
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   precision=jax.lax.Precision.DEFAULT,
                   preferred_element_type=jnp.float32)


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

    def __init__(self, xs_s, g_ref, f_ref, k_ref, _R=None):
        hp = jax.lax.Precision.HIGHEST
        self.f = f_ref[:]
        self.kind = k_ref[:]
        self.G = g_ref[:]
        if _R is None:
            self.R = jnp.dot(xs_s, self.G, precision=hp)
        else:
            self.R = _R
        Rf = self.R * self.f
        self.sin = jnp.sin(Rf)
        self.cos = jnp.cos(Rf)

    @classmethod
    def from_planes(cls, x_pl, scale, g_ref, f_ref, k_ref):
        """Build from a (3, T) channel-plane block (the [M, 3] HBM layout
        pads 3 -> 128 lanes = 42x traffic; planes tile cleanly).

        R = (x^T G) * scale via a transposed-lhs dot_general.  G's columns
        are one-hot, so each R entry is one product — the selection and
        the post-scale are exact, bitwise equal to the (x*scale) @ G
        row-form."""
        hp = jax.lax.Precision.HIGHEST
        R = jax.lax.dot_general(
            x_pl, g_ref[:], (((0,), (0,)), ((), ())),
            precision=hp) * scale
        return cls(None, g_ref, f_ref, k_ref, _R=R)

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


def _pad_cols_to_tile(x):
    """Pad a channel-plane [C, M] array along M to a TILE multiple."""
    n = x.shape[1]
    pad = (-n) % TILE
    if pad:
        x = jnp.concatenate([x, jnp.zeros((x.shape[0], pad), x.dtype)], 1)
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
                (((0,), (0,)), ((), ())), precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
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
                (((0,), (0,)), ((), ())), precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
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


def _make_fwd_grad_rays_kernel(cfg, n_lin, n_samples):
    skip_in = tuple(cfg.get("skip_in", (4,)))
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    hp = jax.lax.Precision.HIGHEST

    def kernel(*refs):
        xs_ref = refs[0]
        g_ref, f_ref, k_ref = refs[1], refs[2], refs[3]
        ws = [refs[4 + i][:] for i in range(n_lin)]
        bs = [refs[4 + n_lin + i][:] for i in range(n_lin)]
        wts = [refs[4 + 2 * n_lin + i][:] for i in range(n_lin - 1)]
        w_last_col = refs[3 + 3 * n_lin][:]
        out_ref = refs[4 + 3 * n_lin]
        sdfbn_ref = refs[5 + 3 * n_lin]
        grad_ref = refs[6 + 3 * n_lin]

        scale = cfg.get("scale", 1.0)
        # xs arrives as (3, T) channel planes; PE reads it through an
        # exact transposed-lhs selection dot (see _PETile.from_planes)
        pe = _PETile.from_planes(xs_ref[:], scale, g_ref, f_ref, k_ref)
        xe = pe.xe()

        h = xe
        sigs = []
        for l in range(n_lin):
            inp = (jnp.concatenate([h, xe], axis=-1) * inv_sqrt2
                   if l in skip_in else h)
            z = _dot(inp, ws[l]) + bs[l]
            if l < n_lin - 1:
                h, sig = _act_pair(z)
                sigs.append(sig)
            else:
                h = z
        out = jnp.concatenate([h[:, :1] / scale, h[:, 1:]], axis=-1)
        out_ref[:] = out
        O, Smask = _ray_onehots(out.shape[0], n_samples)
        # sdf_bn[r, j] = out[r*N + j, 0]: exact one-hot contraction
        sdfbn_ref[:] = jax.lax.dot_general(
            O, out[:, :1] * Smask, (((0,), (0,)), ((), ())),
            precision=hp, preferred_element_type=jnp.float32)

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
        # scale * (1/scale) on the sdf column cancels: grad is wrt raw x.
        # Written as (3, T) planes: same contraction as (dj) @ G^T, with
        # the result transposed by swapping the dot_general operands.
        grad_ref[:] = jax.lax.dot_general(
            g_ref[:], d_inputs * pe.jac(), (((1,), (1,)), ((), ())),
            precision=hp)

    return kernel


def _make_bwd_rays_kernel(cfg, n_lin, n_samples):
    skip_in = tuple(cfg.get("skip_in", (4,)))
    S = skip_in[0] if skip_in else -1
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    hp = jax.lax.Precision.HIGHEST

    def kernel(*refs):
        xs_ref, ctout_ref, ctsdf_ref, ctgrad_ref = refs[:4]
        g_ref, f_ref, k_ref = refs[4], refs[5], refs[6]
        ws = [refs[7 + i][:] for i in range(n_lin)]
        bs = [refs[7 + n_lin + i][:] for i in range(n_lin)]
        wts = [refs[7 + 2 * n_lin + i][:] for i in range(n_lin)]
        xsbar_ref = refs[7 + 3 * n_lin]
        dws = [refs[8 + 3 * n_lin + i] for i in range(n_lin)]
        dbs = [refs[8 + 4 * n_lin + i] for i in range(n_lin)]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for l in range(n_lin):
                dws[l][:] = jnp.zeros_like(dws[l])
                dbs[l][:] = jnp.zeros_like(dbs[l])

        scale = cfg.get("scale", 1.0)
        # xs and ct_grad arrive as (3, T) channel planes
        pe = _PETile.from_planes(xs_ref[:], scale, g_ref, f_ref, k_ref)
        xe = pe.xe()
        jac = pe.jac()
        T = xe.shape[0]

        ct_out = ctout_ref[:]
        # ct_sdf [R, N] -> flat column [T, 1] via exact one-hot dots
        O, Smask = _ray_onehots(T, n_samples)
        ct_sdf = jnp.sum(
            jnp.dot(O, ctsdf_ref[:], precision=hp) * Smask,
            axis=1, keepdims=True)
        ybar = jnp.concatenate(
            [(ct_out[:, :1] + ct_sdf) / scale, ct_out[:, 1:]], axis=-1)
        # (ct_grad^T) @ G with the plane layout: contract the channel dim
        ct_grad_G = jax.lax.dot_general(
            ctgrad_ref[:], g_ref[:], (((0,), (0,)), ((), ())),
            precision=hp)
        gbar = ct_grad_G * jac                      # pe_jvp(xs, ct_grad)

        # forward, storing activations and sigmoids
        acts = []
        sigs = []
        h = xe
        for l in range(n_lin):
            inp = (jnp.concatenate([h, xe], axis=-1) * inv_sqrt2
                   if l == S else h)
            z = _dot(inp, ws[l]) + bs[l]
            if l < n_lin - 1:
                h, sig = _act_pair(z)
                acts.append(h)
                sigs.append(sig)

        # primal gradient chain, storing d_l and the full xe-cotangent
        # (d_inputs, needed for the PE second-derivative term)
        ds = [None] * n_lin
        ds[n_lin - 1] = jnp.broadcast_to(
            wts[n_lin - 1][0:1, :], (T, wts[n_lin - 1].shape[1]))
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
                (((0,), (0,)), ((), ())), precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
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
                (((0,), (0,)), ((), ())), precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
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
        # written as (3, T) planes (operand-swapped dot_general)
        xsbar = jax.lax.dot_general(
            g_ref[:], xebar * jac + ct_grad_G * d_inputs * pe.d2(),
            (((1,), (1,)), ((), ())), precision=hp)
        xsbar_ref[:] = xsbar * scale

    return kernel


@partial(jax.jit, static_argnames=("cfg_key", "n_samples"))
def _sdf_fwd_grad_rays_impl(ws, bs, x, cfg_key, n_samples):
    cfg = dict(cfg_key)
    n_lin = len(ws)
    d_out = cfg["d_out"]
    xs, n = _pad_cols_to_tile(x)              # x: [3, M] channel planes
    m_pad = xs.shape[1]
    grid = m_pad // TILE
    rays_per_tile = TILE // n_samples
    b_pad = m_pad // n_samples
    (G, f, kind), table_specs = _pe_table_specs(cfg["multires"])
    wts = [w.T for w in ws[:-1]]
    w_last_col = ws[-1][:, 0][None, :]
    kernel = _make_fwd_grad_rays_kernel(cfg, n_lin, n_samples)
    out, sdf_bn, grad = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((3, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)]
        + table_specs + _weight_specs(ws, bs)
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in wts]
        + [pl.BlockSpec(w_last_col.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((TILE, d_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rays_per_tile, n_samples), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, d_out), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, n_samples), jnp.float32),
            jax.ShapeDtypeStruct((3, m_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(xs, G, f, kind, *ws, *bs, *wts, w_last_col)
    return out[:n], sdf_bn[:n // n_samples], grad[:, :n]


@partial(jax.jit, static_argnames=("cfg_key", "n_samples"))
def _sdf_bwd_rays_impl(ws, bs, x, ct_out, ct_sdf, ct_grad, cfg_key,
                       n_samples):
    cfg = dict(cfg_key)
    n_lin = len(ws)
    d_out = cfg["d_out"]
    xs, n = _pad_cols_to_tile(x)              # x, ct_grad: [3, M] planes
    ctout_p, _ = _pad_to_tile(ct_out)
    ctgrad_p, _ = _pad_cols_to_tile(ct_grad)
    m_pad = xs.shape[1]
    b_pad = m_pad // n_samples
    ct_sdf_p = ct_sdf
    if ct_sdf_p.shape[0] != b_pad:
        ct_sdf_p = jnp.concatenate(
            [ct_sdf_p, jnp.zeros((b_pad - ct_sdf_p.shape[0], n_samples),
                                 ct_sdf_p.dtype)], 0)
    grid = m_pad // TILE
    rays_per_tile = TILE // n_samples
    (G, f, kind), table_specs = _pe_table_specs(cfg["multires"])
    wts = [w.T for w in ws]
    kernel = _make_bwd_rays_kernel(cfg, n_lin, n_samples)
    out_shapes = (
        [jax.ShapeDtypeStruct((3, m_pad), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs])
    out_specs = (
        [pl.BlockSpec((3, TILE), lambda i: (0, i),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in ws]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for b in bs])
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((3, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rays_per_tile, n_samples), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)]
        + table_specs + _weight_specs(ws, bs)
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in wts],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(xs, ctout_p, ct_sdf_p, ctgrad_p, G, f, kind, *ws, *bs, *wts)
    xbar = outs[0][:, :n]
    dws = list(outs[1:1 + n_lin])
    dbs = [b[0] for b in outs[1 + n_lin:]]
    return xbar, dws, dbs


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


@partial(jax.custom_vjp, nondiff_argnums=(1, 3))
def _sdf_rays_op(params, cfg_key, x, n_samples):
    ws, bs = _materialize(params, dict(cfg_key))
    return _sdf_fwd_grad_rays_impl(ws, bs, x, cfg_key, n_samples)


def _sdf_rays_fwd(params, cfg_key, x, n_samples):
    return _sdf_rays_op(params, cfg_key, x, n_samples), (params, x)


def _sdf_rays_bwd(cfg_key, n_samples, res, cts):
    params, x = res
    ct_out, ct_sdf, ct_grad = cts
    if os.environ.get("FMOV_FUSED_BWD", "1") == "0":
        # XLA reference oracle through the unfused nets
        cfg = dict(cfg_key)

        def ref(p, x_pl):
            pts = x_pl.T                      # [3, M] planes -> [M, 3]
            out = nets.sdf_apply(p, cfg, pts)
            grad = nets.sdf_gradient(p, cfg, pts)
            sdf_bn = out[:, 0].reshape(-1, n_samples)
            return out, sdf_bn, grad.T

        _, vjp = jax.vjp(ref, params, x)
        return vjp((ct_out, ct_sdf, ct_grad))
    (ws, bs), mat_vjp = jax.vjp(
        lambda p: _materialize(p, dict(cfg_key)), params)
    xbar, dws, dbs = _sdf_bwd_rays_impl(
        ws, bs, x, ct_out, ct_sdf, ct_grad, cfg_key, n_samples)
    (pbar,) = mat_vjp((dws, [db[None, :] for db in dbs]))
    return pbar, xbar


_sdf_rays_op.defvjp(_sdf_rays_fwd, _sdf_rays_bwd)


def sdf_apply_grad_fused_rays(params, cfg, x, n_samples: int):
    """(out [M, d_out], sdf_bn [M//n_samples, n_samples], grad [3, M])
    with PE and every PE-derivative chain fused in-kernel, and the
    backward taking naturally-shaped split cotangents.

    `x` is [3, M] CHANNEL PLANES (grad likewise): the [M, 3] layout
    tiles T(8,128) with the 3-wide minor dim padded to 128 lanes — 42x
    HBM traffic on every boundary crossing and every XLA glue pass
    around it (measured 25.5 ms/step at 1M samples, scripts/hlo_dump.py).
    Requires TILE % n_samples == 0 (each tile holds whole rays)."""
    return _sdf_rays_op(params, _cfg_key(cfg), x, n_samples)


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


def sdf_apply_grad_fused(params, cfg, x):
    """(out [N, d_out], grad [N, 3]) in one fused kernel, with a fused
    second-order backward (set FMOV_FUSED_BWD=0 for the XLA reference)."""
    return _sdf_apply_grad_op(params, _cfg_key(cfg), x)
