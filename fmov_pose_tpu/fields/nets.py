"""Neural fields (SDF / color / background NeRF / variance), functional JAX.

TPU-first re-design of the reference field stack
(`/root/reference/models/fields.py`, `/root/reference/models/barf_fields.py`):

* Parameters are plain pytrees (nested dicts of jnp arrays); every network
  is a pure ``apply(params, ...)`` function. No mutable modules -> free
  jit/vmap/grad, donation-friendly, and `reset` is just re-running init.
* Weight normalization (torch ``nn.utils.weight_norm`` dim=0) is stored as
  (v, g) and materialized per call — XLA folds the row-normalize into the
  matmul epilogue.
* The Eikonal gradient uses one reverse-mode VJP (`sdf_gradient`) instead
  of the reference's double-backward `autograd.grad`
  (`fields.py:112-124`); JAX differentiates through it for the training
  loss automatically.
* BARF vs plain variants collapse into one implementation: the plain SDF
  network is the BARF one with `progress` ignored (the reference's BARF
  annealing is a no-op anyway, see core/embedder.py).

Shape/parity notes mirror `fields.py`:
  SDF: dims [39, 256 x 8, 257], skip at layer 4 (its producing linear has
  out 256-39), softplus(beta=100), output [sdf/scale, feat256].
  Color: IDR mode, in 3+27+3+256=289, 4 hidden 256, sigmoid out 3.
  NeRF: 8x256, skip {4}, viewdirs head (d_in=4 for the NeRF++ background).
  Variance: single scalar, inv_s = exp(10 v).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from fmov_pose_tpu.core.embedder import embed_dim, positional_encode

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# linear layers (optionally weight-normalized)
# ---------------------------------------------------------------------------


def _linear_params(w: np.ndarray, b: np.ndarray, weight_norm: bool) -> Params:
    w = np.asarray(w, np.float32)
    b = np.asarray(b, np.float32)
    if weight_norm:
        g = np.linalg.norm(w, axis=1)  # per-output-row norm (torch dim=0)
        return {"v": jnp.asarray(w), "g": jnp.asarray(g), "b": jnp.asarray(b)}
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


def linear_apply(p: Params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Weight-norm linear.

    With compute_dtype=bfloat16: bf16 x bf16 -> f32-accumulated matmul on
    the MXU AND the result is returned in bf16, so inter-layer activation
    buffers (the HBM bottleneck of this tiny-MLP workload) are half-width.
    Params and the bias add stay f32.
    """
    if "v" in p:
        v = p["v"]
        w = v * (p["g"] / (jnp.linalg.norm(v, axis=1) + 1e-12))[:, None]
    else:
        w = p["w"]
    if compute_dtype is not None:
        y = jax.lax.dot_general(
            x.astype(compute_dtype), w.T.astype(compute_dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y + p["b"]).astype(compute_dtype)
    return x @ w.T + p["b"]


def _torch_default_linear(key, d_in: int, d_out: int, weight_norm: bool) -> Params:
    """torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) + uniform bias."""
    kw, kb = jax.random.split(key)
    bound_w = math.sqrt(6.0 / ((1.0 + 5.0) * d_in))  # == 1/sqrt(d_in)
    w = jax.random.uniform(kw, (d_out, d_in), minval=-bound_w, maxval=bound_w)
    bound_b = 1.0 / math.sqrt(d_in)
    b = jax.random.uniform(kb, (d_out,), minval=-bound_b, maxval=bound_b)
    return _linear_params(np.asarray(w), np.asarray(b), weight_norm)


# ---------------------------------------------------------------------------
# SDF network
# ---------------------------------------------------------------------------


def _compute_dtype(cfg):
    d = cfg.get("compute_dtype")
    if d in (None, "float32", "f32"):
        return None
    return jnp.bfloat16 if d in ("bfloat16", "bf16") else jnp.dtype(d)


def sdf_dims(cfg) -> list:
    d_in = cfg["d_in"]
    in_dim = embed_dim(cfg["multires"], d_in) if cfg["multires"] > 0 else d_in
    return [in_dim] + [cfg["d_hidden"]] * cfg["n_layers"] + [cfg["d_out"]]


def init_sdf(key, cfg) -> Params:
    """Geometric (sphere) init per IDR (`fields.py:47-79`)."""
    dims = sdf_dims(cfg)
    skip_in = tuple(cfg.get("skip_in", (4,)))
    multires = cfg["multires"]
    bias = cfg.get("bias", 0.5)
    geometric = cfg.get("geometric_init", True)
    weight_norm = cfg.get("weight_norm", True)
    inside_outside = cfg.get("inside_outside", False)
    n_lin = len(dims) - 1

    layers = {}
    keys = jax.random.split(key, n_lin)
    for l in range(n_lin):
        out_dim = dims[l + 1] - dims[0] if (l + 1) in skip_in else dims[l + 1]
        in_dim = dims[l]
        if geometric:
            rng = np.random.default_rng(np.asarray(jax.random.key_data(keys[l])))
            if l == n_lin - 1:
                mean = math.sqrt(math.pi) / math.sqrt(dims[l])
                if inside_outside:
                    mean, b_val = -mean, bias
                else:
                    b_val = -bias
                w = rng.normal(mean, 1e-4, (out_dim, in_dim))
                b = np.full((out_dim,), b_val)
            elif multires > 0 and l == 0:
                w = np.zeros((out_dim, in_dim))
                w[:, :3] = rng.normal(0.0, math.sqrt(2) / math.sqrt(out_dim), (out_dim, 3))
                b = np.zeros((out_dim,))
            elif multires > 0 and l in skip_in:
                w = rng.normal(0.0, math.sqrt(2) / math.sqrt(out_dim), (out_dim, in_dim))
                w[:, -(dims[0] - 3):] = 0.0
                b = np.zeros((out_dim,))
            else:
                w = rng.normal(0.0, math.sqrt(2) / math.sqrt(out_dim), (out_dim, in_dim))
                b = np.zeros((out_dim,))
            layers[f"lin{l}"] = _linear_params(w, b, weight_norm)
        else:
            layers[f"lin{l}"] = _torch_default_linear(keys[l], in_dim, out_dim, weight_norm)
    return {"layers": layers}


def sdf_apply(params: Params, cfg, x: jnp.ndarray, progress=None) -> jnp.ndarray:
    """[N, 3] -> [N, d_out] = [sdf, feature...]. `progress` kept for the BARF
    API (`barf_fields.py:99-118`); annealing is behavior-faithful (no-op)."""
    del progress
    scale = cfg.get("scale", 1.0)
    multires = cfg["multires"]
    skip_in = tuple(cfg.get("skip_in", (4,)))
    dims = sdf_dims(cfg)
    n_lin = len(dims) - 1

    cdt = _compute_dtype(cfg)
    inputs = x * scale
    if multires > 0:
        inputs = positional_encode(inputs, multires)
    h = inputs
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    for l in range(n_lin):
        if l in skip_in:
            h = jnp.concatenate([h, inputs], axis=-1) * inv_sqrt2
        h = linear_apply(params["layers"][f"lin{l}"], h, cdt)
        if l < n_lin - 1:
            # softplus(beta=100) = softplus(100 x)/100, computed in f32
            # (fused pointwise), stored at compute_dtype
            h = jax.nn.softplus(100.0 * h.astype(jnp.float32)) / 100.0
            if cdt is not None:
                h = h.astype(cdt)
    h = h.astype(jnp.float32)
    return jnp.concatenate([h[..., :1] / scale, h[..., 1:]], axis=-1)


def sdf_only(params: Params, cfg, x: jnp.ndarray) -> jnp.ndarray:
    return sdf_apply(params, cfg, x)[..., :1]


def sdf_gradient(params: Params, cfg, x: jnp.ndarray) -> jnp.ndarray:
    """d sdf / d x via one VJP pass (each output row depends only on its own
    input row, so a summed-scalar grad equals the per-point gradient)."""
    grad_fn = jax.grad(lambda pts: sdf_only(params, cfg, pts).sum())
    return grad_fn(x)


# ---------------------------------------------------------------------------
# rendering (color) network — IDR style
# ---------------------------------------------------------------------------


def color_dims(cfg) -> list:
    d_in = cfg["d_in"] + cfg["d_feature"]
    if cfg.get("multires_view", 0) > 0:
        d_in += embed_dim(cfg["multires_view"], 3) - 3
    return [d_in] + [cfg["d_hidden"]] * cfg["n_layers"] + [cfg["d_out"]]


def init_color(key, cfg) -> Params:
    dims = color_dims(cfg)
    weight_norm = cfg.get("weight_norm", True)
    layers = {}
    keys = jax.random.split(key, len(dims) - 1)
    for l in range(len(dims) - 1):
        layers[f"lin{l}"] = _torch_default_linear(keys[l], dims[l], dims[l + 1], weight_norm)
    return {"layers": layers}


def color_apply(params, cfg, points, normals, view_dirs, feature, progress=None):
    del progress
    mode = cfg.get("mode", "idr")
    if cfg.get("multires_view", 0) > 0:
        view_dirs = positional_encode(view_dirs, cfg["multires_view"])
    if mode == "idr":
        h = jnp.concatenate([points, view_dirs, normals, feature], axis=-1)
    elif mode == "no_view_dir":
        h = jnp.concatenate([points, normals, feature], axis=-1)
    elif mode == "no_normal":
        h = jnp.concatenate([points, view_dirs, feature], axis=-1)
    else:
        raise ValueError(mode)
    n_lin = cfg["n_layers"] + 1
    cdt = _compute_dtype(cfg)
    for l in range(n_lin):
        h = linear_apply(params["layers"][f"lin{l}"], h, cdt)
        if l < n_lin - 1:
            h = jax.nn.relu(h)
    h = h.astype(jnp.float32)
    if cfg.get("squeeze_out", True):
        h = jax.nn.sigmoid(h)
    return h


# ---------------------------------------------------------------------------
# background NeRF (NeRF++ 4D inputs) — used when n_outside > 0
# ---------------------------------------------------------------------------


def init_nerf(key, cfg) -> Params:
    D, W = cfg["D"], cfg["W"]
    d_in, d_in_view = cfg["d_in"], cfg["d_in_view"]
    multires, multires_view = cfg.get("multires", 0), cfg.get("multires_view", 0)
    in_ch = embed_dim(multires, d_in) if multires > 0 else 3
    in_ch_view = embed_dim(multires_view, d_in_view) if multires_view > 0 else 3
    skips = tuple(cfg.get("skips", (4,)))

    n_keys = D + 4
    keys = jax.random.split(key, n_keys)
    k = iter(keys)
    pts_linears = [_torch_default_linear(next(k), in_ch, W, False)]
    for i in range(D - 1):
        din = W + in_ch if i in skips else W
        pts_linears.append(_torch_default_linear(next(k), din, W, False))
    return {
        "pts": {f"lin{i}": p for i, p in enumerate(pts_linears)},
        "views0": _torch_default_linear(next(k), in_ch_view + W, W // 2, False),
        "feature": _torch_default_linear(next(k), W, W, False),
        "alpha": _torch_default_linear(next(k), W, 1, False),
        "rgb": _torch_default_linear(next(k), W // 2, 3, False),
    }


def nerf_apply(params, cfg, input_pts, input_views):
    """Returns (alpha/density, rgb) like `fields.py:260-283` (use_viewdirs)."""
    D = cfg["D"]
    skips = tuple(cfg.get("skips", (4,)))
    if cfg.get("multires", 0) > 0:
        input_pts = positional_encode(input_pts, cfg["multires"])
    if cfg.get("multires_view", 0) > 0:
        input_views = positional_encode(input_views, cfg["multires_view"])
    cdt = _compute_dtype(cfg)
    h = input_pts
    for i in range(D):
        h = jax.nn.relu(linear_apply(params["pts"][f"lin{i}"], h, cdt))
        if i in skips:
            h = jnp.concatenate([input_pts, h], axis=-1)
    alpha = linear_apply(params["alpha"], h, cdt)
    feature = linear_apply(params["feature"], h, cdt)
    h = jnp.concatenate([feature, input_views.astype(feature.dtype)], axis=-1)
    h = jax.nn.relu(linear_apply(params["views0"], h, cdt))
    rgb = linear_apply(params["rgb"], h, cdt)
    return alpha.astype(jnp.float32), rgb.astype(jnp.float32)


# ---------------------------------------------------------------------------
# single-variance network
# ---------------------------------------------------------------------------


def init_variance(cfg) -> Params:
    return {"variance": jnp.asarray(float(cfg["init_val"]), dtype=jnp.float32)}


def variance_inv_s(params) -> jnp.ndarray:
    """inv_s = exp(10 * v), clipped like `renderer.py:290`."""
    return jnp.clip(jnp.exp(params["variance"] * 10.0), 1e-6, 1e6)
