"""Positional / Fourier encoders, vectorized for TPU.

Replaces the per-frequency lambda lists of the reference
(`/root/reference/models/embedder.py:7-55`,
`/root/reference/models/barf_embedder.py:6-75`) with a single broadcasted
sin/cos over a frequency-band tensor — one fused VPU op instead of 2*L
kernel launches.

Layout note: the reference concatenates per-frequency blocks as
[x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...] where each block has
the full input dim.  We keep that exact layout so geometric-init slicing
(zeroing PE channels, `fields.py:65,74`) stays index-compatible.

BARF coarse-to-fine: the reference computes annealing weights but never
multiplies them in (`barf_embedder.py:50-55` appends the unweighted
features) — a shipped no-op.  `apply_c2f=False` (default) reproduces that
behavior exactly; `apply_c2f=True` implements the intended BARF weighting.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

__all__ = ["embed_dim", "positional_encode", "barf_weights", "make_embedder",
           "fourier_features"]


def embed_dim(multires: int, input_dims: int = 3, include_input: bool = True) -> int:
    return input_dims * (int(include_input) + 2 * multires)


def _freq_bands(multires: int, log_sampling: bool = True) -> jnp.ndarray:
    max_freq = multires - 1
    if log_sampling:
        return 2.0 ** jnp.linspace(0.0, float(max_freq), multires)
    return jnp.linspace(1.0, 2.0**max_freq, multires)


def positional_encode(
    x: jnp.ndarray,
    multires: int,
    include_input: bool = True,
    log_sampling: bool = True,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """NeRF positional encoding [..., d] -> [..., d*(1 + 2*multires)].

    weights: optional [multires] per-frequency multipliers (BARF c2f).
    """
    freqs = _freq_bands(multires, log_sampling)  # [L]
    xb = x[..., None, :] * freqs[:, None]  # [..., L, d]
    # interleave sin/cos per frequency: [..., L, 2, d]
    sc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    if weights is not None:
        sc = sc * weights[:, None, None]
    sc = sc.reshape(x.shape[:-1] + (2 * multires * x.shape[-1],))
    if include_input:
        return jnp.concatenate([x, sc], axis=-1)
    return sc


def barf_weights(progress, multires: int, c2f=(0.1, 0.5)) -> jnp.ndarray:
    """BARF coarse-to-fine per-frequency weights (`barf_embedder.py:39-48`)."""
    start, end = c2f
    alpha = (progress - start) / (end - start) * multires
    k = jnp.arange(multires, dtype=jnp.float32)
    return (1.0 - jnp.cos(jnp.clip(alpha - k, 0.0, 1.0) * jnp.pi)) / 2.0


def make_embedder(
    multires: int,
    input_dims: int = 3,
    barf_c2f=None,
    apply_c2f: bool = False,
):
    """Returns (embed_fn, out_dim).

    Plain mode: embed_fn(x).  BARF mode (barf_c2f given): embed_fn(x, progress);
    with apply_c2f=False the progress argument is accepted but ignored,
    faithfully reproducing the reference's dead annealing path.
    """
    out = embed_dim(multires, input_dims)
    if barf_c2f is None:
        return partial(positional_encode, multires=multires), out

    def embed(x, progress):
        if apply_c2f:
            w = barf_weights(progress, multires, barf_c2f)
            return positional_encode(x, multires, weights=w)
        return positional_encode(x, multires)

    return embed, out


def fourier_features(cam_id: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Gaussian-Fourier features of a (scalar or batched) camera index.

    Mirrors the pose-MLP encoder (`picture_pose.py:147-153`):
    [sin(2*pi*id @ b.T), cos(2*pi*id @ b.T)] / sqrt(embed_dim).

    cam_id: [..., 1] float; b: [E, 1] fixed gaussian bands.
    Returns [..., 2E].
    """
    ang = (2.0 * jnp.pi * cam_id) @ b.T  # [..., E]
    feats = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return feats / jnp.sqrt(jnp.asarray(b.shape[0], dtype=feats.dtype))
