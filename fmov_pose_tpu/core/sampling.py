"""Inverse-CDF importance sampling, vectorized for TPU.

Rewrite of the NeRF `sample_pdf` (`/root/reference/models/renderer.py:54-86`)
with identical numerics (1e-5 weight floor, right-side bisection, denom
clamp) but a TPU-native formulation: the reference's binary-search
`searchsorted` becomes a branch-free compare-all.  Gathers (and
`jnp.searchsorted`'s scan of dynamic-slices) serialize badly on TPU —
measured 18.5 ms for 4 calls at [8192, 128]x16 in the phase-2 train step
— while the [B, N, M] comparison + masked min/max reductions fuse into a
couple of VPU passes with zero indexed loads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sample_pdf", "merge_sorted"]


def merge_sorted(z_a: jnp.ndarray, z_b: jnp.ndarray,
                 v_a: jnp.ndarray | None = None,
                 v_b: jnp.ndarray | None = None):
    """Merge two per-ray ascending arrays, gather-free.

    Equivalent to argsort(concat([z_a, z_b])) + take_along_axis (the
    reference's `cat_z_vals`, `renderer.py:222-242`) for already-sorted
    inputs, including argsort's stable tie order (all of z_a before z_b).
    TPU-native: merge ranks come from compare-all counts and the output is
    assembled by one-hot contraction — XLA sorts and gathers at [8192, 128]
    measured 2+ ms per merge in the phase-2 step; this fuses to VPU
    compare/reduce passes.

    v_a/v_b: optional per-sample payloads (e.g. SDF values) carried through
    the same permutation. Returns z_merged or (z_merged, v_merged).

    Implementation: XLA variadic stable sort over the concat. Unlike
    argsort + take_along_axis this never materializes indices or gathers
    (the payload rides the sorting network), and unlike the previous
    one-hot-contraction merge it materializes no [B, K, K] one-hots
    (~460 MB at the last phase-2 merge; sort measured 1.66 vs 2.04 ms at
    [8192, 112+16] on v5e). Values pass through untouched — exact. A
    stable sort keeps ties in concat order (all of z_a before z_b),
    matching argsort's tie behavior; as a bonus, unsorted inputs now
    produce a correct sorted merge instead of silent corruption.
    """
    z = jnp.concatenate([z_a, z_b], axis=-1)
    if v_a is None:
        return jax.lax.sort(z, dimension=-1, is_stable=True)
    v = jnp.concatenate([v_a, v_b], axis=-1)
    return jax.lax.sort((z, v), dimension=-1, num_keys=1, is_stable=True)


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Draw n_samples per ray from the piecewise-constant pdf over bins.

    bins: [B, N] bin edges (z values); weights: [B, N-1] bin weights.
    key=None -> deterministic mid-stratified samples (det=True path,
    the only mode the reference renderer uses, `renderer.py:219`).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, N]

    if key is None:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        # Sorted so the output is per-ray ascending like the det path:
        # merge_sorted (cat_z_vals) silently corrupts on unsorted input,
        # so a future perturbed-importance-sampling caller stays safe.
        u = jnp.sort(jax.random.uniform(key, cdf.shape[:-1] + (n_samples,)),
                     axis=-1)

    # searchsorted(side="right") without gathers:
    #   below = clamp(count(cdf <= u) - 1, 0), above = clamp(count, N-1)
    #   cdf/bins at `below` = masked max (cdf is nondecreasing, >= 0)
    #   cdf/bins at `above` = masked min
    # `bins` is monotone with cdf per ray, so the same masks select the
    # matching bin edges — no index materialization at all.
    le = cdf[..., :, None] <= u[..., None, :]              # [B, N, M]
    count = jnp.sum(le, axis=-2)                           # [B, M]
    n = cdf.shape[-1]
    neg = jnp.float32(-jnp.inf)
    pos = jnp.float32(jnp.inf)

    cdf_e = cdf[..., :, None]
    bins_e = bins[..., :, None]
    cdf_b = jnp.max(jnp.where(le, cdf_e, neg), axis=-2)
    bins_b = jnp.max(jnp.where(le, bins_e, neg), axis=-2)
    cdf_a = jnp.min(jnp.where(le, pos, cdf_e), axis=-2)
    bins_a = jnp.min(jnp.where(le, pos, bins_e), axis=-2)

    # count == 0  -> below = above = 0;  count == N -> above = N-1
    first_cdf = cdf[..., :1]
    first_bin = bins[..., :1]
    last_cdf = cdf[..., -1:]
    last_bin = bins[..., -1:]
    empty_lo = count == 0
    empty_hi = count == n
    cdf_b = jnp.where(empty_lo, first_cdf, cdf_b)
    bins_b = jnp.where(empty_lo, first_bin, bins_b)
    cdf_a = jnp.where(empty_hi, last_cdf, cdf_a)
    bins_a = jnp.where(empty_hi, last_bin, bins_a)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)
