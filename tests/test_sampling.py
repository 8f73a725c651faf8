import jax
import jax.numpy as jnp
import numpy as np

from fmov_pose_tpu.core.sampling import sample_pdf


def brute_force_inverse_cdf(bins, weights, n_samples):
    """Independent numpy oracle for the det=True path."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros_like(pdf[..., :1]), np.cumsum(pdf, -1)], -1)
    u = np.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
    out = np.zeros(bins.shape[:-1] + (n_samples,))
    for b in range(bins.shape[0]):
        inds = np.searchsorted(cdf[b], u, side="right")
        below = np.maximum(inds - 1, 0)
        above = np.minimum(inds, cdf.shape[-1] - 1)
        denom = cdf[b][above] - cdf[b][below]
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u - cdf[b][below]) / denom
        out[b] = bins[b][below] + t * (bins[b][above] - bins[b][below])
    return out


def test_matches_bruteforce(rng):
    bins = np.sort(rng.uniform(0, 4, size=(5, 33)), axis=-1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(5, 32)).astype(np.float32)
    out = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 16))
    ref = brute_force_inverse_cdf(bins, weights, 16)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_concentrates_on_heavy_bin():
    bins = jnp.linspace(0.0, 1.0, 33)[None, :]
    weights = jnp.zeros((1, 32)).at[0, 16].set(100.0)
    out = np.asarray(sample_pdf(bins, weights, 64))
    # nearly all samples fall inside the heavy bin [0.5, 0.53125]
    frac = ((out >= 0.5) & (out <= 0.53125 + 1e-6)).mean()
    assert frac > 0.9


def test_uniform_weights_spread():
    bins = jnp.linspace(0.0, 1.0, 9)[None, :]
    weights = jnp.ones((1, 8))
    out = np.asarray(sample_pdf(bins, weights, 8))
    np.testing.assert_allclose(np.diff(out[0]), 1.0 / 8, atol=1e-2)


def test_random_mode_in_range(rng):
    bins = jnp.linspace(2.0, 3.0, 17)[None, :].repeat(4, axis=0)
    weights = jnp.asarray(rng.uniform(size=(4, 16)), jnp.float32)
    out = np.asarray(sample_pdf(bins, weights, 32, key=jax.random.key(0)))
    assert (out >= 2.0).all() and (out <= 3.0).all()


def test_jittable():
    f = jax.jit(lambda b, w: sample_pdf(b, w, 16))
    bins = jnp.linspace(0, 1, 33)[None, :]
    weights = jnp.ones((1, 32))
    assert f(bins, weights).shape == (1, 16)
