import jax
import jax.numpy as jnp
import numpy as np

from fmov_pose_tpu.core.sampling import merge_sorted, sample_pdf


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


def test_degenerate_weights_match_bruteforce(rng):
    """Edge regimes for the compare-all searchsorted: leading/trailing
    zero-weight runs (exercises the count==0 / count==N clamps), a
    single spike, and all-zero weights (1e-5 floor -> uniform)."""
    B, N = 4, 32
    cases = np.zeros((B, N), np.float32)
    cases[0, N - 1] = 50.0          # all mass in the last bin
    cases[1, 0] = 50.0              # all mass in the first bin
    cases[2, :] = 0.0               # all-zero -> floor-uniform
    cases[3, 5:9] = [1, 9, 9, 1]    # interior plateau
    bins = np.sort(rng.uniform(0, 4, size=(B, N + 1)), -1).astype(np.float32)
    out = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(cases), 16))
    ref = brute_force_inverse_cdf(bins, cases, 16)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # samples always stay inside the bin range
    assert (out >= bins[:, :1] - 1e-6).all()
    assert (out <= bins[:, -1:] + 1e-6).all()


def test_tied_cdf_values_match_bruteforce(rng):
    """Exactly-tied cdf plateaus (zero-weight bins between spikes): the
    masked min/max selection must pick the same bin edges searchsorted
    does."""
    B, N = 3, 16
    w = np.zeros((B, N), np.float32)
    w[:, 3] = 10.0
    w[:, 11] = 10.0                  # long exact plateau between spikes
    bins = np.tile(np.linspace(1.0, 3.0, N + 1,
                               dtype=np.float32), (B, 1))
    out = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(w), 24))
    ref = brute_force_inverse_cdf(bins, w, 24)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_jittable():
    f = jax.jit(lambda b, w: sample_pdf(b, w, 16))
    bins = jnp.linspace(0, 1, 33)[None, :]
    weights = jnp.ones((1, 32))
    assert f(bins, weights).shape == (1, 16)


def _argsort_merge(z_a, z_b, v_a=None, v_b=None):
    """Oracle: the reference cat_z_vals recipe (argsort + take_along_axis)."""
    z_all = np.concatenate([z_a, z_b], -1)
    idx = np.argsort(z_all, axis=-1, kind="stable")
    z_sorted = np.take_along_axis(z_all, idx, -1)
    if v_a is None:
        return z_sorted
    v_all = np.concatenate([v_a, v_b], -1)
    return z_sorted, np.take_along_axis(v_all, idx, -1)


def test_merge_sorted_matches_argsort(rng):
    z_a = np.sort(rng.uniform(0, 4, size=(7, 24)), -1).astype(np.float32)
    z_b = np.sort(rng.uniform(0, 4, size=(7, 9)), -1).astype(np.float32)
    v_a = rng.normal(size=z_a.shape).astype(np.float32)
    v_b = rng.normal(size=z_b.shape).astype(np.float32)
    z, v = merge_sorted(jnp.asarray(z_a), jnp.asarray(z_b),
                        jnp.asarray(v_a), jnp.asarray(v_b))
    z_ref, v_ref = _argsort_merge(z_a, z_b, v_a, v_b)
    np.testing.assert_allclose(np.asarray(z), z_ref, atol=0)
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=0)


def test_merge_sorted_ties_stable():
    # duplicate values across the two lists: a's entries come first,
    # payloads must follow the same stable order as argsort over concat
    z_a = jnp.asarray([[0.0, 1.0, 1.0, 2.0]])
    z_b = jnp.asarray([[1.0, 2.0]])
    v_a = jnp.asarray([[10.0, 11.0, 12.0, 13.0]])
    v_b = jnp.asarray([[20.0, 21.0]])
    z, v = merge_sorted(z_a, z_b, v_a, v_b)
    z_ref, v_ref = _argsort_merge(np.asarray(z_a), np.asarray(z_b),
                                  np.asarray(v_a), np.asarray(v_b))
    np.testing.assert_array_equal(np.asarray(z), z_ref)
    np.testing.assert_array_equal(np.asarray(v), v_ref)


def test_merge_sorted_no_payload(rng):
    z_a = np.sort(rng.uniform(0, 1, size=(3, 16)), -1).astype(np.float32)
    z_b = np.sort(rng.uniform(0, 1, size=(3, 16)), -1).astype(np.float32)
    z = merge_sorted(jnp.asarray(z_a), jnp.asarray(z_b))
    np.testing.assert_allclose(np.asarray(z), _argsort_merge(z_a, z_b), atol=0)
