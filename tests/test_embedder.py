import jax.numpy as jnp
import numpy as np

from fmov_pose_tpu.core import embedder


def reference_pe_layout(x, multires):
    """Independent numpy oracle with the reference's concat order
    [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]."""
    freqs = 2.0 ** np.linspace(0.0, multires - 1, multires)
    blocks = [x]
    for f in freqs:
        blocks.append(np.sin(x * f))
        blocks.append(np.cos(x * f))
    return np.concatenate(blocks, axis=-1)


def test_pe_layout_and_values(rng):
    x = rng.normal(size=(7, 3)).astype(np.float32)
    out = np.asarray(embedder.positional_encode(jnp.asarray(x), multires=6))
    ref = reference_pe_layout(x, 6)
    assert out.shape == (7, embedder.embed_dim(6, 3))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_embed_dim():
    assert embedder.embed_dim(6, 3) == 39
    assert embedder.embed_dim(4, 3) == 27
    assert embedder.embed_dim(10, 4) == 84


def test_barf_weights_schedule():
    w0 = np.asarray(embedder.barf_weights(0.0, 6, (0.1, 0.5)))
    np.testing.assert_allclose(w0, 0.0, atol=1e-6)
    w1 = np.asarray(embedder.barf_weights(0.5, 6, (0.1, 0.5)))
    np.testing.assert_allclose(w1, 1.0, atol=1e-6)
    w_mid = np.asarray(embedder.barf_weights(0.3, 6, (0.1, 0.5)))
    assert (np.diff(w_mid) <= 1e-6).all()  # low freqs on first


def test_faithful_noop_barf():
    """The shipped reference never applies the c2f weights
    (barf_embedder.py:50-55); apply_c2f=False must reproduce that."""
    x = jnp.ones((4, 3))
    embed, _ = embedder.make_embedder(6, 3, barf_c2f=(0.1, 0.5), apply_c2f=False)
    out_lo = np.asarray(embed(x, 0.0))
    out_hi = np.asarray(embed(x, 1.0))
    np.testing.assert_array_equal(out_lo, out_hi)
    plain = np.asarray(embedder.positional_encode(x, 6))
    np.testing.assert_array_equal(out_lo, plain)


def test_applied_c2f_changes_output():
    x = jnp.ones((4, 3))
    embed, _ = embedder.make_embedder(6, 3, barf_c2f=(0.1, 0.5), apply_c2f=True)
    out_lo = np.asarray(embed(x, 0.0))
    out_hi = np.asarray(embed(x, 1.0))
    assert not np.allclose(out_lo, out_hi)
    # raw input passes through unweighted
    np.testing.assert_allclose(out_lo[:, :3], np.asarray(x), atol=1e-6)


def test_fourier_features(rng):
    b = jnp.asarray(rng.normal(scale=10.0, size=(128, 1)), jnp.float32)
    cid = jnp.asarray([[3.0]])
    feats = np.asarray(embedder.fourier_features(cid, b))
    assert feats.shape == (1, 256)
    ang = 2 * np.pi * 3.0 * np.asarray(b)[:, 0]
    ref = np.concatenate([np.sin(ang), np.cos(ang)]) / np.sqrt(128)
    np.testing.assert_allclose(feats[0], ref, atol=1e-5)
