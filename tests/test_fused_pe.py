"""Matmul-form positional encoding (ops/fused_sdf.py lane-friendly PE)
vs the loop-form oracles and core.embedder.positional_encode.

The matmul form exists because 3-wide slice/concat materialization at the
pallas boundary pads 42x on TPU (measured 60 -> 26 ms on the fwd+grad
wrapper); it must be numerically identical (selection dots have a single
nonzero per column, frequencies are powers of two).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmov_pose_tpu.core.embedder import positional_encode
from fmov_pose_tpu.ops import fused_sdf

L = 6


@pytest.fixture
def arrs(rng):
    xs = jnp.asarray(rng.normal(size=(33, 3)).astype(np.float32))
    di = jnp.asarray(rng.normal(size=(33, 3 * (1 + 2 * L))).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(33, 3)).astype(np.float32))
    return xs, di, ct


def test_pe_mm_matches_positional_encode(arrs):
    xs, _, _ = arrs
    a = fused_sdf._pe_mm(xs, L)
    b = positional_encode(xs, L)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_pe_vjp_mm(arrs):
    xs, di, _ = arrs
    a = fused_sdf._pe_vjp_mm(xs, di, L)
    b = fused_sdf._pe_vjp(xs, di, L)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_pe_jvp_mm(arrs):
    xs, _, ct = arrs
    a = fused_sdf._pe_jvp_mm(xs, ct, L)
    b = fused_sdf._pe_jvp(xs, ct, L)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_pe_second_mm(arrs):
    xs, di, ct = arrs
    a = fused_sdf._pe_second_mm(xs, di, ct, L)
    b = fused_sdf._pe_second_term(xs, di, ct, L)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-4)


def test_pe_vjp_mm_is_transpose_of_jvp(arrs):
    """<J t, d> == <t, J^T d> for random tangent/cotangent pairs."""
    xs, di, ct = arrs
    lhs = jnp.vdot(fused_sdf._pe_jvp_mm(xs, ct, L), di)
    rhs = jnp.vdot(ct, fused_sdf._pe_vjp_mm(xs, di, L))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)
