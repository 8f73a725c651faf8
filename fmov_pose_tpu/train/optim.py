"""Functional Adam optimizers with dynamic LR and segment masking.

The reference uses one torch Adam for the field networks plus one Adam
*per pose segment*, stepped only on iterations that touch that segment
(`exp_runner.py:258-262, 793-816`), each with its own cosine LR
(`exp_runner.py:1064-1087`).  Freezing is requires_grad mutation.

TPU equivalents (no recompilation, all state as arrays):

* ``adam`` — plain Adam whose learning rate is a traced argument.
  Feeding zero grads reproduces torch's `zero_grad(); step()` drift
  (moments decay, params still move by momentum) — needed for the
  `detach_mesh_at_warm_up` semantics (`exp_runner.py:804-811`).
* ``seg_adam`` — Adam over a bank whose leaves have a leading segment
  axis [S, ...].  Per-step inputs: a 0/1 ``touch`` mask (which segment
  optimizers `.step()` this iteration) and per-segment LRs.  Moments and
  step counts update only where touched — exactly N independent Adams.
* Freeze masks (requires_grad equivalents) are applied to the *gradients*
  before the update (`mask_grads``), so a frozen segment/leaf gets the
  zero-grad momentum-drift behavior, matching torch.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

B1, B2, EPS = 0.9, 0.999, 1e-8


class AdamState(NamedTuple):
    """Adam moments over ONE raveled [P] buffer (not a params-shaped tree).

    The per-leaf tree update launches ~2 tiny fused kernels per leaf —
    ~150 dispatches for the ~75-leaf phase-2 param tree, measured ~7 ms
    of the step (scripts/phase2_probe.py).  Raveling params/grads once
    (a single concat; its vjp is the slice-split XLA fuses into the
    consumers) turns the whole update into a handful of [P]-wide
    elementwise kernels.  Per-element math is unchanged, so torch-Adam
    parity (scripts/parity_check.py, 20 tracked steps) still holds
    bitwise per leaf."""
    step: jnp.ndarray
    mu: jnp.ndarray   # [P]
    nu: jnp.ndarray   # [P]


def adam_init(params) -> AdamState:
    flat, _ = ravel_pytree(params)
    assert flat.dtype == jnp.float32, (
        f"flat Adam assumes f32 params (got {flat.dtype}); mixed-dtype "
        "trees would silently promote through ravel_pytree")
    return AdamState(step=jnp.zeros((), jnp.int32),
                     mu=jnp.zeros_like(flat), nu=jnp.zeros_like(flat))


def adam_update(grads, state: AdamState, params, lr):
    flat_g, _ = ravel_pytree(grads)
    return adam_update_flat(flat_g, state, params, lr)


def adam_update_flat(flat_g, state: AdamState, params, lr):
    """Adam step from an already-raveled (and gated) [P] gradient."""
    flat_p, unravel = ravel_pytree(params)
    step = state.step + 1
    mu = B1 * state.mu + (1 - B1) * flat_g
    nu = B2 * state.nu + (1 - B2) * flat_g * flat_g
    bc1 = 1 - B1 ** step.astype(jnp.float32)
    bc2 = 1 - B2 ** step.astype(jnp.float32)
    new_flat = flat_p - lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + EPS)
    return unravel(new_flat), AdamState(step=step, mu=mu, nu=nu)


def ensure_flat_adam(opt: AdamState) -> AdamState:
    """Migrate a checkpointed tree-form AdamState (pre flat-Adam) to the
    raveled form; a no-op on already-flat states."""
    if hasattr(opt.mu, "ndim") and opt.mu.ndim == 1:
        return opt
    flat_mu, _ = ravel_pytree(opt.mu)
    flat_nu, _ = ravel_pytree(opt.nu)
    return AdamState(step=jnp.asarray(opt.step), mu=flat_mu, nu=flat_nu)


# ---------------------------------------------------------------------------
# segment-bank Adam
# ---------------------------------------------------------------------------


class SegAdamState(NamedTuple):
    """Per-segment Adam moments over ONE raveled [P] bank buffer (same
    rationale as AdamState: the per-leaf form cost ~1-2 ms/step in tiny
    kernels, a large slice of the 3.7 ms batch-512 step).  step stays
    [S]; per-position segment scalars come from static index gathers."""
    step: jnp.ndarray  # [S] per-segment step counts
    mu: jnp.ndarray    # [P]
    nu: jnp.ndarray    # [P]


def seg_adam_init(bank_params, n_segments: int) -> SegAdamState:
    for leaf in jax.tree_util.tree_leaves(bank_params):
        assert leaf.shape[0] == n_segments, (
            f"bank leaf {leaf.shape} does not lead with the segment axis "
            f"({n_segments})")
    flat, _ = ravel_pytree(bank_params)
    return SegAdamState(
        step=jnp.zeros((n_segments,), jnp.int32),
        mu=jnp.zeros_like(flat), nu=jnp.zeros_like(flat))


def seg_index(bank_params):
    """Static int32 [P] vector: the segment id owning each raveled
    position (bank leaves are [S, ...], row-major ravel is
    segment-major).  Built from shapes at trace time — a constant."""
    import numpy as _np
    parts = [
        _np.repeat(_np.arange(leaf.shape[0], dtype=_np.int32),
                   int(_np.prod(leaf.shape[1:], dtype=_np.int64)))
        for leaf in jax.tree_util.tree_leaves(bank_params)
    ]
    return (_np.concatenate(parts) if parts
            else _np.zeros((0,), _np.int32))


def seg_adam_update(grads, state: SegAdamState, params, touch, seg_lr):
    """touch: [S] 0/1 — which segment optimizers step; seg_lr: [S] LRs."""
    flat_g, _ = ravel_pytree(grads)
    return seg_adam_update_flat(flat_g, state, params, touch, seg_lr)


def seg_adam_update_flat(flat_g, state: SegAdamState, params, touch,
                         seg_lr):
    """Segment-bank Adam from an already-raveled (and gated) gradient.

    Elementwise math identical to the pre-flat per-leaf form: the [S]
    per-segment scalars (touch, bias corrections, LR) reach each
    position through a static-index gather instead of a broadcast."""
    flat_p, unravel = ravel_pytree(params)
    idx = seg_index(params)
    touch_f = touch.astype(jnp.float32)
    step = state.step + touch.astype(jnp.int32)
    stepf = jnp.maximum(step.astype(jnp.float32), 1.0)
    bc1 = 1 - B1 ** stepf  # [S]
    bc2 = 1 - B2 ** stepf
    t = touch_f[idx]
    m_new = jnp.where(t > 0, B1 * state.mu + (1 - B1) * flat_g, state.mu)
    v_new = jnp.where(t > 0, B2 * state.nu + (1 - B2) * flat_g * flat_g,
                      state.nu)
    delta = (m_new / bc1[idx]) / (jnp.sqrt(v_new / bc2[idx]) + EPS)
    p_new = flat_p - seg_lr[idx] * t * delta
    return unravel(p_new), SegAdamState(step=step, mu=m_new, nu=v_new)


def ensure_flat_seg_adam(opt: SegAdamState) -> SegAdamState:
    """Migrate a checkpointed tree-form SegAdamState to raveled form."""
    if hasattr(opt.mu, "ndim") and opt.mu.ndim == 1:
        return opt
    flat_mu, _ = ravel_pytree(opt.mu)
    flat_nu, _ = ravel_pytree(opt.nu)
    return SegAdamState(step=jnp.asarray(opt.step), mu=flat_mu, nu=flat_nu)


def _bcast_seg(x, leaf):
    return x.reshape((-1,) + (1,) * (leaf.ndim - 1))


def mask_grads(grads, scale):
    """Multiply every leaf by a scalar/broadcastable mask (freeze = 0)."""
    return jax.tree_util.tree_map(lambda g: g * scale, grads)


def mask_seg_grads(grads, seg_mask):
    """Per-segment freeze mask [S] applied over the leading axis."""
    return jax.tree_util.tree_map(lambda g: g * _bcast_seg(seg_mask, g), grads)
