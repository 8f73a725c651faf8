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

B1, B2, EPS = 0.9, 0.999, 1e-8


class AdamState(NamedTuple):
    step: jnp.ndarray
    mu: Any
    nu: Any


def adam_init(params) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                     nu=jax.tree_util.tree_map(jnp.zeros_like, params))


def adam_update(grads, state: AdamState, params, lr):
    step = state.step + 1
    mu = jax.tree_util.tree_map(lambda m, g: B1 * m + (1 - B1) * g, state.mu, grads)
    nu = jax.tree_util.tree_map(lambda v, g: B2 * v + (1 - B2) * g * g, state.nu, grads)
    bc1 = 1 - B1 ** step.astype(jnp.float32)
    bc2 = 1 - B2 ** step.astype(jnp.float32)
    new_params = jax.tree_util.tree_map(
        lambda p, m, v: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + EPS),
        params, mu, nu)
    return new_params, AdamState(step=step, mu=mu, nu=nu)


# ---------------------------------------------------------------------------
# segment-bank Adam
# ---------------------------------------------------------------------------


class SegAdamState(NamedTuple):
    step: jnp.ndarray  # [S] per-segment step counts
    mu: Any            # leaves [S, ...]
    nu: Any


def seg_adam_init(bank_params, n_segments: int) -> SegAdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, bank_params)
    return SegAdamState(
        step=jnp.zeros((n_segments,), jnp.int32), mu=zeros,
        nu=jax.tree_util.tree_map(jnp.zeros_like, bank_params))


def _bcast_seg(x, leaf):
    return x.reshape((-1,) + (1,) * (leaf.ndim - 1))


def seg_adam_update(grads, state: SegAdamState, params, touch, seg_lr):
    """touch: [S] 0/1 — which segment optimizers step; seg_lr: [S] LRs."""
    touch_f = touch.astype(jnp.float32)
    step = state.step + touch.astype(jnp.int32)
    stepf = jnp.maximum(step.astype(jnp.float32), 1.0)
    bc1 = 1 - B1 ** stepf  # [S]
    bc2 = 1 - B2 ** stepf

    def upd(p, m, v, g):
        t = _bcast_seg(touch_f, p)
        m_new = jnp.where(t > 0, B1 * m + (1 - B1) * g, m)
        v_new = jnp.where(t > 0, B2 * v + (1 - B2) * g * g, v)
        delta = (m_new / _bcast_seg(bc1, p)) / (
            jnp.sqrt(v_new / _bcast_seg(bc2, p)) + EPS)
        p_new = p - _bcast_seg(seg_lr, p) * t * delta
        return p_new, m_new, v_new

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_g = treedef.flatten_up_to(grads)
    new_p, new_m, new_v = [], [], []
    for p, m, v, g in zip(flat_p, flat_m, flat_v, flat_g):
        pn, mn, vn = upd(p, m, v, g)
        new_p.append(pn)
        new_m.append(mn)
        new_v.append(vn)
    return (
        jax.tree_util.tree_unflatten(treedef, new_p),
        SegAdamState(step=step,
                     mu=jax.tree_util.tree_unflatten(treedef, new_m),
                     nu=jax.tree_util.tree_unflatten(treedef, new_v)),
    )


def mask_grads(grads, scale):
    """Multiply every leaf by a scalar/broadcastable mask (freeze = 0)."""
    return jax.tree_util.tree_map(lambda g: g * scale, grads)


def mask_seg_grads(grads, seg_mask):
    """Per-segment freeze mask [S] applied over the leading axis."""
    return jax.tree_util.tree_map(lambda g: g * _bcast_seg(seg_mask, g), grads)
