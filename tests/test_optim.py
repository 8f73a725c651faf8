import jax
import jax.numpy as jnp
import numpy as np

from fmov_pose_tpu.train import optim


def test_adam_matches_torch_reference():
    """One-parameter quadratic: compare against torch.optim.Adam (cpu)."""
    import torch

    x_t = torch.tensor([1.0, -2.0], requires_grad=True)
    opt_t = torch.optim.Adam([x_t], lr=0.1)
    x_j = jnp.asarray([1.0, -2.0])
    st = optim.adam_init(x_j)
    for _ in range(20):
        opt_t.zero_grad()
        loss = (x_t**2).sum()
        loss.backward()
        opt_t.step()
        g = 2 * x_j
        x_j, st = optim.adam_update(g, st, x_j, 0.1)
    np.testing.assert_allclose(np.asarray(x_j), x_t.detach().numpy(),
                               atol=5e-4)


def test_adam_zero_grad_still_drifts():
    """torch zero_grad+step semantics: momentum keeps moving params."""
    x = jnp.asarray([1.0])
    st = optim.adam_init(x)
    x, st = optim.adam_update(jnp.asarray([2.0]), st, x, 0.1)
    x1 = float(x[0])
    x, st = optim.adam_update(jnp.asarray([0.0]), st, x, 0.1)
    assert float(x[0]) != x1  # moved despite zero grad


def test_seg_adam_touch_isolation():
    """Untouched segments: params, moments, and steps stay frozen."""
    params = {"w": jnp.ones((3, 4))}
    st = optim.seg_adam_init(params, 3)
    grads = {"w": jnp.ones((3, 4))}
    touch = jnp.asarray([1.0, 0.0, 1.0])
    lr = jnp.asarray([0.1, 0.1, 0.2])
    new_params, new_st = optim.seg_adam_update(grads, st, params, touch, lr)
    w = np.asarray(new_params["w"])
    np.testing.assert_array_equal(w[1], 1.0)  # untouched
    assert (w[0] < 1.0).all() and (w[2] < 1.0).all()
    assert np.asarray(new_st.step).tolist() == [1, 0, 1]
    # moments live in one raveled buffer; segment 1 of the [3,4] leaf
    np.testing.assert_array_equal(
        np.asarray(new_st.mu).reshape(3, 4)[1], 0.0)
    # per-segment lr scaling: segment 2 moved twice as far
    np.testing.assert_allclose(1.0 - w[2], 2 * (1.0 - w[0]), rtol=1e-4)


def test_seg_adam_equals_independent_adams():
    """A bank of segment Adams == independent torch Adams per segment."""
    import torch

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(2, 5)).astype(np.float32)
    torch_params = [torch.tensor(w0[i].copy(), requires_grad=True)
                    for i in range(2)]
    torch_opts = [torch.optim.Adam([p], lr=0.05) for p in torch_params]

    params = {"w": jnp.asarray(w0)}
    st = optim.seg_adam_init(params, 2)
    schedule = [(1, 0), (1, 1), (0, 1), (1, 0), (1, 1)]
    for t0, t1 in schedule:
        grads_np = np.stack([2 * np.asarray(params["w"])[i] for i in range(2)])
        for i, t in enumerate((t0, t1)):
            if t:
                torch_opts[i].zero_grad()
                torch_params[i].grad = torch.tensor(
                    2 * torch_params[i].detach().numpy())
                torch_opts[i].step()
        params, st = optim.seg_adam_update(
            {"w": jnp.asarray(grads_np)}, st, params,
            jnp.asarray([float(t0), float(t1)]), jnp.asarray([0.05, 0.05]))
    for i in range(2):
        np.testing.assert_allclose(np.asarray(params["w"])[i],
                                   torch_params[i].detach().numpy(), atol=5e-4)


def test_mask_grads():
    g = {"a": jnp.ones(3), "b": {"c": jnp.ones(2)}}
    z = optim.mask_grads(g, 0.0)
    assert float(z["a"].sum()) == 0.0
    seg = optim.mask_seg_grads({"w": jnp.ones((2, 3))}, jnp.asarray([1.0, 0.0]))
    np.testing.assert_array_equal(np.asarray(seg["w"])[1], 0.0)


def test_flat_adam_equals_per_leaf_tree_adam():
    """The raveled Adam (one [P] buffer) must reproduce the per-leaf
    tree update exactly — same formula, different kernel count."""
    rng = np.random.default_rng(1)
    params = {"a": jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32)),
              "b": {"c": jnp.asarray(rng.normal(size=(5,)).astype(np.float32)),
                    "d": jnp.asarray(rng.normal(size=()).astype(np.float32))}}
    st = optim.adam_init(params)
    # reference: the pre-flat per-leaf formula
    tree_mu = jax.tree_util.tree_map(jnp.zeros_like, params)
    tree_nu = jax.tree_util.tree_map(jnp.zeros_like, params)
    tree_p = params
    B1, B2, EPS = optim.B1, optim.B2, optim.EPS
    for i in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: 0.3 * p + float(i), tree_p)
        # f32 bias correction, exactly as the pre-flat implementation
        # computed it (step.astype(float32))
        stepf = jnp.asarray(i + 1, jnp.float32)
        tree_mu = jax.tree_util.tree_map(
            lambda m, g: B1 * m + (1 - B1) * g, tree_mu, grads)
        tree_nu = jax.tree_util.tree_map(
            lambda v, g: B2 * v + (1 - B2) * g * g, tree_nu, grads)
        bc1, bc2 = 1 - B1 ** stepf, 1 - B2 ** stepf
        tree_p = jax.tree_util.tree_map(
            lambda p, m, v: p - 0.07 * (m / bc1) / (jnp.sqrt(v / bc2) + EPS),
            tree_p, tree_mu, tree_nu)
        grads_flat_side = jax.tree_util.tree_map(
            lambda p: 0.3 * p + float(i), params)
        params, st = optim.adam_update(grads_flat_side, st, params, 0.07)
    for k_ref, k_new in zip(jax.tree_util.tree_leaves(tree_p),
                            jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(k_ref), np.asarray(k_new))


def test_ensure_flat_adam_migrates_tree_state():
    """Old checkpoints stored params-shaped moment trees."""
    params = {"a": jnp.ones((2, 3)), "b": jnp.arange(4, dtype=jnp.float32)}
    st = optim.adam_init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    params2, st2 = optim.adam_update(g, st, params, 0.1)
    # fake a legacy tree-form state with the same moment VALUES
    from jax.flatten_util import ravel_pytree
    _, unravel = ravel_pytree(params)
    legacy = optim.AdamState(step=st2.step, mu=unravel(st2.mu),
                             nu=unravel(st2.nu))
    migrated = optim.ensure_flat_adam(legacy)
    assert migrated.mu.ndim == 1
    np.testing.assert_array_equal(np.asarray(migrated.mu),
                                  np.asarray(st2.mu))
    # idempotent on already-flat states
    again = optim.ensure_flat_adam(migrated)
    assert again.mu is migrated.mu


def test_flat_gate_matches_sequential_tree_gating():
    """_apply_updates' one-shot gate vector vs the old sequential
    mask_grads + pose gate + emphasize_rot head gate, over every 0/1
    combination of (main_update, pose_update, trans_head_on)."""
    from jax.flatten_util import ravel_pytree

    from fmov_pose_tpu.train.step import _flat_gate_masks

    rng = np.random.default_rng(2)
    params = {
        "sdf": {"lin0": {"w": jnp.asarray(
            rng.normal(size=(4, 4)).astype(np.float32))}},
        "pose": {
            "lin1": {"w": jnp.asarray(
                rng.normal(size=(3, 3)).astype(np.float32))},
            "lin3_trans": {"w": jnp.asarray(
                rng.normal(size=(3,)).astype(np.float32))},
            "lin3_scale": {"w": jnp.asarray(
                rng.normal(size=(3,)).astype(np.float32))},
        },
    }
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(
            rng.normal(size=p.shape).astype(np.float32)), params)
    m_pose, m_trans, m_scale = _flat_gate_masks(params)
    flat_g, _ = ravel_pytree(grads)

    for main in (0.0, 1.0):
        for pose in (0.0, 1.0):
            for head in (0.0, 1.0):
                # old sequential tree gating (pre flat-Adam _apply_updates)
                g = jax.tree_util.tree_map(lambda x: x * main, grads)
                safe = main if main > 0 else 1.0

                def gate_fn(path, x):
                    top = path[0].key
                    if top in ("pose", "se3_refine"):
                        return x / safe * pose
                    return x

                g = jax.tree_util.tree_map_with_path(gate_fn, g)

                def head_fn(path, x):
                    if path[0].key == "pose":
                        if path[1].key == "lin3_trans":
                            return x * 0.0
                        if path[1].key == "lin3_scale":
                            return x * head
                    return x

                g = jax.tree_util.tree_map_with_path(head_fn, g)
                want, _ = ravel_pytree(g)

                pose_gate = pose if main > 0 else 0.0
                gate = main * (1.0 - m_pose) + pose_gate * m_pose
                gate = (gate * (1.0 - m_trans - m_scale)
                        + pose_gate * head * m_scale)
                np.testing.assert_array_equal(
                    np.asarray(flat_g * gate), np.asarray(want),
                    err_msg=f"main={main} pose={pose} head={head}")


def test_flat_seg_adam_equals_per_leaf_form():
    """Raveled segment-bank Adam vs the old per-leaf broadcast form,
    over a multi-leaf bank with mixed shapes and a touch schedule."""
    from jax.flatten_util import ravel_pytree

    rng = np.random.default_rng(3)
    bank = {"lin0": {"w": jnp.asarray(
                rng.normal(size=(3, 4, 5)).astype(np.float32)),
                     "b": jnp.asarray(
                rng.normal(size=(3, 5)).astype(np.float32))},
            "scalep": jnp.asarray(rng.normal(size=(3,)).astype(np.float32))}
    st = optim.seg_adam_init(bank, 3)
    B1, B2, EPS = optim.B1, optim.B2, optim.EPS

    def bcast(x, leaf):
        return x.reshape((-1,) + (1,) * (leaf.ndim - 1))

    ref_p = bank
    ref_mu = jax.tree_util.tree_map(jnp.zeros_like, bank)
    ref_nu = jax.tree_util.tree_map(jnp.zeros_like, bank)
    ref_step = jnp.zeros((3,), jnp.int32)
    params = bank
    lr = jnp.asarray([0.05, 0.1, 0.2])
    for i, touch in enumerate(([1., 0., 1.], [1., 1., 0.], [0., 1., 1.])):
        touch = jnp.asarray(touch)
        grads = jax.tree_util.tree_map(lambda p: 0.5 * p + i, ref_p)
        # old per-leaf reference
        touch_f = touch.astype(jnp.float32)
        ref_step = ref_step + touch.astype(jnp.int32)
        stepf = jnp.maximum(ref_step.astype(jnp.float32), 1.0)
        bc1, bc2 = 1 - B1 ** stepf, 1 - B2 ** stepf

        def upd(p, m, v, g):
            t = bcast(touch_f, p)
            m_new = jnp.where(t > 0, B1 * m + (1 - B1) * g, m)
            v_new = jnp.where(t > 0, B2 * v + (1 - B2) * g * g, v)
            delta = (m_new / bcast(bc1, p)) / (
                jnp.sqrt(v_new / bcast(bc2, p)) + EPS)
            return p - bcast(lr, p) * t * delta, m_new, v_new

        out = jax.tree_util.tree_map(upd, ref_p, ref_mu, ref_nu, grads)
        ref_p = jax.tree_util.tree_map(lambda o: o[0], out,
                                       is_leaf=lambda x: isinstance(x, tuple))
        ref_mu = jax.tree_util.tree_map(lambda o: o[1], out,
                                        is_leaf=lambda x: isinstance(x, tuple))
        ref_nu = jax.tree_util.tree_map(lambda o: o[2], out,
                                        is_leaf=lambda x: isinstance(x, tuple))
        grads2 = jax.tree_util.tree_map(lambda p: 0.5 * p + i, params)
        params, st = optim.seg_adam_update(grads2, st, params, touch, lr)

    for a, b in zip(jax.tree_util.tree_leaves(ref_p),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    flat_ref_mu, _ = ravel_pytree(ref_mu)
    np.testing.assert_array_equal(np.asarray(flat_ref_mu),
                                  np.asarray(st.mu))
    np.testing.assert_array_equal(np.asarray(ref_step), np.asarray(st.step))
