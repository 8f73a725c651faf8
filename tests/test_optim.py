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
    np.testing.assert_array_equal(np.asarray(new_st.mu["w"])[1], 0.0)
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
