"""Optimizer parity tests (train/optim.py) against torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dinomc_tpu.train import optim


def test_wd_mask_excludes_bias_and_1d():
    params = {
        "layer": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "norm": {"scale": jnp.ones((4,))},
        "pos_embed": jnp.ones((1, 5, 4)),
    }
    m = optim.wd_mask(params)
    assert float(m["layer"]["kernel"]) == 1.0
    assert float(m["layer"]["bias"]) == 0.0
    assert float(m["norm"]["scale"]) == 0.0  # 1-D
    assert float(m["pos_embed"]) == 1.0  # >1-D, reference regularizes it


def test_clip_per_tensor_matches_reference_formula():
    g = {"a": jnp.full((10,), 3.0), "b": jnp.full((4,), 0.01)}
    clipped = optim.clip_gradients_per_tensor(g, clip=3.0)
    # ||a|| = 9.49 > 3 -> scaled by 3/9.49; ||b|| tiny -> untouched
    norm_a = float(jnp.linalg.norm(g["a"]))
    np.testing.assert_allclose(
        np.asarray(clipped["a"]), 3.0 * 3.0 / (norm_a + 1e-6), rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(clipped["b"]), np.asarray(g["b"]))


def test_adamw_matches_torch_multi_step():
    rng = np.random.RandomState(0)
    w0 = rng.randn(6, 4).astype(np.float32)
    b0 = rng.randn(4).astype(np.float32)
    grads_seq = [
        {"w": rng.randn(6, 4).astype(np.float32), "b": rng.randn(4).astype(np.float32)}
        for _ in range(4)
    ]
    lr, wd = 1e-2, 0.1

    # torch: per-param-group wd (bias excluded), AdamW semantics
    tw = torch.nn.Parameter(torch.tensor(w0))
    tb = torch.nn.Parameter(torch.tensor(b0))
    opt = torch.optim.AdamW(
        [{"params": [tw], "weight_decay": wd}, {"params": [tb], "weight_decay": 0.0}],
        lr=lr, betas=(0.9, 0.999), eps=1e-8,
    )
    for g in grads_seq:
        tw.grad = torch.tensor(g["w"])
        tb.grad = torch.tensor(g["b"])
        opt.step()

    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    state = optim.adamw_init(params)
    mask = optim.wd_mask(params)
    for g in grads_seq:
        params, state = optim.adamw_update(
            jax.tree_util.tree_map(jnp.asarray, g), state, params,
            jnp.float32(lr), jnp.float32(wd), mask,
        )
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(), atol=1e-5)


def test_sgd_matches_torch():
    rng = np.random.RandomState(1)
    w0 = rng.randn(5, 3).astype(np.float32)
    grads_seq = [rng.randn(5, 3).astype(np.float32) for _ in range(3)]
    lr, wd, mom = 0.1, 0.01, 0.9

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([tw], lr=lr, momentum=mom, weight_decay=wd)
    for g in grads_seq:
        tw.grad = torch.tensor(g)
        opt.step()

    params = {"w": jnp.asarray(w0)}
    state = optim.sgd_init(params)
    mask = optim.wd_mask(params)
    for g in grads_seq:
        params, state = optim.sgd_update(
            {"w": jnp.asarray(g)}, state, params,
            jnp.float32(lr), jnp.float32(wd), mask, momentum=mom,
        )
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-5)


def test_lars_trust_ratio_applies_only_to_regularized():
    params = {"w": jnp.ones((4, 4)) * 2.0, "b": jnp.ones((4,))}
    grads = {"w": jnp.ones((4, 4)) * 0.5, "b": jnp.ones((4,)) * 0.5}
    state = optim.lars_init(params)
    mask = optim.wd_mask(params)
    new_params, _ = optim.lars_update(
        grads, state, params, jnp.float32(0.1), jnp.float32(0.0), mask,
        momentum=0.0, eta=0.001,
    )
    # w: update scaled by eta*||p||/||g|| = 0.001*8/2 = 0.004 -> tiny step
    np.testing.assert_allclose(
        np.asarray(new_params["w"]), 2.0 - 0.1 * 0.5 * 0.004, rtol=1e-4
    )
    # b: raw SGD step (no trust ratio)
    np.testing.assert_allclose(np.asarray(new_params["b"]), 1.0 - 0.05, rtol=1e-5)


def test_frozen_mask_pins_params():
    params = {"w": jnp.ones((3, 3)), "g": jnp.ones((3,))}
    grads = {"w": jnp.ones((3, 3)), "g": jnp.ones((3,))}
    state = optim.adamw_init(params)
    frozen = {"w": jnp.asarray(0.0), "g": jnp.asarray(1.0)}
    new_params, _ = optim.adamw_update(
        grads, state, params, jnp.float32(0.1), jnp.float32(0.0),
        optim.wd_mask(params), frozen_mask=frozen,
    )
    np.testing.assert_array_equal(np.asarray(new_params["g"]), 1.0)
    assert not np.allclose(np.asarray(new_params["w"]), 1.0)
