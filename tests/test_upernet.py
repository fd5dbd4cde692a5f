"""Shape-contract tests for the native UPerNet stack, replacing the
reference's __main__ smoke tests (models/networks.py:320-410)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinomc_tpu.models import layers
from dinomc_tpu.models.upernet import UPerNetConfig, dino_pyramid, init_upernet, upernet_forward

# Fast-suite config: 3-layer vit_test backbone at 64 px. The decoder code
# paths (pyramid build, PSP, FPN fusion, BN, aux head, interpolation) are
# identical to the full config; the 12-layer vit_tiny@224 reference-shape
# contract runs as a slow test below (it alone cost ~2.5 min of the fast
# suite on XLA:CPU).
CFG = UPerNetConfig(
    num_classes=8, arch="vit_test", patch_size=8, out_indices=(0, 1, 2, 2)
)
DIM, SZ, HF = 32, 64, 64 // 8


@pytest.fixture(scope="module")
def model():
    params, state = init_upernet(jax.random.PRNGKey(0), CFG)
    return params, state


def test_pyramid_shapes(model):
    """Reference smoke test expects pyramid (B, D, 2Hf, Hf, Hf/2, Hf/4)
    (networks.py:320-410) — ours is NHWC."""
    params, _ = model
    x = jnp.ones((2, SZ, SZ, 3))
    pyr = dino_pyramid(params["backbone"], x, CFG)
    assert [p.shape for p in pyr] == [
        (2, 2 * HF, 2 * HF, DIM),
        (2, HF, HF, DIM),
        (2, HF // 2, HF // 2, DIM),
        (2, HF // 4, HF // 4, DIM),
    ]


@pytest.mark.slow
def test_pyramid_shapes_full_vit_tiny():
    """Full-size contract: vit_tiny@224, taps (3,5,7,11) (networks.py:320-410)."""
    cfg = UPerNetConfig(num_classes=8, arch="vit_tiny", patch_size=8)
    params, _ = init_upernet(jax.random.PRNGKey(0), cfg)
    pyr = dino_pyramid(params["backbone"], jnp.ones((1, 224, 224, 3)), cfg)
    hf = 224 // 8
    assert [p.shape for p in pyr] == [
        (1, 2 * hf, 2 * hf, 192),
        (1, hf, hf, 192),
        (1, hf // 2, hf // 2, 192),
        (1, hf // 4, hf // 4, 192),
    ]


def test_forward_logits_shape(model):
    params, state = model
    x = jnp.ones((2, SZ, SZ, 3))
    logits, _ = upernet_forward(params, state, x, CFG)
    assert logits.shape == (2, SZ, SZ, 8)
    assert logits.dtype == jnp.float32


def test_forward_with_aux(model):
    params, state = model
    x = jnp.ones((1, SZ, SZ, 3))
    logits, new_state, aux = upernet_forward(
        params, state, x, CFG, train=True, rng=jax.random.PRNGKey(1), with_aux=True
    )
    assert logits.shape == (1, SZ, SZ, 8)
    assert aux.shape == (1, SZ, SZ, 8)
    # BN state must update in train mode
    old = np.asarray(state["fusion"]["bn"]["mean"])
    new = np.asarray(new_state["fusion"]["bn"]["mean"])
    assert not np.allclose(old, new)


def test_eval_mode_bn_state_frozen(model):
    params, state = model
    x = jax.random.normal(jax.random.PRNGKey(2), (1, SZ, SZ, 3))
    _, new_state = upernet_forward(params, state, x, CFG, train=False)
    np.testing.assert_array_equal(
        np.asarray(state["fusion"]["bn"]["mean"]),
        np.asarray(new_state["fusion"]["bn"]["mean"]),
    )


def test_alternate_input_size(model):
    """Bigger seg inputs must work via pos-embed interpolation (SURVEY §5.7)."""
    params, state = model
    x = jnp.ones((1, 96, 96, 3))
    logits, _ = upernet_forward(params, state, x, CFG)
    assert logits.shape == (1, 96, 96, 8)


def test_fpn_neck_variant():
    cfg = UPerNetConfig(
        num_classes=6, arch="vit_test", patch_size=8,
        out_indices=(0, 1, 2, 2), use_fpn_neck=True,
    )
    params, state = init_upernet(jax.random.PRNGKey(3), cfg)
    logits, _ = upernet_forward(params, state, jnp.ones((1, SZ, SZ, 3)), cfg)
    assert logits.shape == (1, SZ, SZ, 6)


def test_adaptive_avg_pool_matches_torch():
    import torch

    x = np.random.RandomState(0).randn(1, 13, 13, 4).astype(np.float32)
    ours = np.asarray(layers.adaptive_avg_pool(jnp.asarray(x), 6))
    ref = (
        torch.nn.AdaptiveAvgPool2d(6)(torch.tensor(x).permute(0, 3, 1, 2))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_batchnorm_matches_torch():
    import torch

    x = np.random.RandomState(1).randn(4, 8, 8, 3).astype(np.float32)
    p, s = layers.bn_init(3)
    y, ns = layers.bn_apply(p, s, jnp.asarray(x), train=True)
    tbn = torch.nn.BatchNorm2d(3, momentum=0.1)
    ty = tbn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), ty, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ns["mean"]), tbn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(ns["var"]), tbn.running_var.numpy(), atol=1e-4)
