"""Tests for the DINO projection head (vision_transformer.py:260-294 parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from dinomc_tpu.models.dino_head import DINOHeadConfig, dino_head_forward, init_dino_head


def _cfg(**kw):
    base = dict(
        in_dim=32, out_dim=128, hidden_dim=64, bottleneck_dim=16,
        compute_dtype=jnp.float32,
    )
    base.update(kw)
    return DINOHeadConfig(**base)


def test_shapes():
    cfg = _cfg()
    params = init_dino_head(jax.random.PRNGKey(0), cfg)
    out = dino_head_forward(params, jnp.ones((4, 32)), cfg)
    assert out.shape == (4, 128)


def test_weight_norm_g_scales_logits():
    """Doubling g doubles logits (weight-norm semantics)."""
    cfg = _cfg()
    params = init_dino_head(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32))
    out1 = dino_head_forward(params, x, cfg)
    params2 = dict(params)
    params2["last_layer"] = {
        "v": params["last_layer"]["v"],
        "g": params["last_layer"]["g"] * 2.0,
    }
    out2 = dino_head_forward(params2, x, cfg)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1) * 2.0, rtol=1e-5)


def test_direction_scale_invariance():
    """Scaling v rows must NOT change the output (v is normalized)."""
    cfg = _cfg()
    params = init_dino_head(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32))
    out1 = dino_head_forward(params, x, cfg)
    params2 = dict(params)
    params2["last_layer"] = {
        "v": params["last_layer"]["v"] * 5.0,
        "g": params["last_layer"]["g"],
    }
    out2 = dino_head_forward(params2, x, cfg)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), rtol=1e-4, atol=1e-5)


def test_bottleneck_l2_normalized():
    """Logit magnitude bounded by ||W_col|| when inputs are huge (bottleneck
    is L2-normalized before the last layer)."""
    cfg = _cfg()
    params = init_dino_head(jax.random.PRNGKey(0), cfg)
    small = dino_head_forward(params, jnp.ones((1, 32)), cfg)
    large = dino_head_forward(params, jnp.ones((1, 32)) * 1e4, cfg)
    # scale-invariance of normalized bottleneck through homogeneous MLP is not
    # exact (bias terms), but outputs must stay bounded by g=1 row norms.
    assert float(jnp.abs(large).max()) <= 1.0 + 1e-4
    assert float(jnp.abs(small).max()) <= 1.0 + 1e-4


def test_use_bn_variant():
    cfg = _cfg(use_bn=True)
    params = init_dino_head(jax.random.PRNGKey(0), cfg)
    out = dino_head_forward(params, jax.random.normal(jax.random.PRNGKey(2), (8, 32)), cfg)
    assert out.shape == (8, 128)
    assert "bn_scale" in params["mlp_0"]
