"""Tests for ResNet-50/WRN-50-2 and Swin-T backbones."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinomc_tpu.models import resnet, swin


TINY_RN = resnet.ResNetConfig(
    stage_sizes=(1, 1, 1, 1), compute_dtype=jnp.float32
)


def test_resnet_feature_shapes():
    params, state = resnet.init_resnet(jax.random.PRNGKey(0), TINY_RN)
    x = jnp.ones((1, 64, 64, 3))
    feats, pooled, _ = resnet.resnet_features(params, state, x, TINY_RN)
    # channels 64/256/512/1024/2048 at strides 2/4/8/16/32
    assert [f.shape for f in feats] == [
        (1, 32, 32, 64),
        (1, 16, 16, 256),
        (1, 8, 8, 512),
        (1, 4, 4, 1024),
        (1, 2, 2, 2048),
    ]
    assert pooled.shape == (1, 2048)


def test_wide_resnet_width():
    cfg = resnet.ResNetConfig(
        stage_sizes=(1, 1, 1, 1), width_per_group=128, compute_dtype=jnp.float32
    )
    params, _ = resnet.init_resnet(jax.random.PRNGKey(0), cfg)
    # wide: first-stage 3x3 conv has width 128 (vs 64 for standard)
    assert params["layer1"][0]["conv2"]["conv"]["kernel"].shape == (3, 3, 128, 128)
    assert TINY_RN.out_dim == cfg.out_dim == 2048


def test_resnet_bn_state_updates_in_train():
    params, state = resnet.init_resnet(jax.random.PRNGKey(1), TINY_RN)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    _, _, ns = resnet.resnet_features(params, state, x, TINY_RN, train=True)
    assert not np.allclose(
        np.asarray(ns["stem"]["bn"]["mean"]), np.asarray(state["stem"]["bn"]["mean"])
    )
    _, _, ns_eval = resnet.resnet_features(params, state, x, TINY_RN, train=False)
    np.testing.assert_array_equal(
        np.asarray(ns_eval["stem"]["bn"]["mean"]),
        np.asarray(state["stem"]["bn"]["mean"]),
    )


def test_resnet_classifier_head():
    cfg = resnet.ResNetConfig(
        stage_sizes=(1, 1, 1, 1), num_classes=10, compute_dtype=jnp.float32
    )
    params, state = resnet.init_resnet(jax.random.PRNGKey(3), cfg)
    logits, _ = resnet.resnet_forward(params, state, jnp.ones((2, 32, 32, 3)), cfg)
    assert logits.shape == (2, 10)


TINY_SWIN = swin.SwinConfig(
    embed_dim=16, depths=(1, 1), num_heads=(2, 4), window=4,
    compute_dtype=jnp.float32,
)


def test_swin_forward_shape():
    params = swin.init_swin(jax.random.PRNGKey(0), TINY_SWIN)
    out = swin.swin_forward(params, jnp.ones((2, 32, 32, 3)), TINY_SWIN)
    assert out.shape == (2, TINY_SWIN.out_dim)
    assert TINY_SWIN.out_dim == 32


def test_swin_non_divisible_input():
    """Feature maps not divisible by the window must be padded+masked
    (e.g. 104px multi-crop -> 26x26 at stride 4)."""
    params = swin.init_swin(jax.random.PRNGKey(0), TINY_SWIN)
    out = swin.swin_forward(params, jnp.ones((1, 40, 56, 3)), TINY_SWIN)
    assert out.shape == (1, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_swin_padding_does_not_leak():
    """A padded forward on content identical to an exact-fit forward must
    give close results for the overlapping content region: compare a 32x32
    image against the same image padded into 36x36 canvas is NOT equivalent
    (pool area differs) — instead check determinism + finite grads."""
    params = swin.init_swin(jax.random.PRNGKey(1), TINY_SWIN)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 36, 36, 3))
    o1 = swin.swin_forward(params, x, TINY_SWIN)
    o2 = swin.swin_forward(params, x, TINY_SWIN)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


@pytest.mark.slow  # shifted-window grad graph costs ~45 s to compile on CPU
def test_swin_padded_grads_finite():
    params = swin.init_swin(jax.random.PRNGKey(1), TINY_SWIN)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 36, 36, 3))
    g = jax.grad(lambda p: swin.swin_forward(p, x, TINY_SWIN).sum())(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_swin_t_full_config():
    cfg = swin.swin_t()
    assert cfg.out_dim == 768
    assert cfg.depths == (2, 2, 6, 2)


def test_swin_drop_path():
    """Swin stochastic depth (torchvision swin_t trains with
    stochastic_depth_prob=0.2 implicitly in the reference): deterministic
    given rng, off in eval, applied in train."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dinomc_tpu.models import swin as sw

    cfg = sw.SwinConfig(embed_dim=16, depths=(2, 2), num_heads=(2, 4),
                        compute_dtype=jnp.float32, drop_path_rate=0.5)
    params = sw.init_swin(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 32, 32, 3))
    rng = jax.random.PRNGKey(2)
    a = sw.swin_forward(params, x, cfg, deterministic=False, rng=rng)
    b = sw.swin_forward(params, x, cfg, deterministic=False, rng=rng)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    c = sw.swin_forward(params, x, cfg)
    assert not np.allclose(np.asarray(a), np.asarray(c), atol=1e-5)
