"""Tests for the on-device augmentation ops (dino_augmentation.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinomc_tpu.ops import augment


@pytest.fixture(scope="module")
def imgs():
    return jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 3))


def test_random_resized_crop_shape_and_range(imgs):
    out = augment.random_resized_crop(
        jax.random.PRNGKey(1), imgs, 32, (0.32, 1.0)
    )
    assert out.shape == (4, 32, 32, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_rrc_full_scale_is_resize():
    """scale=(1,1), ratio=(1,1) must reproduce a plain resize."""
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    out = augment.random_resized_crop(
        jax.random.PRNGKey(3), x, 32, (1.0, 1.0), ratio=(1.0, 1.0)
    )
    expected = jax.image.resize(x, (2, 32, 32, 3), "bicubic")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.clip(expected, 0, 1)), atol=1e-4
    )


def test_hflip_all_or_nothing(imgs):
    flipped = augment.random_hflip(jax.random.PRNGKey(4), imgs, p=1.0)
    np.testing.assert_array_equal(np.asarray(flipped), np.asarray(imgs[:, :, ::-1, :]))
    same = augment.random_hflip(jax.random.PRNGKey(4), imgs, p=0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(imgs))


def test_grayscale_channels_equal(imgs):
    g = augment.random_grayscale(jax.random.PRNGKey(5), imgs, p=1.0)
    np.testing.assert_allclose(np.asarray(g[..., 0]), np.asarray(g[..., 1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g[..., 1]), np.asarray(g[..., 2]), atol=1e-6)


def test_solarize(imgs):
    s = augment.random_solarize(jax.random.PRNGKey(6), imgs, p=1.0)
    expected = np.where(np.asarray(imgs) >= 128 / 255, 1 - np.asarray(imgs), np.asarray(imgs))
    np.testing.assert_allclose(np.asarray(s), expected, atol=1e-6)


def test_gaussian_blur_preserves_mean_and_smooths(imgs):
    b = augment.gaussian_blur(jax.random.PRNGKey(7), imgs, p=1.0)
    assert b.shape == imgs.shape
    np.testing.assert_allclose(
        float(b.mean()), float(imgs.mean()), rtol=0.02
    )
    # blurring reduces total variation
    tv = lambda x: float(jnp.abs(jnp.diff(x, axis=1)).mean())
    assert tv(b) < tv(imgs)


def test_color_jitter_identity_at_zero(imgs):
    out = augment.color_jitter(jax.random.PRNGKey(8), imgs, 0.0, 0.0, 0.0, 0.0, p=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)


def test_hsv_roundtrip():
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 8, 8, 3))
    rt = augment._hsv_to_rgb(augment._rgb_to_hsv(x))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x), atol=1e-5)


def test_normalize_roundtrip(imgs):
    n = augment.normalize(imgs)
    d = augment.denormalize(n)
    np.testing.assert_allclose(np.asarray(d), np.asarray(imgs), atol=1e-6)


def test_multicrop_shapes(imgs):
    cfg = augment.MultiCropConfig(
        global_size=32, local_sizes=(24, 16), local_scale=(0.05, 0.32)
    )
    g, locals_ = augment.multicrop_augment(jax.random.PRNGKey(10), imgs, cfg)
    assert g.shape == (2, 4, 32, 32, 3)
    assert len(locals_) == 2
    assert locals_[0].shape == (4, 24, 24, 3)
    assert locals_[1].shape == (4, 16, 16, 3)


def test_multicrop_tp_shapes(imgs):
    cfg = augment.MultiCropConfig(global_size=32, local_sizes=(16,))
    temporal = jnp.stack([imgs, imgs, imgs, imgs], axis=0)
    g, locals_ = augment.multicrop_augment_tp(jax.random.PRNGKey(11), temporal, cfg)
    assert g.shape == (3, 4, 32, 32, 3)
    assert len(locals_) == 1 and locals_[0].shape == (4, 16, 16, 3)


def test_views_are_distinct(imgs):
    cfg = augment.MultiCropConfig(global_size=32, local_sizes=(16,))
    g, _ = augment.multicrop_augment(jax.random.PRNGKey(12), imgs, cfg)
    assert not np.allclose(np.asarray(g[0]), np.asarray(g[1]))
