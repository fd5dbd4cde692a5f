"""Segmentation train-step tests (train_dino_mc_seg.py parity: decoder-only
fine-tune, DiceCE loss)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # seg train-step integration + overfit run

from dinomc_tpu.models.upernet import UPerNetConfig
from dinomc_tpu.train.seg_trainer import (
    SegConfig,
    init_seg_train_state,
    seg_predict,
    seg_train_step,
)

CFG = SegConfig(
    model=UPerNetConfig(num_classes=4, arch="vit_tiny", patch_size=8),
    train_backbone=False,
    train_decoder=True,
)


@pytest.fixture(scope="module")
def batch():
    k = jax.random.PRNGKey(0)
    images = jax.random.normal(k, (2, 64, 64, 3))
    masks = jax.random.randint(jax.random.PRNGKey(1), (2, 64, 64), 0, 4)
    return images, masks


def test_step_runs_and_backbone_frozen(batch):
    state = init_seg_train_state(jax.random.PRNGKey(2), CFG)
    images, masks = batch
    bb0 = np.asarray(state.params["backbone"]["patch_embed"]["kernel"])
    cls0 = np.asarray(state.params["classifier"]["kernel"])
    state, metrics = seg_train_step(
        state, images, masks, jnp.float32(3e-4), jnp.float32(1e-4), CFG
    )
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["patch_embed"]["kernel"]), bb0
    )
    assert not np.allclose(np.asarray(state.params["classifier"]["kernel"]), cls0)


def test_full_finetune_moves_backbone(batch):
    cfg = dataclasses.replace(CFG, train_backbone=True)
    state = init_seg_train_state(jax.random.PRNGKey(3), cfg)
    images, masks = batch
    bb0 = np.asarray(state.params["backbone"]["patch_embed"]["kernel"])
    state, _ = seg_train_step(
        state, images, masks, jnp.float32(3e-4), jnp.float32(1e-4), cfg
    )
    assert not np.allclose(
        np.asarray(state.params["backbone"]["patch_embed"]["kernel"]), bb0
    )


def test_aux_loss_variant(batch):
    cfg = dataclasses.replace(CFG, use_aux_loss=True)
    state = init_seg_train_state(jax.random.PRNGKey(4), cfg)
    images, masks = batch
    state, metrics = seg_train_step(
        state, images, masks, jnp.float32(3e-4), jnp.float32(1e-4), cfg
    )
    assert np.isfinite(float(metrics["loss"]))


def test_predict_shapes(batch):
    state = init_seg_train_state(jax.random.PRNGKey(5), CFG)
    images, _ = batch
    logits = seg_predict(state.params, state.bn_state, images, CFG)
    assert logits.shape == (2, 64, 64, 4)


def test_loss_decreases_overfit_tiny(batch):
    """Steps on one batch with a learnable (spatially structured) target
    must reduce the loss (end-to-end sanity)."""
    state = init_seg_train_state(jax.random.PRNGKey(6), CFG)
    images, _ = batch
    # left half class 0, right half class 1 — trivially learnable
    masks = jnp.concatenate(
        [jnp.zeros((2, 64, 32), jnp.int32), jnp.ones((2, 64, 32), jnp.int32)], axis=2
    )
    losses = []
    for _ in range(12):
        state, metrics = seg_train_step(
            state, images, masks, jnp.float32(1e-3), jnp.float32(0.0), CFG
        )
        losses.append(float(metrics["loss"]))
    assert min(losses[-3:]) < losses[0], losses
