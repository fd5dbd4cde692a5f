"""Golden parity tests for segmentation losses against torch re-derivations
of the reference formulas (utils/loss.py). torch (CPU) is used ONLY as a
test oracle."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dinomc_tpu.objectives import segmentation as seg


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_cross_entropy_matches_torch():
    logits = _rand((2, 8, 8, 5))
    target = np.random.RandomState(1).randint(0, 5, (2, 8, 8))
    ours = float(seg.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target)))
    ref = F.cross_entropy(
        torch.tensor(logits).permute(0, 3, 1, 2), torch.tensor(target)
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_cross_entropy_ignore_index():
    logits = _rand((2, 4, 4, 3))
    target = np.random.RandomState(2).randint(0, 3, (2, 4, 4))
    target[0, 0, :] = 255
    ours = float(
        seg.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target), ignore_index=255)
    )
    ref = F.cross_entropy(
        torch.tensor(logits).permute(0, 3, 1, 2),
        torch.tensor(target).long(),
        ignore_index=255,
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def _torch_dice_ce(logits_nchw, target):
    """Transcription of reference DiceCrossEntropyLoss (utils/loss.py:175-199)."""
    ce = F.cross_entropy(logits_nchw, target)
    C = logits_nchw.shape[1]
    one_hot = F.one_hot(target, C).permute(0, 3, 1, 2).float()
    probs = F.softmax(logits_nchw, dim=1)
    inter = (probs * one_hot).sum(dim=(2, 3))
    union = probs.sum(dim=(2, 3)) + one_hot.sum(dim=(2, 3))
    dice = (2.0 * inter + 1e-5) / (union + 1e-5)
    return (ce + 1 - dice.mean()).item()


def test_dice_ce_matches_reference():
    logits = _rand((2, 8, 8, 6), seed=3)
    target = np.random.RandomState(4).randint(0, 6, (2, 8, 8))
    ours = float(seg.dice_ce_loss(jnp.asarray(logits), jnp.asarray(target)))
    ref = _torch_dice_ce(torch.tensor(logits).permute(0, 3, 1, 2), torch.tensor(target).long())
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_dice_bce_matches_reference():
    logits = _rand((2, 8, 8), seed=5)
    target = (np.random.RandomState(6).rand(2, 8, 8) > 0.5).astype(np.float32)
    ours = float(seg.dice_bce_loss(jnp.asarray(logits), jnp.asarray(target)))

    tl = torch.tensor(logits)
    tt = torch.tensor(target)
    bce = F.binary_cross_entropy_with_logits(tl, tt)
    probs = torch.sigmoid(tl)
    inter = (probs * tt).sum()
    dice = 2 * inter / (tt.sum() + probs.sum())
    ref = ((0.5 * bce + 0.5 * (1 - dice)) * 2).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_miou_loss_matches_reference():
    logits = _rand((2, 4, 4, 3), seed=7)
    target = np.random.RandomState(8).randint(0, 3, (2, 4, 4))
    ours = float(seg.miou_loss(jnp.asarray(logits), jnp.asarray(target)))

    tl = torch.tensor(logits).permute(0, 3, 1, 2)
    tt = torch.tensor(target).long()
    probs = F.softmax(tl, dim=1)
    one_hot = F.one_hot(tt, 3).permute(0, 3, 1, 2).float()
    inter = (probs * one_hot).reshape(2, 3, -1).sum(2)
    union = (probs + one_hot - probs * one_hot).reshape(2, 3, -1).sum(2)
    ref = (-(inter / (union + 1e-8)).mean()).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_multilabel_soft_margin_matches_torch():
    logits = _rand((4, 19), seed=9)
    target = (np.random.RandomState(10).rand(4, 19) > 0.7).astype(np.float32)
    ours = float(
        seg.multilabel_soft_margin_loss(jnp.asarray(logits), jnp.asarray(target))
    )
    ref = torch.nn.MultiLabelSoftMarginLoss()(
        torch.tensor(logits), torch.tensor(target)
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_liou_loss_matches_reference():
    """liou_loss (utils/loss.py:46-84): -log(min soft-IoU), softmax probs."""
    logits = _rand((2, 4, 4, 2), seed=11)
    target = np.random.RandomState(12).randint(0, 2, (2, 4, 4))
    ours = float(seg.liou_loss(jnp.asarray(logits), jnp.asarray(target)))

    tl = torch.tensor(logits).permute(0, 3, 1, 2)
    tt = torch.tensor(target).long()
    probs = F.softmax(tl, dim=1)
    one_hot = F.one_hot(tt, 2).permute(0, 3, 1, 2).float()
    inter = (probs * one_hot).reshape(2, 2, -1).sum(2)
    union = (probs + one_hot - probs * one_hot).reshape(2, 2, -1).sum(2)
    ref = (-torch.log(torch.min(inter / (union + 1e-8)))).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
