"""Segmentation / change-detection losses.

Parity targets (reference ``utils/loss.py``), re-derived as pure jnp
functions over NHWC logits:
  * ``DiceCrossEntropyLoss`` (``utils/loss.py:175-199``) — the main
    segmentation training loss: pixel CE + soft dice (per-sample-per-class
    dice over spatial dims, smooth 1e-5, mean over (B, C));
  * ``dice_bce_loss`` (``utils/loss.py:15-43``) — OSCD option:
    (0.5*BCEWithLogits + 0.5*softDice) * 2 with batch-global dice, smooth 0;
  * ``mIoULoss`` / ``mmIoULoss`` (``utils/loss.py:99-172``) — soft-IoU
    losses (negative mean IoU; minimax variant).

Layout note: reference losses take NCHW; ours take NHWC logits (B, H, W, C)
and integer masks (B, H, W) — the TPU-native layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jnp.ndarray,  # (B, H, W, C) or (B, C)
    target: jnp.ndarray,  # (B, H, W) or (B,)
    ignore_index: Optional[int] = None,
    class_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean CE over valid positions (torch CrossEntropyLoss semantics)."""
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe_target = jnp.clip(target, 0, num_classes - 1)
    picked = jnp.take_along_axis(logp, safe_target[..., None], axis=-1)[..., 0]
    valid = jnp.ones_like(picked)
    if ignore_index is not None:
        valid = (target != ignore_index).astype(jnp.float32)
    if class_weights is not None:
        w = class_weights[safe_target] * valid
    else:
        w = valid
    return -(picked * w).sum() / jnp.maximum(w.sum(), 1e-12)


def soft_dice_loss_per_class(
    probs: jnp.ndarray,  # (B, H, W, C)
    one_hot: jnp.ndarray,  # (B, H, W, C)
    smooth: float = 1e-5,
) -> jnp.ndarray:
    """1 - mean dice over (B, C), dice per sample-class over spatial dims."""
    inter = (probs * one_hot).sum(axis=(1, 2))
    union = probs.sum(axis=(1, 2)) + one_hot.sum(axis=(1, 2))
    dice = (2.0 * inter + smooth) / (union + smooth)
    return 1.0 - dice.mean()


def dice_ce_loss(
    logits: jnp.ndarray,  # (B, H, W, C)
    target: jnp.ndarray,  # (B, H, W) int
    ignore_index: Optional[int] = None,
    class_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DiceCrossEntropyLoss parity (``utils/loss.py:175-199``)."""
    num_classes = logits.shape[-1]
    ce = cross_entropy_loss(logits, target, ignore_index, class_weights)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    one_hot = jax.nn.one_hot(jnp.clip(target, 0, num_classes - 1), num_classes)
    if ignore_index is not None:
        one_hot = one_hot * (target != ignore_index)[..., None]
    return ce + soft_dice_loss_per_class(probs, one_hot)


def dice_bce_loss(
    logits: jnp.ndarray,  # (B, H, W) or (B, H, W, 1) raw logits
    target: jnp.ndarray,  # same shape, {0,1}
) -> jnp.ndarray:
    """OSCD binary loss parity (``utils/loss.py:15-43``):
    (0.5*BCEWithLogits + 0.5*(1 - batch-global soft dice)) * 2."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    probs = jax.nn.sigmoid(logits)
    bce = jnp.mean(
        jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    i = target.sum()
    j = probs.sum()
    inter = (probs * target).sum()
    dice = (2.0 * inter) / jnp.maximum(i + j, 1e-12)  # smooth = 0 in reference
    return (0.5 * bce + 0.5 * (1.0 - dice)) * 2.0


def _soft_iou_per_class(probs, one_hot):
    """(B, C) soft IoU: inter / (a + b - ab), summed over pixels."""
    B, _, _, C = probs.shape
    inter = (probs * one_hot).reshape(B, -1, C).sum(axis=1)
    union = (probs + one_hot - probs * one_hot).reshape(B, -1, C).sum(axis=1)
    return inter / (union + 1e-8)


def miou_loss(
    logits: jnp.ndarray,  # (B, H, W, C)
    target: jnp.ndarray,  # (B, H, W)
) -> jnp.ndarray:
    """mIoULoss parity (``utils/loss.py:99-134``): -mean soft IoU."""
    C = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    one_hot = jax.nn.one_hot(target, C)
    return -jnp.mean(_soft_iou_per_class(probs, one_hot))


def mmiou_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
) -> jnp.ndarray:
    """Minimax mmIoULoss parity (``utils/loss.py:136-172``). Note: the
    reference comments out the softmax here — inputs are used raw; we keep
    that behavior for parity."""
    C = logits.shape[-1]
    one_hot = jax.nn.one_hot(target, C)
    iou = _soft_iou_per_class(logits.astype(jnp.float32), one_hot)
    return -jnp.min(iou) - jnp.mean(iou)


def liou_loss(
    logits: jnp.ndarray,  # (B, H, W, C)
    target: jnp.ndarray,  # (B, H, W)
) -> jnp.ndarray:
    """``liou_loss`` parity (``utils/loss.py:46-84``): ``-log(min IoU)`` over
    the (batch, class) soft-IoU matrix, softmax probabilities. Defined but
    unused by the reference trainers; kept for inventory completeness."""
    C = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    one_hot = jax.nn.one_hot(target, C)
    iou = _soft_iou_per_class(probs, one_hot)
    return -jnp.log(jnp.min(iou))


def multilabel_soft_margin_loss(
    logits: jnp.ndarray,  # (B, C)
    target: jnp.ndarray,  # (B, C) in {0,1}
) -> jnp.ndarray:
    """torch.nn.MultiLabelSoftMarginLoss parity (``main_bigearthnet.py``):
    mean over batch of mean over classes of
    -[y*log sigmoid(x) + (1-y)*log sigmoid(-x)]."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    logsig = jax.nn.log_sigmoid(logits)
    logsig_neg = jax.nn.log_sigmoid(-logits)
    per_class = -(target * logsig + (1.0 - target) * logsig_neg)
    return per_class.mean(axis=1).mean()
