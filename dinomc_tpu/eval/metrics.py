"""Classification / segmentation metrics.

Parity targets:
  * fast-hist confusion matrix + ``cm2score`` (acc, mIoU, mF1, per-class
    IoU/F1/precision/recall) — reference ``utils/metric_tool.py:96-203``;
  * ``calculate_per_class_metrics`` (sklearn-CM flavor) —
    ``utils/metric_tool.py:212-262``;
  * streaming per-class intersection/union/correct accumulators used by the
    stitched full-resolution eval — reference ``evaluate.py:30-54``;
  * top-k accuracy — ``utils/utils.py:519-526``;
  * micro mAP (average precision) for BigEarthNet multi-label —
    ``main_bigearthnet.py:223-225``.

All core computations are jittable jnp ops (device-side); a tiny numpy
wrapper layer serves host-side report generation.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# confusion matrix (device-side)
# ---------------------------------------------------------------------------


def confusion_matrix(
    pred: jnp.ndarray, target: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """Fast-hist confusion matrix: cm[t, p] = #pixels with GT t predicted p.

    Parity: ``get_confuse_matrix`` (``utils/metric_tool.py:186-203``).
    Ignores target values outside [0, num_classes).
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    valid = (target >= 0) & (target < num_classes)
    idx = target * num_classes + pred
    idx = jnp.where(valid, idx, num_classes * num_classes)  # overflow bin
    cm = jnp.bincount(idx, length=num_classes * num_classes + 1)[:-1]
    return cm.reshape(num_classes, num_classes)


def cm2score(cm: jnp.ndarray, eps: float = 1e-10) -> Dict[str, jnp.ndarray]:
    """Scores from a confusion matrix (rows = GT, cols = pred).

    Parity: ``cm2score`` (``utils/metric_tool.py:96-138``): overall acc,
    per-class IoU/F1/precision/recall and their means over classes that
    appear (union > 0).
    """
    cm = cm.astype(jnp.float64) if cm.dtype == jnp.int64 else cm.astype(jnp.float32)
    tp = jnp.diag(cm)
    sum_gt = cm.sum(axis=1)
    sum_pred = cm.sum(axis=0)
    total = cm.sum()

    acc = tp.sum() / jnp.maximum(total, eps)
    precision = tp / jnp.maximum(sum_pred, eps)
    recall = tp / jnp.maximum(sum_gt, eps)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, eps)
    union = sum_gt + sum_pred - tp
    iou = tp / jnp.maximum(union, eps)

    present = (union > 0).astype(iou.dtype)
    n_present = jnp.maximum(present.sum(), 1.0)
    return {
        "acc": acc,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "iou": iou,
        "miou": (iou * present).sum() / n_present,
        "mf1": (f1 * present).sum() / n_present,
        "present": present,
    }


# ---------------------------------------------------------------------------
# streaming segmentation accumulators (evaluate.py:30-54 parity)
# ---------------------------------------------------------------------------


def seg_stats_init(num_classes: int) -> Dict[str, jnp.ndarray]:
    z = jnp.zeros((num_classes,), jnp.float32)
    return {"inter": z, "union": z, "correct": z, "total": jnp.zeros((), jnp.float32)}


@jax.jit
def seg_stats_update(
    stats: Dict[str, jnp.ndarray], pred: jnp.ndarray, target: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Accumulate per-class intersection/union + correct counts."""
    num_classes = stats["inter"].shape[0]
    cm = confusion_matrix(pred, target, num_classes).astype(jnp.float32)
    tp = jnp.diag(cm)
    sum_gt = cm.sum(axis=1)
    sum_pred = cm.sum(axis=0)
    return {
        "inter": stats["inter"] + tp,
        "union": stats["union"] + sum_gt + sum_pred - tp,
        "correct": stats["correct"] + tp,
        "total": stats["total"] + cm.sum(),
    }


def seg_stats_finalize(stats, eps: float = 1e-10) -> Dict[str, np.ndarray]:
    inter = np.asarray(stats["inter"])
    union = np.asarray(stats["union"])
    present = union > 0
    iou = inter / np.maximum(union, eps)
    prec_rec_f1 = 2 * inter / np.maximum(union + inter, eps)  # F1 = 2TP/(2TP+FP+FN)
    return {
        "iou": iou,
        "f1": prec_rec_f1,
        "miou": float(iou[present].mean()) if present.any() else 0.0,
        "mf1": float(prec_rec_f1[present].mean()) if present.any() else 0.0,
        "acc": float(np.asarray(stats["correct"]).sum() / max(float(stats["total"]), eps)),
        "present": present,
    }


# ---------------------------------------------------------------------------
# classification metrics
# ---------------------------------------------------------------------------


def topk_accuracy(
    logits: jnp.ndarray, target: jnp.ndarray, topk: Sequence[int] = (1,)
) -> Dict[int, jnp.ndarray]:
    """Top-k accuracy in percent (reference ``utils/utils.py:519-526``)."""
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)  # (B, maxk)
    correct = pred == target[:, None]
    out = {}
    for k in topk:
        out[k] = 100.0 * correct[:, :k].any(axis=1).mean(dtype=jnp.float32)
    return out


def average_precision(scores: np.ndarray, labels: np.ndarray) -> float:
    """AP for one ranking (binary labels), sklearn-style step integration."""
    order = np.argsort(-scores, kind="stable")
    labels = labels[order]
    tp = np.cumsum(labels)
    n_pos = labels.sum()
    if n_pos == 0:
        return 0.0
    precision = tp / np.arange(1, len(labels) + 1)
    return float((precision * labels).sum() / n_pos)


def micro_map(scores: np.ndarray, labels: np.ndarray) -> float:
    """Micro-averaged mAP over a multi-label batch: flatten all
    (sample, class) decisions into one ranking — matches
    ``sklearn.average_precision_score(average='micro')`` used at
    ``main_bigearthnet.py:223-225``."""
    return average_precision(scores.reshape(-1), labels.reshape(-1))


class ConfuseMatrixMeter:
    """Streaming (weighted) confusion-matrix meter.

    Parity: ``ConfuseMatrixMeter`` (``utils/metric_tool.py:49-64``) — a
    running weighted sum of per-batch confusion matrices; ``update_cm``
    returns the CURRENT batch's mean F1 (``cm2F1``) and ``get_scores``
    reports ``cm2score`` over the accumulated matrix. Host-side numpy
    accumulator fed by the device-side ``confusion_matrix`` above.
    """

    def __init__(self, n_class: int):
        self.n_class = n_class
        self.sum = np.zeros((n_class, n_class), np.float64)
        self.count = 0.0

    def update_cm(self, pr, gt, weight: float = 1.0) -> float:
        cm = np.asarray(confusion_matrix(jnp.asarray(pr), jnp.asarray(gt), self.n_class))
        self.sum += weight * cm
        self.count += weight
        return float(cm2score(jnp.asarray(cm))["mf1"])

    def get_scores(self) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v) for k, v in cm2score(jnp.asarray(self.sum)).items()}

    def clear(self) -> None:
        self.sum = np.zeros((self.n_class, self.n_class), np.float64)
        self.count = 0.0


# ---------------------------------------------------------------------------
# report helpers (host-side)
# ---------------------------------------------------------------------------


def format_class_metrics_table(
    class_names: Sequence[str], scores: Dict[str, np.ndarray]
) -> str:
    """Console table (reference ``utils/metric_tool.py:265-282`` analog)."""
    lines = [f"{'class':<16}{'IoU':>8}{'F1':>8}"]
    iou = np.asarray(scores["iou"])
    f1 = np.asarray(scores["f1"])
    for i, name in enumerate(class_names):
        lines.append(f"{name:<16}{iou[i]*100:>8.2f}{f1[i]*100:>8.2f}")
    lines.append(
        f"{'mean':<16}{scores['miou']*100:>8.2f}{scores['mf1']*100:>8.2f}"
        + (f"   acc {scores['acc']*100:.2f}" if "acc" in scores else "")
    )
    return "\n".join(lines)
