"""Metric parity tests (utils/metric_tool.py, utils/utils.py:519-526,
sklearn micro-mAP)."""

import jax.numpy as jnp
import numpy as np

from dinomc_tpu.eval import metrics


def test_confusion_matrix_basic():
    pred = jnp.asarray([0, 1, 2, 2, 1])
    target = jnp.asarray([0, 1, 1, 2, 1])
    cm = np.asarray(metrics.confusion_matrix(pred, target, 3))
    expected = np.array([[1, 0, 0], [0, 2, 1], [0, 0, 1]])
    np.testing.assert_array_equal(cm, expected)


def test_confusion_matrix_ignores_out_of_range():
    pred = jnp.asarray([0, 1, 0])
    target = jnp.asarray([0, 255, 1])
    cm = np.asarray(metrics.confusion_matrix(pred, target, 2))
    np.testing.assert_array_equal(cm, np.array([[1, 0], [1, 0]]))


def test_cm2score_against_sklearn():
    from sklearn.metrics import confusion_matrix as sk_cm, jaccard_score, f1_score

    rng = np.random.RandomState(0)
    target = rng.randint(0, 4, 1000)
    pred = rng.randint(0, 4, 1000)
    cm = metrics.confusion_matrix(jnp.asarray(pred), jnp.asarray(target), 4)
    np.testing.assert_array_equal(np.asarray(cm), sk_cm(target, pred, labels=range(4)))
    s = metrics.cm2score(cm)
    np.testing.assert_allclose(float(s["acc"]), (pred == target).mean(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s["iou"]), jaccard_score(target, pred, average=None), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(s["f1"]), f1_score(target, pred, average=None), rtol=1e-4
    )


def test_streaming_stats_match_single_shot():
    rng = np.random.RandomState(1)
    target = rng.randint(0, 5, (4, 32, 32))
    pred = rng.randint(0, 5, (4, 32, 32))

    stats = metrics.seg_stats_init(5)
    for i in range(4):
        stats = metrics.seg_stats_update(
            stats, jnp.asarray(pred[i]), jnp.asarray(target[i])
        )
    streamed = metrics.seg_stats_finalize(stats)

    cm = metrics.confusion_matrix(jnp.asarray(pred), jnp.asarray(target), 5)
    whole = metrics.cm2score(cm)
    np.testing.assert_allclose(streamed["miou"], float(whole["miou"]), rtol=1e-5)
    np.testing.assert_allclose(streamed["acc"], float(whole["acc"]), rtol=1e-5)
    np.testing.assert_allclose(streamed["iou"], np.asarray(whole["iou"]), rtol=1e-4)


def test_topk_accuracy_matches_manual():
    rng = np.random.RandomState(2)
    logits = rng.randn(64, 10).astype(np.float32)
    target = rng.randint(0, 10, 64)
    accs = metrics.topk_accuracy(jnp.asarray(logits), jnp.asarray(target), (1, 5))
    top1 = (logits.argmax(1) == target).mean() * 100
    top5 = np.mean([target[i] in np.argsort(-logits[i])[:5] for i in range(64)]) * 100
    np.testing.assert_allclose(float(accs[1]), top1, rtol=1e-5)
    np.testing.assert_allclose(float(accs[5]), top5, rtol=1e-5)


def test_micro_map_against_sklearn():
    from sklearn.metrics import average_precision_score

    rng = np.random.RandomState(3)
    scores = rng.rand(50, 19).astype(np.float32)
    labels = (rng.rand(50, 19) > 0.7).astype(np.int32)
    ours = metrics.micro_map(scores, labels)
    ref = average_precision_score(labels, scores, average="micro")
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_format_table_runs():
    stats = metrics.seg_stats_init(2)
    stats = metrics.seg_stats_update(
        stats, jnp.asarray([[0, 1], [1, 1]]), jnp.asarray([[0, 1], [0, 1]])
    )
    out = metrics.format_class_metrics_table(
        ["bg", "fg"], metrics.seg_stats_finalize(stats)
    )
    assert "mean" in out and "bg" in out


def test_confuse_matrix_meter_streaming():
    """ConfuseMatrixMeter parity (utils/metric_tool.py:49-64): weighted
    running CM; update_cm returns the batch mF1; get_scores == cm2score of
    the accumulated matrix."""
    import numpy as np

    from dinomc_tpu.eval import metrics as M

    rng = np.random.RandomState(0)
    meter = M.ConfuseMatrixMeter(4)
    total = np.zeros((4, 4))
    for w in (1.0, 2.0):
        gt = rng.randint(0, 4, size=(50,))
        pr = rng.randint(0, 4, size=(50,))
        batch_f1 = meter.update_cm(pr, gt, weight=w)
        cm = np.asarray(M.confusion_matrix(jnp.asarray(pr), jnp.asarray(gt), 4))
        total += w * cm
        assert abs(batch_f1 - float(M.cm2score(jnp.asarray(cm))["mf1"])) < 1e-6
    np.testing.assert_allclose(meter.sum, total)
    scores = meter.get_scores()
    ref = M.cm2score(jnp.asarray(total))
    np.testing.assert_allclose(scores["miou"], np.asarray(ref["miou"]), atol=1e-6)
    meter.clear()
    assert meter.sum.sum() == 0 and meter.count == 0
