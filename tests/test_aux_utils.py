"""Tests for attention visualization, retrieval utils, and visualization
helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from dinomc_tpu.eval import retrieval
from dinomc_tpu.models import vit
from dinomc_tpu.utils import video_generation as vg
from dinomc_tpu.utils import visualization as viz


def test_attention_heatmaps_shapes():
    cfg = vit.ViTConfig(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, img_size=32,
        compute_dtype=jnp.float32,
    )
    params = vit.init_vit(jax.random.PRNGKey(0), cfg)
    imgs = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    maps = vg.attention_heatmaps(params, imgs, cfg, threshold=0.6)
    assert maps.shape == (2, 2, 32, 32)
    assert np.isfinite(maps).all() and (maps >= 0).all()
    frames = vg.render_heatmap_frames(imgs, maps)
    assert frames.shape == (2, 32, 32, 3) and frames.dtype == np.uint8


def test_write_video_gif_fallback(tmp_path):
    frames = [np.zeros((16, 16, 3), np.uint8), np.full((16, 16, 3), 255, np.uint8)]
    out = vg.write_video(frames, str(tmp_path / "out.mp4"), fps=2)
    import os

    assert os.path.exists(out)


def test_pca_matches_sklearn():
    from sklearn.decomposition import PCA as SkPCA

    rng = np.random.RandomState(0)
    X = rng.randn(100, 16) @ rng.randn(16, 16)
    ours = retrieval.PCA(dim=4, whit=None).fit(X)
    Y = ours.apply(X)
    sk = SkPCA(n_components=4).fit(X)
    Ysk = sk.transform(X)
    # components may differ in sign
    for i in range(4):
        corr = np.corrcoef(Y[:, i], Ysk[:, i])[0, 1]
        assert abs(abs(corr) - 1.0) < 1e-6


def test_pca_whitening_unit_variance():
    rng = np.random.RandomState(1)
    X = rng.randn(500, 8) * np.array([10, 5, 2, 1, 1, 1, 1, 1])
    Y = retrieval.PCA(dim=4, whit=0.5).fit(X).apply(X)
    np.testing.assert_allclose(Y.std(axis=0), 1.0, atol=0.1)


def test_compute_ap_perfect_and_worst():
    # 3 positives ranked at the top -> AP 1
    assert retrieval.compute_ap(np.array([0, 1, 2]), 3) == 1.0
    # one positive at rank 9 (of 10) -> low AP
    assert retrieval.compute_ap(np.array([9]), 1) < 0.2


def test_compute_map_basic():
    # db of 4 items, 1 query; correct items 0,1; ranks put them first
    ranks = np.array([[0], [1], [2], [3]])
    gnd = [{"ok": [0, 1], "junk": []}]
    mAP, aps, _, _ = retrieval.compute_map(ranks, gnd, kappas=(1, 2))
    assert mAP == 1.0 and aps[0] == 1.0
    # junk entries are skipped in ranking
    ranks2 = np.array([[2], [0], [1], [3]])  # junk item 2 ranked first
    gnd2 = [{"ok": [0, 1], "junk": [2]}]
    mAP2, _, _, _ = retrieval.compute_map(ranks2, gnd2)
    assert mAP2 == 1.0


def test_multi_scale_shape():
    cfg = vit.ViTConfig(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, img_size=32,
        compute_dtype=jnp.float32,
    )
    params = vit.init_vit(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 3), jnp.float32)
    feats = retrieval.multi_scale(x, lambda im: vit.vit_forward(params, im, cfg))
    assert feats.shape == (2, 32)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(feats, axis=-1)), 1.0, atol=1e-5
    )


def test_profiling_step_timer_and_sync():
    from dinomc_tpu.utils import profiling

    x = jnp.ones((8, 8))
    profiling.sync(x)  # must not raise
    timer = profiling.StepTimer(sync_every=2)
    assert timer.step(x) is None
    ms = timer.step(x)
    assert ms is not None and ms >= 0
    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)


def test_profiling_annotate():
    from dinomc_tpu.utils import profiling

    with profiling.annotate("test-region"):
        _ = jnp.ones(4).sum()


def test_make_numpy_grid_and_denorm():
    imgs = np.random.RandomState(3).rand(5, 8, 8, 3).astype(np.float32)
    grid = viz.make_numpy_grid(imgs)
    assert grid.ndim == 3 and grid.shape[-1] == 3
    n = (imgs - np.asarray(viz.IMAGENET_MEAN)) / np.asarray(viz.IMAGENET_STD)
    np.testing.assert_allclose(viz.de_norm(n), imgs, atol=1e-5)


def test_save_segmentation_figure(tmp_path):
    from dinomc_tpu.data.seg_datasets import UAVID

    img = np.random.RandomState(4).rand(32, 32, 3).astype(np.float32)
    pred = np.random.RandomState(5).randint(0, 8, (32, 32))
    path = str(tmp_path / "fig.png")
    viz.save_segmentation_figure(img, pred, UAVID.classes, UAVID.palette, path)
    import os

    assert os.path.getsize(path) > 0


def test_reduce_dict_single_process_copy():
    from dinomc_tpu.parallel.distributed import reduce_dict

    d = {"a": 1.0, "b": 2.0}
    out = reduce_dict(d)
    assert out == d and out is not d
    assert reduce_dict(d, average=False) == d


def test_metric_logger_sync_single_process_noop():
    from dinomc_tpu.utils.logging import MetricLogger

    ml = MetricLogger()
    ml.update(loss=3.0)
    ml.synchronize_between_processes()
    assert ml.meters["loss"].count == 1
    assert ml.meters["loss"].global_avg == 3.0


def test_transform_convert_roundtrip():
    """transform_convert (reference utils/visualization.py): denormalize +
    uint8 PIL; CHW inputs accepted; mean=None skips denorm."""
    import numpy as np

    from dinomc_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD
    from dinomc_tpu.utils.visualization import transform_convert

    rng = np.random.RandomState(1)
    raw = rng.rand(8, 6, 3).astype(np.float32)
    normed = (raw - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    img = transform_convert(normed)
    assert img.size == (6, 8) and img.mode == "RGB"
    np.testing.assert_allclose(
        np.asarray(img), np.clip(raw * 255 + 0.5, 0, 255).astype(np.uint8),
        atol=1,
    )
    # CHW accepted; no-denorm path; grayscale
    assert transform_convert(np.moveaxis(normed, -1, 0)).size == (6, 8)
    g = transform_convert(raw[..., :1], mean=None)
    assert g.mode == "L" and g.size == (6, 8)
