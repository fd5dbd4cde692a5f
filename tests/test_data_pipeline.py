"""Tests for seg datasets, SSL datasets, the loader stack, spatial aug, and
logging utilities."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinomc_tpu.data import loader as dl
from dinomc_tpu.data import seco
from dinomc_tpu.data import seg_datasets as sd
from dinomc_tpu.ops import spatial
from dinomc_tpu.utils import logging as ulog


# ---------------------------------------------------------------------------
# palette conversion
# ---------------------------------------------------------------------------


def test_rgb_class_roundtrip():
    rng = np.random.RandomState(0)
    mask = rng.randint(0, sd.UAVID.num_classes, (16, 16)).astype(np.uint8)
    rgb = sd.class_to_rgb(mask, sd.UAVID)
    back = sd.rgb_to_class(rgb, sd.UAVID)
    np.testing.assert_array_equal(back, mask)


def test_unknown_color_maps_to_zero():
    rgb = np.full((4, 4, 3), 17, np.uint8)
    np.testing.assert_array_equal(sd.rgb_to_class(rgb, sd.UDD6), 0)


def test_specs_registry():
    assert set(sd.SPECS) == {"uavid", "udd6", "potsdam", "loveda"}
    assert sd.UAVID.num_classes == 8
    assert sd.UDD6.num_classes == 6
    assert sd.POTSDAM.num_classes == 6
    assert sd.LOVEDA.num_classes == 8 and sd.LOVEDA.ignore_index == 0


# ---------------------------------------------------------------------------
# file index + load
# ---------------------------------------------------------------------------


@pytest.fixture()
def uavid_dir(tmp_path):
    from PIL import Image

    img_dir, msk_dir = tmp_path / "img", tmp_path / "msk"
    img_dir.mkdir()
    msk_dir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(3):
        img = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        cls = rng.randint(0, 8, (48, 48)).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"s{i}.png")
        Image.fromarray(sd.class_to_rgb(cls, sd.UAVID)).save(msk_dir / f"s{i}.png")
    return str(img_dir), str(msk_dir)


def test_seg_index_and_batches(uavid_dir):
    img_dir, msk_dir = uavid_dir
    ds = sd.SegSampleIndex(img_dir, msk_dir, sd.UAVID, image_size=32)
    assert len(ds) == 3
    img, mask = ds.load(0)
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert mask.shape == (32, 32) and mask.max() < 8
    batches = list(ds.batches(2, shuffle=True, seed=0))
    assert len(batches) == 1  # drop_last
    assert batches[0][0].shape == (2, 32, 32, 3)


def test_potsdam_pairs_split(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(7)
    for i in range(10):
        img = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
        cls = rng.randint(0, 6, (24, 24)).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / f"Image_{i}.png")
        Image.fromarray(sd.class_to_rgb(cls, sd.POTSDAM)).save(
            tmp_path / f"Label_{i}.png"
        )
    train = sd.SegSampleIndex.potsdam_pairs(
        str(tmp_path), sd.POTSDAM, "train", val_frac=0.1, image_size=24
    )
    val = sd.SegSampleIndex.potsdam_pairs(
        str(tmp_path), sd.POTSDAM, "val", val_frac=0.1, image_size=24
    )
    assert len(train) == 9 and len(val) == 1
    assert not set(train.stems) & set(val.stems)
    img, mask = train.load(0)
    assert img.shape == (24, 24, 3) and mask.max() < 6


def test_augment_batch_shapes(uavid_dir):
    img_dir, msk_dir = uavid_dir
    ds = sd.SegSampleIndex(img_dir, msk_dir, sd.UAVID, image_size=32)
    imgs, masks = next(ds.batches(2))
    out_i, out_m = sd.augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(masks), sd.UAVID, True
    )
    assert out_i.shape == (2, 32, 32, 3)
    assert out_m.shape == (2, 32, 32)
    # eval path: normalize only, mask untouched
    ev_i, ev_m = sd.augment_batch(
        jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(masks), sd.UAVID, False
    )
    np.testing.assert_array_equal(np.asarray(ev_m), masks)


# ---------------------------------------------------------------------------
# spatial ops
# ---------------------------------------------------------------------------


def test_affine_identity_when_p_zero():
    cfg = spatial.AffineConfig(p=0.0)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    masks = jax.random.randint(jax.random.PRNGKey(1), (2, 16, 16), 0, 4)
    oi, om = spatial.random_affine_pair(jax.random.PRNGKey(2), imgs, masks, cfg)
    np.testing.assert_allclose(np.asarray(oi), np.asarray(imgs), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(om), np.asarray(masks))


def test_affine_changes_and_stays_valid():
    cfg = spatial.AffineConfig(p=1.0)
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (4, 16, 16, 3))
    masks = jax.random.randint(jax.random.PRNGKey(4), (4, 16, 16), 0, 4)
    oi, om = spatial.random_affine_pair(jax.random.PRNGKey(5), imgs, masks, cfg)
    assert not np.allclose(np.asarray(oi), np.asarray(imgs))
    assert om.dtype == masks.dtype
    assert int(om.max()) < 4 and int(om.min()) >= 0


def test_joint_flip_consistency():
    imgs = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    masks = jnp.arange(2 * 4 * 4, dtype=jnp.int32).reshape(2, 4, 4)
    oi, om = spatial.joint_flip(jax.random.PRNGKey(0), imgs, masks, p_h=1.0, p_v=0.0)
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(imgs[:, :, ::-1, :]))
    np.testing.assert_array_equal(np.asarray(om), np.asarray(masks[:, :, ::-1]))


# ---------------------------------------------------------------------------
# SSL datasets
# ---------------------------------------------------------------------------


@pytest.fixture()
def seco_root(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(2)
    for loc in range(3):
        d = tmp_path / f"loc{loc}"
        d.mkdir()
        for t in range(4):
            img = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"t{t}.png")
    return str(tmp_path)


def test_mcbase(seco_root):
    ds = seco.MCBase(seco_root, image_size=16)
    assert len(ds) == 3
    img = ds[0]
    assert img.shape == (16, 16, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_mctemporal(seco_root):
    ds = seco.MCTemporal(seco_root, image_size=16)
    item = ds[1]
    assert item.shape == (4, 16, 16, 3)
    np.testing.assert_array_equal(item[0], item[3])  # base repeated as 4th


def test_flat_folder(seco_root):
    ds = seco.FlatImageFolder(seco_root, image_size=16)
    assert len(ds) == 12


# ---------------------------------------------------------------------------
# loader stack
# ---------------------------------------------------------------------------


class _ArrDs:
    def __init__(self, n):
        self.data = [np.full((4, 4, 3), i, np.float32) for i in range(n)]

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return self.data[i]


def test_sharded_sampler_covers_and_shards():
    s0 = dl.ShardedSampler(20, 2, num_shards=2, shard_id=0, seed=1)
    s1 = dl.ShardedSampler(20, 2, num_shards=2, shard_id=1, seed=1)
    i0 = np.concatenate(list(s0))
    i1 = np.concatenate(list(s1))
    assert len(set(i0) & set(i1)) == 0
    assert len(set(i0) | set(i1)) == 20
    # epoch changes the order
    s0.set_epoch(1)
    i0b = np.concatenate(list(s0))
    assert not np.array_equal(i0, i0b)


def test_random_subset():
    idx = dl.random_subset(100, 0.1, seed=42)
    assert len(idx) == 10 and len(set(idx)) == 10
    np.testing.assert_array_equal(idx, dl.random_subset(100, 0.1, seed=42))


def test_prefetch_loader_yields_all():
    ds = _ArrDs(10)
    sampler = dl.ShardedSampler(10, 2, shuffle=False)
    batches = list(dl.PrefetchLoader(ds, sampler))
    assert len(batches) == 5
    assert batches[0].shape == (2, 4, 4, 3)
    np.testing.assert_allclose(batches[0][0], 0.0)


def test_prefetch_loader_threaded_matches_serial():
    """num_threads>1 fans dataset[i] over a pool; batches must keep sampler
    order and item order within the batch (pool.map preserves order)."""
    ds = _ArrDs(13)
    serial = list(dl.PrefetchLoader(
        ds, dl.ShardedSampler(13, 3, shuffle=True, seed=7), num_threads=1))
    threaded = list(dl.PrefetchLoader(
        ds, dl.ShardedSampler(13, 3, shuffle=True, seed=7), num_threads=4))
    assert len(serial) == len(threaded)
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a, b)


def test_prefetch_loader_threaded_propagates_errors():
    class Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise ValueError("decode failed")
            return np.zeros((2, 2, 3), np.float32)

    loader = dl.PrefetchLoader(
        Boom(), dl.ShardedSampler(8, 2, shuffle=False), num_threads=4)
    with pytest.raises(ValueError, match="decode failed"):
        list(loader)


def test_infinite_loader_wraps():
    ds = _ArrDs(4)
    sampler = dl.ShardedSampler(4, 2, shuffle=True, seed=0)
    inf = iter(dl.InfiniteLoader(dl.PrefetchLoader(ds, sampler)))
    got = [next(inf) for _ in range(5)]  # > one epoch (2 batches)
    assert len(got) == 5


# ---------------------------------------------------------------------------
# logging utilities
# ---------------------------------------------------------------------------


def test_smoothed_value():
    v = ulog.SmoothedValue(window_size=3)
    for x in (1.0, 2.0, 3.0, 4.0):
        v.update(x)
    assert v.median == 3.0
    assert v.avg == 3.0
    assert v.global_avg == 2.5
    assert v.value == 4.0


def test_metric_logger_iterates(capsys):
    ml = ulog.MetricLogger()
    for x in ml.log_every(range(5), print_freq=2, header="ep0"):
        ml.update(loss=float(x))
    out = capsys.readouterr().out
    assert "ep0" in out and "loss" in out


def test_jsonl_logger(tmp_path):
    p = str(tmp_path / "log.txt")
    lg = ulog.JsonlLogger(p)
    lg.write({"epoch": 0, "loss": 1.5})
    lg.write({"epoch": 1, "loss": 1.2})
    lines = [json.loads(l) for l in open(p)]
    assert lines[1]["epoch"] == 1


def test_epoch_csv_per_class_columns(tmp_path):
    """Per-class columns must carry DISTINCT values (the reference's
    late-binding bug wrote the last class everywhere)."""
    p = str(tmp_path / "m.csv")
    ulog.write_epoch_csv(
        p, 0, {"miou": 0.5},
        per_class={"iou": [0.1, 0.9]}, class_names=["a", "b"],
    )
    import csv as _csv

    rows = list(_csv.DictReader(open(p)))
    assert float(rows[0]["iou/a"]) == 0.1
    assert float(rows[0]["iou/b"]) == 0.9


def test_sharded_sampler_pads_uneven_shards():
    """Uneven dataset: every shard must yield the SAME number of batches
    (torch DistributedSampler total_size semantics) — in multi-host SPMD a
    rank with one extra batch would hang in its step's collectives."""
    n, shards, bs = 127, 2, 8
    samplers = [
        dl.ShardedSampler(n, bs, shuffle=True, num_shards=shards, shard_id=i, seed=3)
        for i in range(shards)
    ]
    batch_lists = [list(s) for s in samplers]
    counts = [len(b) for b in batch_lists]
    assert counts[0] == counts[1] == len(samplers[0])
    seen = np.concatenate([np.concatenate(b) for b in batch_lists])
    assert seen.min() >= 0 and seen.max() < n  # padding wraps real indices
    # together the shards cover (almost) the whole epoch: only batch-tail
    # drop_last and the <num_shards wrap padding may repeat/omit indices
    assert len(np.unique(seen)) >= n - bs * shards


def test_sharded_sampler_more_shards_than_samples():
    """n < num_shards: the pad exceeds the dataset — wrap must tile, and
    every shard still yields the same (non-zero) number of batches."""
    n, shards, bs = 3, 8, 1
    samplers = [
        dl.ShardedSampler(n, bs, shuffle=False, num_shards=shards, shard_id=i)
        for i in range(shards)
    ]
    counts = [len(list(s)) for s in samplers]
    assert counts == [1] * shards
    assert all(len(s) == 1 for s in samplers)
