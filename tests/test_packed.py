"""Packed-shard dataset format (data/packed.py): pack -> mmap roundtrip,
MCBase/MCTemporal sampling parity, uint8 flow through the device aug."""

import json
import os

import numpy as np
import pytest

from dinomc_tpu.data import packed
from dinomc_tpu.data.seco import MCBase, MCTemporal


def _make_tree(root, n_loc=4, n_time=3, size=24, fmt="png"):
    from PIL import Image

    rng = np.random.RandomState(0)
    for l in range(n_loc):
        d = os.path.join(root, f"loc{l:02d}")
        os.makedirs(d)
        for t in range(n_time):
            img = rng.randint(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(img).save(os.path.join(d, f"t{t}.{fmt}"))


def test_pack_roundtrip_exact(tmp_path):
    """Records must equal the source pixels bit-exactly when no resize is
    needed (decode target == source size)."""
    src, out = str(tmp_path / "src"), str(tmp_path / "pk")
    os.makedirs(src)
    _make_tree(src, n_loc=3, n_time=2, size=24)
    index = packed.pack_dataset(src, out, size=24, records_per_shard=4)
    assert index["n"] == 6
    assert len(index["shards"]) == 2  # 4 + 2
    assert packed.is_packed(out)

    from PIL import Image

    reader = packed.PackedReader(out)
    assert len(reader) == 6
    for i, name in enumerate(index["names"]):
        ref = np.asarray(Image.open(os.path.join(src, name)).convert("RGB"))
        np.testing.assert_array_equal(np.asarray(reader.record(i)), ref)


def test_pack_groups_match_tree(tmp_path):
    src, out = str(tmp_path / "src"), str(tmp_path / "pk")
    os.makedirs(src)
    _make_tree(src, n_loc=5, n_time=4, size=16)
    index = packed.pack_dataset(src, out, size=16)
    assert len(index["groups"]) == 5
    assert all(len(g) == 4 for g in index["groups"])
    # record ids are consecutive in group order
    flat = [i for g in index["groups"] for i in g]
    assert flat == list(range(20))


def test_packed_mc_sampling_matches_mcbase(tmp_path):
    """PackedMC with the same seed must pick the same timestamp per
    location as MCBase over the original tree (same RandomState walk)."""
    src, out = str(tmp_path / "src"), str(tmp_path / "pk")
    os.makedirs(src)
    _make_tree(src, n_loc=6, n_time=3, size=16)
    packed.pack_dataset(src, out, size=16)

    ref = MCBase(src, image_size=16, seed=7)
    ds = packed.PackedMC(out, seed=7, as_float=True)
    assert len(ds) == len(ref) == 6
    for i in range(6):
        np.testing.assert_allclose(ds[i], ref[i], atol=1e-6)


def test_packed_temporal_matches_mctemporal(tmp_path):
    src, out = str(tmp_path / "src"), str(tmp_path / "pk")
    os.makedirs(src)
    _make_tree(src, n_loc=3, n_time=5, size=16)
    packed.pack_dataset(src, out, size=16)

    ref = MCTemporal(src, image_size=16, seed=0)
    ds = packed.PackedMCTemporal(out, seed=0, as_float=True)
    ref.set_epoch(3)
    ds.set_epoch(3)
    for i in range(3):
        a, b = ds[i], ref[i]
        assert a.shape == b.shape == (4, 16, 16, 3)
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_pack_refuses_overwrite(tmp_path):
    src, out = str(tmp_path / "src"), str(tmp_path / "pk")
    os.makedirs(src)
    _make_tree(src, n_loc=1, n_time=1, size=8)
    packed.pack_dataset(src, out, size=8)
    with pytest.raises(FileExistsError):
        packed.pack_dataset(src, out, size=8)


def test_pack_tiff_sources(tmp_path):
    """SeCo's native format is .tif — must pack via the native TIFF decode
    (or PIL fallback) identically to the PNG path."""
    src, out = str(tmp_path / "src"), str(tmp_path / "pk")
    os.makedirs(src)
    _make_tree(src, n_loc=2, n_time=2, size=16, fmt="tiff")
    index = packed.pack_dataset(src, out, size=16)
    assert index["n"] == 4
    from PIL import Image

    reader = packed.PackedReader(out)
    for i, name in enumerate(index["names"]):
        ref = np.asarray(Image.open(os.path.join(src, name)).convert("RGB"))
        np.testing.assert_array_equal(np.asarray(reader.record(i)), ref)


@pytest.mark.slow  # two full multicrop_augment compiles (~30 s on XLA:CPU)
def test_uint8_batch_through_device_augment(tmp_path):
    """multicrop_augment(uint8) must equal multicrop_augment(f32/255)."""
    import jax
    import jax.numpy as jnp

    from dinomc_tpu.ops.augment import MultiCropConfig, multicrop_augment

    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 255, (2, 32, 32, 3), np.uint8)
    cfg = MultiCropConfig(global_size=16, local_sizes=(12, 8))
    key = jax.random.PRNGKey(0)
    g_a, l_a = multicrop_augment(key, jnp.asarray(u8), cfg)
    g_b, l_b = multicrop_augment(
        key, jnp.asarray(u8.astype(np.float32) / 255.0), cfg
    )
    # atol: the on-device u8->f32 divide can fuse differently from the
    # host-precomputed one; after bicubic resize + /std normalization the
    # one-ulp input wobble is ~1e-4
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b), atol=1e-3)
    for a, b in zip(l_a, l_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_cli_pack_data(tmp_path, capsys):
    src, out = str(tmp_path / "src"), str(tmp_path / "pk")
    os.makedirs(src)
    _make_tree(src, n_loc=2, n_time=2, size=8)
    import sys
    from unittest import mock

    from dinomc_tpu.cli import pack_data

    argv = ["pack_data", "--src", src, "--out", out, "--size", "8"]
    with mock.patch.object(sys, "argv", argv):
        pack_data.main()
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["packed"] == 4 and line["groups"] == 2
    assert packed.is_packed(out)
