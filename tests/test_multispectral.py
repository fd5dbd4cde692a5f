"""Multispectral (--bands) pretraining path: native band reads, quantile
normalization parity with the reference formula, dataset + CLI wiring.

Runs WITHOUT rasterio: uint16 band tifs are written with PIL and read by
the native libtiff reader (native_loader.read_band); rasterio, when
installed, takes priority inside seco._read_raw_band and must agree.
"""

import os

import numpy as np
import pytest

from dinomc_tpu.data import native_loader
from dinomc_tpu.data.seco import (
    QUANTILES,
    MCBase,
    MCTemporal,
    _normalize_band,
    read_bands,
    read_image,
)

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native imgloader not built"
)


def _write_u16(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint16), mode="I;16").save(path)


def _make_seco_tree(root, n_loc=2, n_time=2, size=16, bands=("B2", "B3", "B4")):
    """Upstream SeCo layout: root/<loc>/<timestamp>/<band>.tif (uint16)."""
    rng = np.random.RandomState(0)
    for l in range(n_loc):
        for t in range(n_time):
            d = os.path.join(root, f"{l:03d}", f"t{t}")
            os.makedirs(d)
            for b in bands:
                _write_u16(
                    os.path.join(d, f"{b}.tif"),
                    rng.randint(0, 200, (size, size)),
                )


def test_native_read_band_u16(tmp_path):
    arr = (np.arange(16 * 16).reshape(16, 16) * 13 % 4096).astype(np.uint16)
    p = str(tmp_path / "b.tif")
    _write_u16(p, arr)
    out = native_loader.read_band(p, 1)
    np.testing.assert_array_equal(out, arr.astype(np.float32))


def test_quantile_normalize_golden():
    """_normalize_band must equal the reference formula
    (dino_dataset.py:69-72): clip((x-lo)/(hi-lo)*255, 0, 255).astype(u8)."""
    rng = np.random.RandomState(1)
    raw = rng.uniform(-10, 300, (8, 8)).astype(np.float32)
    lo, hi = QUANTILES["B2"]
    ref = np.clip((raw - lo) / (hi - lo) * 255.0, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(_normalize_band(raw, lo, hi), ref)


def test_read_bands_directory_layout(tmp_path):
    d = str(tmp_path / "ts")
    os.makedirs(d)
    rng = np.random.RandomState(2)
    raws = {}
    for b in ("B4", "B3", "B2"):
        raws[b] = rng.randint(0, 150, (12, 12)).astype(np.uint16)
        _write_u16(os.path.join(d, f"{b}.tif"), raws[b])
    img = read_bands(d, ["B4", "B3", "B2"])
    assert img.shape == (12, 12, 3) and img.dtype == np.uint8
    for i, b in enumerate(["B4", "B3", "B2"]):
        lo, hi = QUANTILES[b]
        np.testing.assert_array_equal(
            img[:, :, i], _normalize_band(raws[b].astype(np.float32), lo, hi)
        )


def test_read_image_bands_resize(tmp_path):
    d = str(tmp_path / "ts")
    os.makedirs(d)
    for b in ("B2", "B3", "B4"):
        _write_u16(os.path.join(d, f"{b}.tif"),
                   np.random.RandomState(3).randint(0, 128, (20, 20)))
    img = read_image(d, bands=["B4", "B3", "B2"], size=16)
    assert img.shape == (16, 16, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_mcbase_with_bands(tmp_path):
    _make_seco_tree(str(tmp_path), n_loc=3, n_time=2, size=16)
    ds = MCBase(str(tmp_path), image_size=16, seed=0, bands=["B4", "B3", "B2"])
    assert len(ds) == 3
    x = ds[0]
    assert x.shape == (16, 16, 3) and x.dtype == np.float32


def test_mctemporal_with_bands(tmp_path):
    _make_seco_tree(str(tmp_path), n_loc=2, n_time=3, size=16)
    ds = MCTemporal(str(tmp_path), image_size=16, seed=0, bands=["B4", "B3", "B2"])
    assert len(ds) == 2
    x = ds[0]
    assert x.shape == (4, 16, 16, 3)
    np.testing.assert_array_equal(x[0], x[3])  # [t0, t1, t2, t0] layout


def test_cli_bands_requires_three():
    import argparse

    from dinomc_tpu.cli.train_dino import get_args_parser, train_dino

    args = argparse.ArgumentParser(parents=[get_args_parser()]).parse_args([])
    args.bands = ["B2", "B3"]
    with pytest.raises(AssertionError, match="exactly 3"):
        train_dino(args)
