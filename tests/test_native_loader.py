"""Tests for the native C++ image loader (native/imgloader.cpp)."""

import numpy as np
import pytest
from PIL import Image

from dinomc_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(
    not nl.available(), reason="native imgloader not built (make -C native)"
)


@pytest.fixture(scope="module")
def png_path(tmp_path_factory):
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
    p = tmp_path_factory.mktemp("imgs") / "t.png"
    Image.fromarray(img).save(p)
    return str(p), img


def test_png_decode_exact(png_path):
    path, img = png_path
    out = nl.decode(path, 64, 80)
    np.testing.assert_array_equal(out, img)


def test_jpeg_decode_matches_pil(tmp_path):
    rng = np.random.RandomState(1)
    img = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "t.jpg")
    Image.fromarray(img).save(p, quality=90)
    out = nl.decode(p, 48, 48)
    ref = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(out, ref)  # same libjpeg underneath


def test_resize_matches_pil_bilinear(png_path):
    path, img = png_path
    for oh, ow in [(32, 40), (128, 160), (31, 77)]:
        out = nl.decode(path, oh, ow)
        ref = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BILINEAR))
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2


def test_batch_decode_threads(png_path):
    path, _ = png_path
    batch = nl.decode_batch([path] * 16, 32, 40, n_threads=4)
    assert batch.shape == (16, 32, 40, 3)
    single = nl.decode(path, 32, 40)
    for i in range(16):
        np.testing.assert_array_equal(batch[i], single)


def test_decode_failure_returns_none(tmp_path):
    bad = str(tmp_path / "nope.png")
    with open(bad, "wb") as f:
        f.write(b"not an image")
    assert nl.decode(bad, 8, 8) is None
    assert nl.decode_batch([bad], 8, 8) is None


def test_grid_crop(png_path):
    _, img = png_path
    tiles = nl.grid_crop(img, 2, 4)
    assert tiles.shape == (8, 32, 20, 3)
    np.testing.assert_array_equal(tiles[0], img[:32, :20])
    np.testing.assert_array_equal(tiles[7], img[32:, 60:80])


def test_seco_read_image_uses_native(png_path):
    from dinomc_tpu.data.seco import read_image

    path, img = png_path
    out = read_image(path, size=32)
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    ref = np.asarray(Image.fromarray(img).resize((32, 32), Image.BILINEAR)) / 255.0
    assert np.abs(out - ref).max() < 0.02
