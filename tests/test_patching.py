"""Tests for patch tiling geometry (patch_cropper.py parity) and the
vectorized stitch + tiled inference path."""

import jax.numpy as jnp
import numpy as np

from dinomc_tpu.data import patching
from dinomc_tpu.eval.tiled_inference import evaluate_tiled, tiled_predict


def test_custom_grid_coords_exact_cover():
    coords = patching.custom_grid_coords(2160, 3840, 3, 4)
    assert len(coords) == 12
    assert coords[0] == (0, 720, 0, 960)
    assert coords[-1] == (1440, 2160, 2880, 3840)
    # non-overlapping exact cover
    canvas = np.zeros((2160, 3840), np.int32)
    for y0, y1, x0, x1 in coords:
        canvas[y0:y1, x0:x1] += 1
    assert (canvas == 1).all()


def test_overlap_grid_matches_reference_formula():
    """patch = stride*(1+o), step = stride*(1-o), clamped
    (patch_cropper.py:107-121)."""
    h, w, o = 100, 100, 0.2
    coords = patching.grid_coords(h, w, (2, 2), o)
    stride = 50
    pw = int(round(stride * 1.2))
    step = int(round(stride * 0.8))
    assert coords[0] == (0, pw, 0, pw)
    assert coords[1] == (0, pw, min(step, w - pw), min(step, w - pw) + pw)
    # all patches inside the image
    for y0, y1, x0, x1 in coords:
        assert 0 <= y0 and y1 <= h and 0 <= x0 and x1 <= w


def test_extract_and_stitch_roundtrip():
    img = jnp.arange(32 * 48 * 3, dtype=jnp.float32).reshape(32, 48, 3)
    coords = patching.custom_grid_coords(32, 48, 2, 2)
    patches = patching.extract_patches(img, coords)
    assert patches.shape == (4, 16, 24, 3)
    rebuilt = patching.stitch(patches, coords, (32, 48))
    np.testing.assert_array_equal(np.asarray(rebuilt), np.asarray(img))


def test_stitch_mean_overlap():
    coords = [(0, 4, 0, 4), (0, 4, 2, 6)]
    patches = jnp.stack([jnp.ones((4, 4, 1)), 3 * jnp.ones((4, 4, 1))])
    out = patching.stitch(patches, coords, (4, 6), mode="mean")
    np.testing.assert_allclose(np.asarray(out[:, 0:2, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(out[:, 2:4, 0]), 2.0)  # averaged
    np.testing.assert_allclose(np.asarray(out[:, 4:6, 0]), 3.0)


def test_metadata_roundtrip(tmp_path):
    coords = patching.custom_grid_coords(100, 100, 2, 2)
    meta = patching.coords_to_metadata(coords, "img0", cols=2)
    assert meta["img0_0_0.png"] == dict(x_start=0, y_start=0, x_end=50, y_end=50)
    path = str(tmp_path / "patches_metadata.json")
    patching.save_metadata(meta, path)
    loaded = patching.load_metadata(path)
    names = sorted(loaded.keys())
    back = patching.metadata_to_coords(loaded, names)
    assert set(back) == set(coords)


def test_split_and_save_files(tmp_path):
    img = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    mask = (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)
    meta = {}
    written = patching.split_and_save(
        img, mask, str(tmp_path / "img"), str(tmp_path / "msk"), "s1", grid=4, meta=meta
    )
    assert len(written) == 4
    assert (tmp_path / "img" / "s1_0_0.png").exists()
    assert (tmp_path / "msk" / "s1_1_1.png").exists()
    assert meta["s1_0_1.png"]["x_start"] == 32


def test_tiled_predict_identity_model():
    """A predict_fn that one-hot-encodes a known mask must reproduce it
    through tile -> resize -> stitch (2x2, no resize needed)."""
    H = W = 32
    mask = (np.indices((H, W)).sum(0) % 3).astype(np.int32)

    def predict_fn(x):  # x: (N, 16, 16, 3); channel 0 carries the class id
        cls = jnp.round(x[..., 0]).astype(jnp.int32)
        return jnp.eye(3)[cls] * 10.0

    img = jnp.asarray(mask)[..., None].repeat(3, -1).astype(jnp.float32)
    logits = tiled_predict(predict_fn, img, grid=(2, 2), model_size=None)
    pred = np.asarray(jnp.argmax(logits, -1))
    np.testing.assert_array_equal(pred, mask)


def test_stitch_from_files_roundtrip(tmp_path):
    """Write reference-format per-patch logits + metadata, read back, and
    recover the original canvas (UAVIDPatchStitch interop)."""
    import os

    from dinomc_tpu.eval.tiled_inference import stitch_from_files

    H, W, C = 32, 48, 5
    canvas = np.random.RandomState(0).randn(H, W, C).astype(np.float32)
    coords = patching.custom_grid_coords(H, W, 2, 2)
    meta = patching.coords_to_metadata(coords, "img7", cols=2)
    names = sorted(meta.keys())
    for n in names:
        m = meta[n]
        patch = canvas[m["y_start"] : m["y_end"], m["x_start"] : m["x_end"]]
        np.save(tmp_path / (os.path.splitext(n)[0] + ".npy"), patch.transpose(2, 0, 1))
    patching.save_metadata(meta, str(tmp_path / "patches_metadata.json"))

    out = stitch_from_files(
        str(tmp_path), str(tmp_path / "patches_metadata.json"), (H, W), "img7"
    )
    np.testing.assert_allclose(np.asarray(out), canvas, atol=1e-6)


def test_evaluate_tiled_perfect_prediction():
    H = W = 32
    mask = (np.indices((H, W)).sum(0) % 4).astype(np.int32)
    img = jnp.asarray(mask)[..., None].repeat(3, -1).astype(jnp.float32)

    def predict_fn(x):
        return jnp.eye(4)[jnp.round(x[..., 0]).astype(jnp.int32)] * 10.0

    out = evaluate_tiled(
        predict_fn, [(img, jnp.asarray(mask))], num_classes=4, grid=(2, 2), model_size=None
    )
    assert out["miou"] == 1.0 and out["acc"] == 1.0 and out["n_images"] == 1
