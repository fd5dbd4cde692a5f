"""Tiled full-resolution segmentation inference + stitched evaluation.

One XLA-side pipeline replacing the reference's three-script flow
(SURVEY.md §3.4: patch export -> .npy logits -> stitch+eval): extract a
static patch grid from a 4K image, run batched whole-tile inference at the
model resolution, resize logits back to patch size, paste into the
full-resolution canvas, and stream per-class IoU stats
(reference ``inference_dino_mc_patched_dataset.py:52-63``,
``UAVIDPatchStitch`` ``uavid_dataset.py:279-397``, ``evaluate.py:30-54``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dinomc_tpu.data import patching
from dinomc_tpu.eval import metrics


def tiled_predict(
    predict_fn: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,  # (H, W, 3) normalized full-res image
    grid: Tuple[int, int] = (2, 2),
    model_size: Optional[int] = 224,
    overlap_ratio: float = 0.0,
    stitch_mode: str = "paste",
) -> jnp.ndarray:
    """Full-resolution class logits (H, W, C).

    predict_fn: batched (N, s, s, 3) -> (N, s, s, C) eval-mode model logits.
    Patches are resized to ``model_size`` for inference (the reference
    resizes patches to 224 in the dataset, ``uavid_dataset.py:237-243``) and
    logits are bicubic-resized back to patch resolution before stitching
    (``uavid_dataset.py:371-374``).
    """
    H, W, _ = image.shape
    if overlap_ratio > 0:
        coords = patching.grid_coords(H, W, grid, overlap_ratio)
    else:
        coords = patching.custom_grid_coords(H, W, grid[0], grid[1])
    patches = patching.extract_patches(image, coords)  # (N, ph, pw, 3)
    N, ph, pw, _ = patches.shape
    if model_size is not None and (ph, pw) != (model_size, model_size):
        x = jax.image.resize(patches, (N, model_size, model_size, 3), "bicubic")
    else:
        x = patches
    logits = predict_fn(x)  # (N, s, s, C)
    C = logits.shape[-1]
    if logits.shape[1:3] != (ph, pw):
        logits = jax.image.resize(logits, (N, ph, pw, C), "bicubic")
    return patching.stitch(logits, coords, (H, W), mode=stitch_mode)


def stitch_from_files(
    logits_dir: str,
    metadata_path: str,
    canvas_hw: Tuple[int, int],
    basename: Optional[str] = None,
    mode: str = "paste",
) -> jnp.ndarray:
    """Rebuild a full-resolution logit canvas from per-patch ``.npy`` files +
    ``patches_metadata.json`` — the reference's stitcher input format
    (``UAVIDPatchStitch``, ``uavid_dataset.py:279-397``; logits stored CHW).
    Groups by basename when given; otherwise uses every entry. Logits whose
    spatial size mismatches their metadata box are bicubic-resized
    (``uavid_dataset.py:371-374``)."""
    import os

    import numpy as np

    from dinomc_tpu.data.patching import load_metadata

    meta = load_metadata(metadata_path)
    names = sorted(
        n for n in meta
        if basename is None or os.path.splitext(n)[0].startswith(basename)
    )
    coords = []
    patches = []
    for n in names:
        m = meta[n]
        stem = os.path.splitext(n)[0]
        arr = np.load(os.path.join(logits_dir, stem + ".npy"))  # (C, h, w)
        arr = jnp.asarray(arr).transpose(1, 2, 0)  # -> (h, w, C)
        ph, pw = m["y_end"] - m["y_start"], m["x_end"] - m["x_start"]
        if arr.shape[:2] != (ph, pw):
            arr = jax.image.resize(arr, (ph, pw, arr.shape[-1]), "bicubic")
        coords.append((m["y_start"], m["y_end"], m["x_start"], m["x_end"]))
        patches.append(arr)
    from dinomc_tpu.data.patching import stitch as _stitch

    return _stitch(jnp.stack(patches), coords, canvas_hw, mode=mode)


def evaluate_tiled(
    predict_fn: Callable[[jnp.ndarray], jnp.ndarray],
    samples,  # iterable of (image (H,W,3) normalized, mask (H,W) int)
    num_classes: int,
    grid: Tuple[int, int] = (2, 2),
    model_size: int = 224,
    overlap_ratio: float = 0.0,
) -> Dict:
    """Streaming stitched eval over full-resolution samples — parity with
    ``evaluate.py``'s per-class inter/union/correct accumulation."""
    stats = metrics.seg_stats_init(num_classes)
    n = 0
    for image, mask in samples:
        logits = tiled_predict(
            predict_fn, image, grid, model_size, overlap_ratio
        )
        pred = jnp.argmax(logits, axis=-1)
        stats = metrics.seg_stats_update(stats, pred, mask)
        n += 1
    out = metrics.seg_stats_finalize(stats)
    out["n_images"] = n
    return out
