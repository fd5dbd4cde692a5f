"""Synthetic structured imagery for dataset-free validation runs.

Eight texture families (stripes / checker / dots / rings / starburst /
blobs / speckle / crosshatch) whose identity survives the DINO
augmentations while orientation, scale, phase, color, brightness and noise
vary per sample — so SSL pretraining on them has a real signal to learn,
and segmentation scenes composed from them have a ground truth that
frozen pretrained features genuinely help predict. Used by
``scripts/validate_learning.py`` (k-NN / linear-probe climb) and
``scripts/full_chain.py`` (pretrain -> convert -> seg fine-tune ->
stitched eval).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

NUM_CLASSES = 8


def texture(c: int, size: int, rng: np.random.RandomState) -> np.ndarray:
    """One (size, size) float grayscale texture of family ``c`` with random
    nuisance parameters (orientation/scale/phase/center)."""
    yy, xx = np.mgrid[0:size, 0:size] / size - 0.5
    f = 4 + 6 * rng.rand()
    a = rng.rand() * np.pi
    p = rng.rand() * 2 * np.pi
    rloc = 0.3 * (rng.rand(2) - 0.5)

    def stripes(f_, a_, p_):
        return 0.5 + 0.5 * np.sin(
            2 * np.pi * f_ * (np.cos(a_) * xx + np.sin(a_) * yy) + p_
        )

    u = np.cos(a) * xx + np.sin(a) * yy
    v = -np.sin(a) * xx + np.cos(a) * yy
    r = np.sqrt((xx - rloc[0]) ** 2 + (yy - rloc[1]) ** 2)
    if c == 0:  # stripes
        return stripes(f, a, p)
    if c == 1:  # checkerboard
        return (np.floor(u * f) + np.floor(v * f)) % 2
    if c == 2:  # dot grid
        return (np.sin(2 * np.pi * f * u + p) * np.sin(2 * np.pi * f * v + p) > 0.3) * 1.0
    if c == 3:  # concentric rings
        return 0.5 + 0.5 * np.sin(2 * np.pi * f * r + p)
    if c == 4:  # radial starburst
        theta = np.arctan2(yy - rloc[1], xx - rloc[0])
        return 0.5 + 0.5 * np.sin(int(f) * 2 * theta + p)
    if c == 5:  # smooth blobs (low-frequency noise)
        big = np.zeros((size, size))
        big[:8, :8] = rng.randn(8, 8)
        out = np.real(np.fft.ifft2(np.fft.fft2(big)))
        return (out - out.min()) / max(np.ptp(out), 1e-9)
    if c == 6:  # fine speckle
        return (rng.rand(size, size) > 0.5) * 1.0
    # crosshatch: two orthogonal stripe fields
    return np.maximum(stripes(f, a, p), stripes(f, a + np.pi / 2, p))


def colorize(tex: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Grayscale texture -> (H, W, 3) float32 [0,1] with random tint,
    brightness and additive noise."""
    color = 0.3 + 0.7 * rng.rand(3)
    img = tex[..., None] * color[None, None]
    img = img * (0.6 + 0.4 * rng.rand()) + 0.08 * rng.randn(*tex.shape, 3)
    return np.clip(img, 0, 1).astype(np.float32)


def make_texture_dataset(
    n_per_class: int = 64,
    size: int = 128,
    num_classes: int = NUM_CLASSES,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Labeled texture images, shuffled: (N, size, size, 3) f32 + (N,) int."""
    rng = np.random.RandomState(seed)
    xs, ys = [], []
    for c in range(num_classes):
        for _ in range(n_per_class):
            xs.append(colorize(texture(c, size, rng), rng))
            ys.append(c)
    order = rng.permutation(len(xs))
    return np.stack(xs)[order], np.asarray(ys)[order]


def make_seg_scene(
    size: int,
    rng: np.random.RandomState,
    num_classes: int = NUM_CLASSES,
    n_seeds: int = 6,
) -> Tuple[np.ndarray, np.ndarray]:
    """One Voronoi-composed segmentation scene: (size, size, 3) f32 image +
    (size, size) int mask. Each Voronoi cell is filled from a full-size
    texture of a random class, so class identity is carried by texture, not
    color or position — pretrained texture features transfer directly."""
    pts = rng.rand(n_seeds, 2) * size
    cls = rng.randint(0, num_classes, n_seeds)
    yy, xx = np.mgrid[0:size, 0:size]
    d2 = (yy[..., None] - pts[:, 0]) ** 2 + (xx[..., None] - pts[:, 1]) ** 2
    cell = np.argmin(d2, axis=-1)  # (H, W) -> seed index
    mask = cls[cell].astype(np.int32)
    img = np.zeros((size, size, 3), np.float32)
    for s in range(n_seeds):
        sel = cell == s
        if sel.any():
            img[sel] = colorize(texture(int(cls[s]), size, rng), rng)[sel]
    return img, mask
