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
    family: str = "v1",
) -> Tuple[np.ndarray, np.ndarray]:
    """Labeled texture images, shuffled: (N, size, size, 3) f32 + (N,) int."""
    gen = TEXTURES[family]
    rng = np.random.RandomState(seed)
    xs, ys = [], []
    for c in range(num_classes):
        for _ in range(n_per_class):
            xs.append(colorize(gen(c, size, rng), rng))
            ys.append(c)
    order = rng.permutation(len(xs))
    return np.stack(xs)[order], np.asarray(ys)[order]


def texture_v2(c: int, size: int, rng: np.random.RandomState) -> np.ndarray:
    """Hardened texture family ``c`` (r3 verdict #3): the v1 family plus a
    strong CROSS-CLASS distractor overlay, so random-feature readouts stop
    saturating while the class signal stays DINO-learnable.

    Each sample mixes its class texture (amplitude 1-a) with a random
    OTHER family's texture (amplitude a ~ U[0.35, 0.48], always
    subordinate). A readout over random features sees family-energy
    statistics from BOTH components and must learn to weight the dominant
    one; learned features that cluster by dominant family separate
    directly.

    Design history: a purely second-order world (class = relative
    angle/frequency-ratio/waveform relations between two stripe fields
    with ALL first-order statistics randomized) drove random features to
    chance (probe 17.9%, 5-NN 12.8%) but was NOT learnable by DINO at toy
    scale — 2000 steps pinned at the ln(K) collapse plateau, k-NN 7.8%
    (chance 12.5): with no first-order signal the SSL objective has
    nothing to bootstrap from. The distractor mix is the measured middle
    ground (96 px, random vit_tiny, standardized pooled linear probe):
    v1 48.7% / 5-NN 17.9%  ->  v2 35.9% / 5-NN 15.4%, while the dominant
    component keeps the v1 learning signal. Numbers: docs/quality.md r4.
    """
    return _texture_mix(c, size, rng, 0.35, 0.48)


def texture_v2m(c: int, size: int, rng: np.random.RandomState) -> np.ndarray:
    """Milder distractor mix (a ~ U[0.20, 0.35]) — the intermediate point
    on the measured discriminativeness <-> learnability frontier
    (docs/quality.md r4)."""
    return _texture_mix(c, size, rng, 0.20, 0.35)


def _texture_mix(c, size, rng, lo, hi):
    a = lo + (hi - lo) * rng.rand()
    d = (c + 1 + rng.randint(NUM_CLASSES - 1)) % NUM_CLASSES
    t = (1 - a) * texture(c, size, rng) + a * texture(d, size, rng)
    return np.clip(t, 0.0, 1.0)


TEXTURES = {"v1": texture, "v2": texture_v2, "v2m": texture_v2m}


def make_change_pair(
    size: int,
    rng: np.random.RandomState,
    num_classes: int = NUM_CLASSES,
    n_seeds: int = 6,
    n_change: int = 2,
    family: str = "v1",
    drift: str = "color",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Before/after scene pair with a known change mask (the OSCD learning
    world, r3 verdict weak #4).

    Both acquisitions share one Voronoi layout. ``n_change`` random cells
    get a DIFFERENT texture class in the "after" image, while every cell
    also suffers acquisition drift (the synthetic analog of
    season/illumination change between Sentinel-2 passes), so naive pixel
    differencing fires everywhere:

    * ``drift='color'`` — unchanged cells keep their texture STRUCTURE
      (same field, phase, orientation) but are re-colorized with fresh
      tint/brightness/noise. The change signal is structural; measured
      (docs/quality.md r4) this is the regime where a frozen pretrained
      encoder's margin over random shows at useful absolute F1.
    * ``drift='full'`` — unchanged cells are re-rendered with entirely
      fresh nuisance (new orientation/phase too): change is texture CLASS
      only. Measured: both frozen encoders land under the all-positive
      trivial baseline at toy scale (pretrained sustains F1 ~14 vs
      random ~4 — the margin is real but the absolute task is
      near-impossible for a frozen-feature decoder).

    Returns (img1, img2, change_mask): two (size, size, 3) f32 images and
    a (size, size) float mask in {0, 1}.
    """
    gen = TEXTURES[family]
    pts = rng.rand(n_seeds, 2) * size
    cls1 = rng.randint(0, num_classes, n_seeds)
    cls2 = cls1.copy()
    changed = rng.choice(n_seeds, size=min(n_change, n_seeds), replace=False)
    for s in changed:
        cls2[s] = (cls1[s] + 1 + rng.randint(num_classes - 1)) % num_classes
    yy, xx = np.mgrid[0:size, 0:size]
    d2 = (yy[..., None] - pts[:, 0]) ** 2 + (xx[..., None] - pts[:, 1]) ** 2
    cell = np.argmin(d2, axis=-1)
    mask = np.isin(cell, changed).astype(np.float32)
    img1 = np.zeros((size, size, 3), np.float32)
    img2 = np.zeros((size, size, 3), np.float32)
    for s in range(n_seeds):
        sel = cell == s
        if not sel.any():
            continue
        t1 = gen(int(cls1[s]), size, rng)
        img1[sel] = colorize(t1, rng)[sel]
        if s in changed or drift == "full":
            t2 = gen(int(cls2[s]), size, rng)
        else:
            t2 = t1  # same structure, fresh colorize below
        img2[sel] = colorize(t2, rng)[sel]
    return img1, img2, mask


def make_seg_scene(
    size: int,
    rng: np.random.RandomState,
    num_classes: int = NUM_CLASSES,
    n_seeds: int = 6,
    family: str = "v1",
) -> Tuple[np.ndarray, np.ndarray]:
    """One Voronoi-composed segmentation scene: (size, size, 3) f32 image +
    (size, size) int mask. Each Voronoi cell is filled from a full-size
    texture of a random class, so class identity is carried by texture, not
    color or position — pretrained texture features transfer directly."""
    gen = TEXTURES[family]
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
            img[sel] = colorize(gen(int(cls[s]), size, rng), rng)[sel]
    return img, mask
