"""Downstream segmentation datasets: UAVid, UDD6, Potsdam, LoveDA.

Parity targets: the four reference dataset modules
(``data_process/uavid_dataset.py``, ``udd6_dataset.py``,
``potsdam_dataset.py``, ``loveda_dataset.py``, SURVEY.md §2.3). Class
names, palettes, normalization stats and augmentation policies are data
facts mirrored from there; the mechanics are TPU-first — host side does
only file listing + decode + resize, while flips/affine/jitter/normalize
run as batched device ops (``ops/spatial.py`` + ``ops/augment.py``) via
``augment_batch``.

Each dataset spec also covers the "patched" variants (tiles produced by
``data/patching.py``) — the loader just points at the patch directories.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dinomc_tpu.ops import augment as aug
from dinomc_tpu.ops import spatial


# ---------------------------------------------------------------------------
# dataset specs (constants mirrored from the reference modules)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SegDatasetSpec:
    name: str
    classes: Tuple[str, ...]
    palette: Tuple[Tuple[int, int, int], ...]
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]
    img_suffix: str = ".png"
    mask_suffix: str = ".png"
    mask_is_rgb: bool = True  # palette-coded masks need rgb->class
    affine: Optional[spatial.AffineConfig] = spatial.UAVID_AFFINE
    hflip_p: float = 0.5
    vflip_p: float = 0.2
    jitter: Tuple[float, float, float, float] = (0.2, 0.2, 0.2, 0.05)
    ignore_index: Optional[int] = None

    @property
    def num_classes(self) -> int:
        return len(self.classes)


_MMSEG_MEAN = (123.675 / 255.0, 116.28 / 255.0, 103.53 / 255.0)
_MMSEG_STD = (58.395 / 255.0, 57.12 / 255.0, 57.375 / 255.0)

UAVID = SegDatasetSpec(
    name="uavid",
    # uavid_dataset.py:18-39
    classes=("Clutter", "Building", "Road", "Tree", "LowVeg", "Moving_Car",
             "Static_Car", "Human"),
    palette=((0, 0, 0), (128, 0, 0), (128, 64, 128), (0, 128, 0),
             (128, 128, 0), (64, 0, 128), (192, 0, 192), (64, 64, 0)),
    mean=_MMSEG_MEAN,
    std=_MMSEG_STD,
    affine=spatial.UAVID_AFFINE,
)

UDD6 = SegDatasetSpec(
    name="udd6",
    # udd6_dataset.py:21-37
    classes=("Other", "Facade", "Road", "Vegetation", "Vehicle", "Roof"),
    palette=((0, 0, 0), (102, 102, 156), (128, 64, 128), (107, 142, 35),
             (0, 0, 142), (70, 70, 70)),
    mean=(0.3918, 0.4114, 0.3726),
    std=(0.1553, 0.1528, 0.1456),
    img_suffix=".JPG",
    mask_suffix=".png",
    affine=spatial.UDD6_AFFINE,
    vflip_p=0.5,  # udd6_dataset.py:157
)

POTSDAM = SegDatasetSpec(
    name="potsdam",
    # potsdam_dataset.py:16-41
    classes=("ImSurf", "Building", "LowVeg", "Tree", "Car", "Clutter"),
    palette=((255, 255, 255), (0, 0, 255), (0, 255, 255), (0, 255, 0),
             (255, 255, 0), (255, 0, 0)),
    mean=_MMSEG_MEAN,
    std=_MMSEG_STD,
    img_suffix=".tif",
    mask_suffix=".tif",
    affine=None,  # reference Potsdam pipeline has no affine aug
)

LOVEDA = SegDatasetSpec(
    name="loveda",
    # loveda_dataset.py: class 0 = NoData; masks already class-indexed
    classes=("NoData", "Background", "Building", "Road", "Water", "Barren",
             "Forest", "Agricultural"),
    palette=((0, 0, 0), (255, 255, 255), (255, 0, 0), (255, 255, 0),
             (0, 0, 255), (159, 129, 183), (0, 255, 0), (255, 195, 128)),
    mean=_MMSEG_MEAN,
    std=_MMSEG_STD,
    mask_is_rgb=False,  # loveda_dataset.py:160-162
    affine=None,
    ignore_index=0,
)

SPECS = {s.name: s for s in (UAVID, UDD6, POTSDAM, LOVEDA)}


# ---------------------------------------------------------------------------
# palette conversion (vectorized, no per-color python loop on device)
# ---------------------------------------------------------------------------


def rgb_to_class(mask_rgb: np.ndarray, spec: SegDatasetSpec) -> np.ndarray:
    """(H, W, 3) uint8 palette mask -> (H, W) class indices. Unknown colors
    map to 0 (reference ``rgb_to_class`` zero-init behavior,
    ``uavid_dataset.py:103-110``)."""
    palette = np.asarray(spec.palette, np.int32)  # (C, 3)
    flat = mask_rgb.reshape(-1, 3).astype(np.int32)
    # encode colors to scalars for one vectorized comparison
    code = flat[:, 0] * 65536 + flat[:, 1] * 256 + flat[:, 2]
    pcode = palette[:, 0] * 65536 + palette[:, 1] * 256 + palette[:, 2]
    eq = code[:, None] == pcode[None, :]  # (N, C)
    cls = np.where(eq.any(1), eq.argmax(1), 0).astype(np.uint8)
    return cls.reshape(mask_rgb.shape[:2])


def class_to_rgb(mask: np.ndarray, spec: SegDatasetSpec) -> np.ndarray:
    """(H, W) class indices -> (H, W, 3) uint8 palette visualization
    (reference ``class_to_rgb``)."""
    palette = np.asarray(spec.palette, np.uint8)
    return palette[np.clip(mask, 0, spec.num_classes - 1)]


# ---------------------------------------------------------------------------
# host-side index + decode
# ---------------------------------------------------------------------------


class SegSampleIndex:
    """Lists (image, mask) pairs by shared stem from two directories —
    covers the original and 'patched' layouts of all four datasets."""

    def __init__(
        self,
        img_dir: str,
        mask_dir: str,
        spec: SegDatasetSpec,
        image_size: int = 224,
    ):
        self.spec = spec
        self.image_size = image_size
        self.img_dir, self.mask_dir = img_dir, mask_dir
        suffix = spec.img_suffix.lower()
        stems = sorted(
            p.stem for p in Path(img_dir).iterdir()
            if p.suffix.lower() in (suffix, ".png", ".jpg", ".jpeg", ".tif")
        )
        self.stems = [
            s for s in stems
            if self._find_mask(s) is not None
        ]

    def _find_mask(self, stem: str) -> Optional[str]:
        stem = self._mask_stem(stem)
        for suf in (self.spec.mask_suffix, ".png", ".tif"):
            p = os.path.join(self.mask_dir, stem + suf)
            if os.path.exists(p):
                return p
        return None

    def _find_img(self, stem: str) -> str:
        for suf in (self.spec.img_suffix, ".png", ".jpg", ".JPG", ".tif"):
            p = os.path.join(self.img_dir, stem + suf)
            if os.path.exists(p):
                return p
        raise FileNotFoundError(stem)

    @classmethod
    def potsdam_pairs(
        cls,
        root: str,
        spec: SegDatasetSpec,
        split: str = "train",
        val_frac: float = 0.1,
        seed: int = 42,
        image_size: int = 224,
    ) -> "SegSampleIndex":
        """Potsdam layout: one directory of ``Image_*.tif`` / ``Label_*.tif``
        pairs with an in-memory seeded 90/10 train/val split (reference
        ``potsdam_dataset.py:185-189``)."""
        self = cls.__new__(cls)
        self.spec = spec
        self.image_size = image_size
        self.img_dir = self.mask_dir = root
        stems = sorted(
            p.stem for p in Path(root).iterdir() if p.stem.startswith("Image_")
        )
        rng = np.random.RandomState(seed)
        order = rng.permutation(len(stems))
        n_val = max(int(round(len(stems) * val_frac)), 1) if stems else 0
        pick = order[n_val:] if split == "train" else order[:n_val]
        self.stems = [stems[i] for i in sorted(pick)]
        return self

    def _mask_stem(self, stem: str) -> str:
        if stem.startswith("Image_"):
            return "Label_" + stem[len("Image_"):]
        return stem

    def __len__(self) -> int:
        return len(self.stems)

    def load(self, i: int, size: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (image float32 [0,1] (S,S,3), mask int32 (S,S)).

        Resize: image bicubic, mask nearest — reference
        ``uavid_dataset.py:237-238`` semantics.
        """
        from PIL import Image

        size = size or self.image_size
        stem = self.stems[i]
        img = Image.open(self._find_img(stem)).convert("RGB")
        mask_img = Image.open(self._find_mask(stem))
        if size is not None:
            img = img.resize((size, size), Image.BICUBIC)
            mask_img = mask_img.resize((size, size), Image.NEAREST)
        img_np = np.asarray(img, np.float32) / 255.0
        if self.spec.mask_is_rgb:
            mask_np = rgb_to_class(np.asarray(mask_img.convert("RGB")), self.spec)
        else:
            mask_np = np.asarray(mask_img.convert("L"))
        return img_np, mask_np.astype(np.int32)

    def batches(self, batch_size: int, shuffle: bool = False, seed: int = 0,
                drop_last: bool = True):
        """Yield (images (B,S,S,3) f32 in [0,1], masks (B,S,S) i32) numpy."""
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        end = len(order) - (len(order) % batch_size if drop_last else 0)
        for s in range(0, end, batch_size):
            idx = order[s : s + batch_size]
            if len(idx) == 0:
                continue
            pairs = [self.load(int(i)) for i in idx]
            yield (
                np.stack([p[0] for p in pairs]),
                np.stack([p[1] for p in pairs]),
            )


# ---------------------------------------------------------------------------
# device-side train/eval transforms
# ---------------------------------------------------------------------------


def augment_batch(
    rng: jax.Array,
    images: jnp.ndarray,  # (B, S, S, 3) in [0,1]
    masks: jnp.ndarray,  # (B, S, S) int
    spec: SegDatasetSpec,
    train: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The train transform of the reference seg datasets as one device op:
    joint flips + affine OneOf + image-only ColorJitter + normalize."""
    if not train:
        return aug.normalize(images, spec.mean, spec.std), masks
    k1, k2, k3 = jax.random.split(rng, 3)
    images, masks = spatial.joint_flip(k1, images, masks, spec.hflip_p, spec.vflip_p)
    if spec.affine is not None:
        images, masks = spatial.random_affine_pair(k2, images, masks, spec.affine)
    b, c, s, h = spec.jitter
    images = aug.color_jitter(k3, images, b, c, s, h, p=1.0)
    return aug.normalize(images, spec.mean, spec.std), masks
