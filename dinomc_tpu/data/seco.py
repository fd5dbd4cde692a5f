"""SeCo-style self-supervised pretraining datasets.

Parity targets (``data_process/dino_dataset.py``):
  * ``MCBase`` (``:32-66``) — each subdirectory of the root is one location;
    ONE random image per location is chosen at construction
    (``get_img_info``, ``:40-50``); an epoch iterates locations.
  * ``MCTemporal`` (``:89-128``) — per __getitem__, sample 3 random
    timestamps t0/t1/t2 from the location dir and return
    ``[base, t1, t2, t0-as-4th]`` for the temporal-positive augmentation
    (the device-side aug is ``ops/augment.multicrop_augment_tp``).
  * ``read_image``/``normalize`` (``:16-30``) — RGB via PIL; multispectral
    Sentinel-2 via per-band quantile normalization to uint8 with the B2/B3/B4
    quantiles below (rasterio is optional; gated import).

TPU-first split of responsibilities: these classes only produce raw
float32 [0,1] image batches on the host; ALL stochastic augmentation (the
reference's PIL transform stack) runs on device (``ops/augment.py``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

RGB_BANDS = ["B4", "B3", "B2"]
# Sentinel-2 per-band (1%, 99%) quantiles (dino_dataset.py:19-24)
QUANTILES = {"B2": (3.0, 88.0), "B3": (2.0, 103.0), "B4": (0.0, 129.0)}

_IMG_EXTS = (".tif", ".tiff", ".png", ".jpg", ".jpeg")


def _normalize_band(band: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Quantile-normalize a raw band to uint8 (``dino_dataset.py:26-30``)."""
    band = (band - lo) / max(hi - lo, 1e-12) * 255.0
    return np.clip(band, 0, 255).astype(np.uint8)


def read_image(path: str, bands: Sequence[str] = RGB_BANDS, size: Optional[int] = None) -> np.ndarray:
    """Read one image -> float32 [0,1] (H, W, 3).

    RGB files via PIL; ``.tif`` with band structure via rasterio if
    available (multispectral Sentinel-2 path), else PIL fallback.
    """
    p = str(path)
    if size is not None and p.lower().endswith((".png", ".jpg", ".jpeg")):
        # native C++ decode+resize fast path (see data/native_loader.py)
        from dinomc_tpu.data import native_loader

        if native_loader.available():
            out = native_loader.decode(p, size, size)
            if out is not None:
                return out.astype(np.float32) / 255.0
    if p.lower().endswith((".tif", ".tiff")):
        try:
            import rasterio  # optional

            with rasterio.open(p) as src:
                if src.count >= 3 and bands == RGB_BANDS:
                    chans = []
                    for i, b in enumerate(bands):
                        raw = src.read(i + 1).astype(np.float32)
                        lo, hi = QUANTILES.get(b, (raw.min(), raw.max()))
                        chans.append(_normalize_band(raw, lo, hi))
                    img = np.stack(chans, axis=-1)
                else:
                    img = np.moveaxis(src.read()[:3], 0, -1).astype(np.uint8)
        except ImportError:
            img = _pil_read(p)
    else:
        img = _pil_read(p)
    if size is not None and img.shape[:2] != (size, size):
        from PIL import Image

        img = np.asarray(
            Image.fromarray(img).resize((size, size), Image.BICUBIC)
        )
    return img.astype(np.float32) / 255.0


def _pil_read(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


class MCBase:
    """One-random-image-per-location dataset (``MCBase``,
    ``dino_dataset.py:32-66``)."""

    def __init__(self, root: str, image_size: int = 256, seed: int = 0):
        self.root = root
        self.image_size = image_size
        rng = np.random.RandomState(seed)
        self.samples: List[str] = []
        for loc in sorted(Path(root).iterdir()):
            if not loc.is_dir():
                continue
            files = sorted(
                str(f) for f in loc.iterdir() if f.suffix.lower() in _IMG_EXTS
            )
            if files:
                # one random timestamp per location, fixed at construction
                self.samples.append(files[rng.randint(len(files))])

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i: int) -> np.ndarray:
        return read_image(self.samples[i], size=self.image_size)


class MCTemporal:
    """Temporal-positives dataset (``MCTemporal``, ``dino_dataset.py:89-128``):
    each item is (4, H, W, 3) = [base, t1, t2, t3] sampled with replacement
    from the location's timestamps."""

    def __init__(self, root: str, image_size: int = 256, seed: int = 0):
        self.image_size = image_size
        self.locations: List[List[str]] = []
        for loc in sorted(Path(root).iterdir()):
            if not loc.is_dir():
                continue
            files = sorted(
                str(f) for f in loc.iterdir() if f.suffix.lower() in _IMG_EXTS
            )
            if files:
                self.locations.append(files)
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.locations)

    def set_epoch(self, epoch: int) -> None:
        self._rng = np.random.RandomState(epoch)

    def __getitem__(self, i: int) -> np.ndarray:
        files = self.locations[i]
        picks = self._rng.randint(len(files), size=3)
        t0, t1, t2 = (read_image(files[j], size=self.image_size) for j in picks)
        return np.stack([t0, t1, t2, t0], axis=0)


class FlatImageFolder:
    """All images under a directory tree (non-SeCo corpora, e.g. patched
    aerial tiles used as a pretraining pool)."""

    def __init__(self, root: str, image_size: int = 256):
        self.image_size = image_size
        self.samples = sorted(
            str(p)
            for p in Path(root).rglob("*")
            if p.suffix.lower() in _IMG_EXTS
        )

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i: int) -> np.ndarray:
        return read_image(self.samples[i], size=self.image_size)
