"""Packed-shard dataset format: decode once offline, mmap at train time.

The reference feeds GPUs by re-decoding JPEG/TIFF in a 10-process PIL fork
pool every epoch (``main_dino_mc.py:195-201``, ``dino_dataset.py:16-30``).
At TPU pod scale that is the wrong trade: one v5e-8 host must assemble
~900 img/s (8 chips x ~111 img/s DINO-MC step rate), and image decode is
the dominant host cost. This module converts a corpus ONCE into fixed-size
raw uint8 records packed into large shard files; training then reads
records by ``memmap`` slice — a pure page-cache memcpy, no decode at all.

Layout of a packed dataset directory::

    index.json          {"record_shape": [H,W,C], "n": N,
                         "records_per_shard": R, "shards": [...],
                         "groups": [[rec,...],...], "names": [...]}
    shard-00000.bin     R records of H*W*C uint8, back to back
    shard-00001.bin     ...

``groups`` preserves the SeCo location structure (one subdirectory per
location, several timestamps each — ``dino_dataset.py:32-50``), so the
packed datasets reproduce ``MCBase`` / ``MCTemporal`` sampling semantics
exactly (one-random-record-per-group fixed at construction; 3 random
timestamps per epoch).

Batches stay uint8 end to end: the loader device_puts uint8 (4x less
host->device traffic than float32) and ``ops/augment.multicrop_augment``
converts to f32/255 on device as the first fused op of the aug chain.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

INDEX_NAME = "index.json"

_IMG_EXTS = (".tif", ".tiff", ".png", ".jpg", ".jpeg")


def is_packed(path: str) -> bool:
    return os.path.isfile(os.path.join(path, INDEX_NAME))


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _collect_groups(root: str) -> Tuple[List[List[str]], List[str]]:
    """SeCo layout (subdir per location) -> per-group file lists; a flat
    tree (no subdirs with images) degenerates to one group per file."""
    groups: List[List[str]] = []
    rootp = Path(root)
    for loc in sorted(rootp.iterdir()):
        if not loc.is_dir():
            continue
        files = sorted(
            str(f) for f in loc.rglob("*") if f.suffix.lower() in _IMG_EXTS
        )
        if files:
            groups.append(files)
    if not groups:
        flat = sorted(
            str(f) for f in rootp.rglob("*") if f.suffix.lower() in _IMG_EXTS
        )
        groups = [[f] for f in flat]
    names = [f for g in groups for f in g]
    return groups, names


def _decode_chunk(paths: Sequence[str], size: int, threads: int) -> np.ndarray:
    """(len(paths), size, size, 3) uint8 via the native C++ pool when
    possible, per-file ``seco.read_image`` otherwise (handles multispectral
    tifs and anything the native decoder rejects)."""
    from dinomc_tpu.data import native_loader
    from dinomc_tpu.data.seco import read_image

    if native_loader.available():
        out = native_loader.decode_batch(list(paths), size, size, threads)
        if out is not None:
            return out
    rows = []
    for p in paths:
        img = read_image(p, size=size)  # float32 [0,1]
        rows.append(np.round(img * 255.0).astype(np.uint8))
    return np.stack(rows)


def pack_dataset(
    src_root: str,
    out_dir: str,
    size: int = 256,
    records_per_shard: int = 2048,
    threads: int = 8,
    chunk: int = 256,
) -> dict:
    """Decode every image under ``src_root`` once into ``out_dir`` shards.

    Returns the index dict. Idempotent target: refuses to overwrite an
    existing packed dataset (delete the directory to re-pack)."""
    if is_packed(out_dir):
        raise FileExistsError(f"{out_dir} already holds a packed dataset")
    os.makedirs(out_dir, exist_ok=True)
    groups_files, names = _collect_groups(src_root)
    if not names:
        raise FileNotFoundError(f"no images under {src_root}")

    rec_bytes = size * size * 3
    shards: List[str] = []
    n_written = 0
    shard_f = None
    try:
        for start in range(0, len(names), chunk):
            batch = _decode_chunk(names[start : start + chunk], size, threads)
            for img in batch:
                if n_written % records_per_shard == 0:
                    if shard_f is not None:
                        shard_f.close()
                    shard_name = f"shard-{len(shards):05d}.bin"
                    shards.append(shard_name)
                    shard_f = open(os.path.join(out_dir, shard_name), "wb")
                shard_f.write(np.ascontiguousarray(img, np.uint8).tobytes())
                n_written += 1
    finally:
        if shard_f is not None:
            shard_f.close()

    # groups as record-id lists (records were written in group order)
    groups_ids: List[List[int]] = []
    cursor = 0
    for g in groups_files:
        groups_ids.append(list(range(cursor, cursor + len(g))))
        cursor += len(g)

    index = {
        "version": 1,
        "record_shape": [size, size, 3],
        "dtype": "uint8",
        "n": n_written,
        "record_bytes": rec_bytes,
        "records_per_shard": records_per_shard,
        "shards": shards,
        "groups": groups_ids,
        "names": [os.path.relpath(p, src_root) for p in names],
    }
    with open(os.path.join(out_dir, INDEX_NAME), "w") as f:
        json.dump(index, f)
    return index


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


class PackedReader:
    """mmap view over a packed dataset. ``record(i)`` is a ZERO-COPY uint8
    (H, W, C) view into the page cache; ``batch(ids)`` stacks (one memcpy
    per record — the only host work left at train time)."""

    def __init__(self, path: str):
        with open(os.path.join(path, INDEX_NAME)) as f:
            self.index = json.load(f)
        self.shape = tuple(self.index["record_shape"])
        self.n = int(self.index["n"])
        self.rps = int(self.index["records_per_shard"])
        self.groups: List[List[int]] = self.index["groups"]
        self._maps = []
        left = self.n
        for name in self.index["shards"]:
            k = min(self.rps, left)
            self._maps.append(
                np.memmap(
                    os.path.join(path, name),
                    dtype=np.uint8,
                    mode="r",
                    shape=(k,) + self.shape,
                )
            )
            left -= k

    def __len__(self) -> int:
        return self.n

    def record(self, i: int) -> np.ndarray:
        return self._maps[i // self.rps][i % self.rps]

    def batch(self, ids: Sequence[int]) -> np.ndarray:
        out = np.empty((len(ids),) + self.shape, np.uint8)
        for j, i in enumerate(ids):
            out[j] = self.record(int(i))
        return out


class PackedFlat:
    """Every record, one item each (``FlatImageFolder`` over packed data)."""

    def __init__(self, path: str, as_float: bool = False):
        self.reader = PackedReader(path)
        self.as_float = as_float

    def __len__(self) -> int:
        return len(self.reader)

    def __getitem__(self, i: int) -> np.ndarray:
        rec = np.asarray(self.reader.record(i))
        return rec.astype(np.float32) / 255.0 if self.as_float else rec


class PackedMC:
    """``MCBase`` over packed data: ONE random record per group, fixed at
    construction (``dino_dataset.py:40-50`` semantics)."""

    def __init__(self, path: str, seed: int = 0, as_float: bool = False):
        self.reader = PackedReader(path)
        self.as_float = as_float
        rng = np.random.RandomState(seed)
        self.samples = [g[rng.randint(len(g))] for g in self.reader.groups]

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i: int) -> np.ndarray:
        rec = np.asarray(self.reader.record(self.samples[i]))
        return rec.astype(np.float32) / 255.0 if self.as_float else rec


class PackedMCTemporal:
    """``MCTemporal`` over packed data: 3 random timestamps per item,
    reshuffled by ``set_epoch`` (``dino_dataset.py:89-128`` semantics);
    item layout matches ``data/seco.MCTemporal`` — (4, H, W, C) =
    [t0, t1, t2, t0]."""

    def __init__(self, path: str, seed: int = 0, as_float: bool = False):
        self.reader = PackedReader(path)
        self.as_float = as_float
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.reader.groups)

    def set_epoch(self, epoch: int) -> None:
        self._rng = np.random.RandomState(epoch)

    def __getitem__(self, i: int) -> np.ndarray:
        g = self.reader.groups[i]
        picks = self._rng.randint(len(g), size=3)
        t0, t1, t2 = (np.asarray(self.reader.record(g[j])) for j in picks)
        out = np.stack([t0, t1, t2, t0])
        return out.astype(np.float32) / 255.0 if self.as_float else out
