"""Host input-pipeline throughput: can the host feed the chip?

The DINO-MC step consumes ~108 img/s/chip (bench.py); the reference feeds
its GPUs with a 10-process PIL fork pool (``main_dino_mc.py:195-201``).
Our host path is ``data/loader.PrefetchLoader`` (threaded batch assembly +
device_put) over ``data/seco.read_image`` (native C++ decode+resize via
``native/imgloader.cpp`` when available, PIL fallback). This script
measures each stage on synthetic JPEGs at SeCo-like source resolution and
prints one JSON line per measurement:

  * ``decode_native_tN``  — raw C++ decode_batch at N threads
  * ``decode_pil``        — PIL open+convert+resize, single thread
  * ``decode_tiff_*``     — same file set as TIFF (SeCo's native format):
                            native libtiff path vs PIL fallback
  * ``loader_sustained``  — PrefetchLoader end-to-end feed rate (decode ->
                            collate -> device_put), no consumer back-pressure
  * ``loader_overlapped`` — same, consumer simulating a busy accelerator
                            (sleep = B / target img/s per batch): measures
                            whether prefetch hides host IO behind the step
  * ``packed_*``          — the decode-once packed-shard path
                            (data/packed.py): raw mmap batch-assembly rate,
                            loader-sustained rate, and the overlapped run
                            against an 8-chip demand (--pod_target) —
                            the production v5e-8 host budget

Run: python scripts/bench_input.py [--n 512] [--src 264] [--out 256] [--batch 24]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpegs(root: str, n: int, src: int) -> list:
    from PIL import Image

    rng = np.random.RandomState(0)
    # low-frequency content so JPEG size/decode cost is realistic for
    # aerial imagery (pure noise inflates entropy coding far beyond real
    # Sentinel-2 tiles)
    paths = []
    for i in range(n):
        small = rng.randint(0, 255, (src // 8, src // 8, 3), np.uint8)
        img = Image.fromarray(small).resize((src, src), Image.BICUBIC)
        p = os.path.join(root, f"img_{i:05d}.jpg")
        img.save(p, quality=90)
        paths.append(p)
    return paths


def emit(name: str, img_s: float, **extra) -> None:
    print(json.dumps({"metric": name, "value": round(img_s, 1),
                      "unit": "images/sec", **extra}), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--src", type=int, default=264, help="source JPEG px")
    ap.add_argument("--out", type=int, default=256, help="decode target px")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--target", type=float, default=108.0,
                    help="chip demand (img/s) the overlapped run simulates")
    ap.add_argument("--pod_target", type=float, default=111.0 * 8,
                    help="v5e-8 host demand (img/s) for the packed runs")
    args = ap.parse_args()

    from dinomc_tpu.data import native_loader
    from dinomc_tpu.data.loader import PrefetchLoader, ShardedSampler
    from dinomc_tpu.data.seco import read_image

    tmp = tempfile.mkdtemp(prefix="bench_input_")
    paths = make_jpegs(tmp, args.n, args.src)

    # --- raw native decode ---------------------------------------------
    if native_loader.available():
        for nt in (1, 2, 4, 8):
            native_loader.decode_batch(paths[:32], args.out, args.out, nt)  # warm
            t0 = time.perf_counter()
            out = native_loader.decode_batch(paths, args.out, args.out, nt)
            dt = time.perf_counter() - t0
            assert out is not None and out.shape == (args.n, args.out, args.out, 3)
            emit(f"decode_native_t{nt}", args.n / dt, threads=nt)
    else:
        print(json.dumps({"metric": "decode_native", "value": None,
                          "note": "native loader unavailable"}), flush=True)

    # --- PIL fallback ----------------------------------------------------
    from PIL import Image

    t0 = time.perf_counter()
    for p in paths:
        with Image.open(p) as im:
            np.asarray(
                im.convert("RGB").resize((args.out, args.out), Image.BICUBIC)
            )
    emit("decode_pil", args.n / (time.perf_counter() - t0))

    # --- full loader path -------------------------------------------------
    class JpegDataset:
        def __len__(self):
            return len(paths)

        def __getitem__(self, i):
            return read_image(paths[i], size=args.out)

    import jax

    # honor JAX_PLATFORMS=cpu despite the axon sitecustomize force-set
    # (same dance as __graft_entry__.dryrun_multichip) — lets the host-IO
    # bench run while the real chip is busy with a training job
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    sharding = jax.devices()[0]

    def run_loader(step_time: float) -> float:
        sampler = ShardedSampler(len(paths), args.batch, shuffle=False)
        loader = PrefetchLoader(
            JpegDataset(), sampler, sharding=sharding, prefetch=2, num_threads=8
        )
        seen, t0 = 0, time.perf_counter()
        for batch in loader:
            seen += batch.shape[0]
            if step_time:
                time.sleep(step_time)
        # subtract the simulated compute: what's left is exposed host time
        return seen, time.perf_counter() - t0

    seen, dt = run_loader(0.0)
    emit("loader_sustained", seen / dt, batch=args.batch)

    step_time = args.batch / args.target
    seen, dt = run_loader(step_time)
    ideal = (seen / args.batch) * step_time
    emit("loader_overlapped", seen / dt, batch=args.batch,
         target=args.target, exposed_host_frac=round(max(dt - ideal, 0) / dt, 3))

    # --- TIFF decode (SeCo's native format) -------------------------------
    from PIL import Image as PILImage

    tif_paths = []
    for i, p in enumerate(paths[: min(args.n, 256)]):
        with PILImage.open(p) as im:
            tp = p[:-4] + ".tif"
            im.save(tp)  # uncompressed striped TIFF
            tif_paths.append(tp)
    if native_loader.available():
        native_loader.decode_batch(tif_paths[:16], args.out, args.out, 8)
        t0 = time.perf_counter()
        out = native_loader.decode_batch(tif_paths, args.out, args.out, 8)
        dt = time.perf_counter() - t0
        if out is not None:
            emit("decode_tiff_native_t8", len(tif_paths) / dt)
    t0 = time.perf_counter()
    for p in tif_paths:
        with PILImage.open(p) as im:
            np.asarray(im.convert("RGB").resize((args.out, args.out),
                                                PILImage.BICUBIC))
    emit("decode_tiff_pil", len(tif_paths) / (time.perf_counter() - t0))
    for p in tif_paths:
        os.unlink(p)

    # --- packed-shard path -------------------------------------------------
    from dinomc_tpu.data import packed

    pk_dir = os.path.join(tmp, "packed")
    t0 = time.perf_counter()
    packed.pack_dataset(tmp, pk_dir, size=args.out)
    emit("pack_convert", args.n / (time.perf_counter() - t0))

    reader = packed.PackedReader(pk_dir)
    ids = np.arange(len(reader))
    # raw mmap batch assembly (decode-free host work at train time)
    reader.batch(ids[: args.batch])  # touch pages once
    t0 = time.perf_counter()
    for s in range(0, len(ids) - args.batch + 1, args.batch):
        reader.batch(ids[s : s + args.batch])
    n_read = (len(ids) // args.batch) * args.batch
    emit("packed_assembly", n_read / (time.perf_counter() - t0))

    ds = packed.PackedFlat(pk_dir)  # uint8 items: conversion happens on device

    def run_packed(step_time: float, epochs: int = 4):
        sampler = ShardedSampler(len(ds), args.batch, shuffle=True)
        loader = PrefetchLoader(ds, sampler, sharding=sharding,
                                prefetch=2, num_threads=8)
        seen, t0 = 0, time.perf_counter()
        for _ in range(epochs):
            for batch in loader:
                seen += batch.shape[0]
                if step_time:
                    time.sleep(step_time)
        return seen, time.perf_counter() - t0

    seen, dt = run_packed(0.0)
    emit("packed_sustained", seen / dt, batch=args.batch)

    # v5e-8: one host feeds 8 chips; global batch = 8x per-chip batch
    pod_batch_time = args.batch / args.pod_target
    seen, dt = run_packed(pod_batch_time)
    ideal = (seen / args.batch) * pod_batch_time
    emit("packed_overlapped_pod", seen / dt, batch=args.batch,
         target=args.pod_target,
         exposed_host_frac=round(max(dt - ideal, 0) / dt, 3))

    import shutil

    shutil.rmtree(tmp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
