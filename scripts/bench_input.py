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
  * ``loader_sustained``  — PrefetchLoader end-to-end feed rate (decode ->
                            collate -> device_put), no consumer back-pressure
  * ``loader_overlapped`` — same, consumer simulating a busy accelerator
                            (sleep = B / target img/s per batch): measures
                            whether prefetch hides host IO behind the step

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

    for p in paths:
        os.unlink(p)
    os.rmdir(tmp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
