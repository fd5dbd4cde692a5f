"""Swin packed-window-attention kernel: on-chip A/B vs the XLA path.

Times the Swin-T DINO student fwd+bwd (all 7 crop programs, the
swin_dissect workload) with the einsum window attention vs the Pallas
packed-window kernel (ops/pallas/window_attention.py), sweeping the
group-pick row target. This is the measurement for the r4 verdict's top
ask — the ~2x lever named in docs/performance.md's Swin dissection.

Run: python scripts/swin_kernel_bench.py [--batch 16] [--fwd-only]
"""

import argparse
import os
import sys
import time
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dinomc_tpu.models import swin as sw
import dinomc_tpu.ops.pallas.window_attention as wa


def timeit(fn, *args, n=10, windows=3):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--targets", type=str, default="128,256,384,512")
    args = ap.parse_args()
    B = args.batch

    key = jax.random.PRNGKey(1)
    sizes = [(2 * B, 224)] + [(B, s) for s in (184, 164, 144, 124, 104, 84)]
    xs = [jax.random.uniform(jax.random.fold_in(key, i), (b, s, s, 3))
          for i, (b, s) in enumerate(sizes)]

    def build(kernel):
        cfg = sw.swin_t(window_kernel=kernel)
        params = sw.init_swin(jax.random.PRNGKey(0), cfg)

        def full(params, xs):
            return sum(
                sw.swin_forward(params, x, cfg).astype(jnp.float32).sum()
                for x in xs
            )

        fn = full if args.fwd_only else jax.grad(full)
        return jax.jit(fn), params

    fn, params = build(False)
    base = timeit(fn, params, xs)
    what = "fwd" if args.fwd_only else "fwd+bwd"
    print(f"XLA einsum path   student {what}: {base:7.2f} ms", flush=True)

    orig_pick = wa.pick_group
    for target in [int(t) for t in args.targets.split(",")]:
        def pick(nW, nB, target_rows=256, ww=49, _t=target):
            return orig_pick(nW, nB, target_rows=_t, ww=ww)

        with mock.patch.object(wa, "pick_group", pick):
            fn, params = build(True)
            t = timeit(fn, params, xs)
        print(f"kernel target={target:4d} rows   {what}: {t:7.2f} ms  "
              f"({base / t:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
