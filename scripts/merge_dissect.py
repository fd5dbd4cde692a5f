"""Dissect the merged-bucket forward vs per-bucket baseline on the chip.

Times JUST the student multi-crop composition (no loss/optimizer):
  fwd  : sum of CLS outputs
  f+b  : grad of that sum wrt params
for (a) per-bucket with crop packing (production baseline),
    (b) merged (vit_forward_multi),
and variants to localize any gap.
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from dinomc_tpu.models import vit


def timeit(fn, *args, n=10, windows=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: None, out)
    # axon sync: force a host transfer of one scalar
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--policy", default="qkv+attn+mlp")
    args = ap.parse_args()
    B = args.batch

    cfg = vit.vit_small(patch_size=8, img_size=224, remat_policy=args.policy,
                        drop_path_rate=0.0)
    params = vit.init_vit(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    # bench crop layout: 2x224 globals (one 2B bucket) + 6 locals
    sizes = [(2 * B, 224), (B, 184), (B, 164), (B, 144), (B, 124),
             (B, 104), (B, 84)]
    xs = [jax.random.uniform(jax.random.fold_in(key, i), (b, s, s, 3))
          for i, (b, s) in enumerate(sizes)]

    # --- (a) per-bucket + packing (production): pack locals pairwise
    # large+small as the trainer does: (184,84), (164,104), (144,124)
    @jax.jit
    def fwd_bucketed(params, xs):
        outs = [vit.vit_forward(params, xs[0], cfg)]
        for i, j in ((1, 6), (2, 5), (3, 4)):
            fa, fb = vit.vit_forward_packed(params, xs[i], xs[j], cfg)
            outs += [fa, fb]
        return sum(o.sum() for o in outs)

    # --- (b) merged
    @jax.jit
    def fwd_merged(params, xs):
        return sum(o.sum() for o in vit.vit_forward_multi(params, xs, cfg))

    # --- (c) merged, locals only (globals separate)
    @jax.jit
    def fwd_merged_locals(params, xs):
        g = vit.vit_forward(params, xs[0], cfg)
        loc = vit.vit_forward_multi(params, xs[1:], cfg)
        return g.sum() + sum(o.sum() for o in loc)

    # --- (d) per-bucket, NO packing (isolate packing's contribution)
    @jax.jit
    def fwd_unpacked(params, xs):
        return sum(vit.vit_forward(params, x, cfg).sum() for x in xs)

    for name, fn in [("bucketed+packed", fwd_bucketed),
                     ("merged-all", fwd_merged),
                     ("merged-locals", fwd_merged_locals),
                     ("unpacked", fwd_unpacked)]:
        f = timeit(fn, params, xs)
        g = timeit(jax.jit(jax.grad(fn.__wrapped__)), params, xs)
        print(f"{name:>16}: fwd {f:7.2f} ms   fwd+bwd {g:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
