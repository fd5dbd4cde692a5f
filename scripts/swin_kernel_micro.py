"""Micro-bench: packed-window kernel vs XLA einsum attention core, per
Swin stage geometry, sweeping the pack factor G.

Isolates the attention core (post-qkv, pre-proj) to measure the kernel's
raw advantage and per-program overhead without the rest of the step.

Run: python scripts/swin_kernel_micro.py [--batch 16]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dinomc_tpu.ops.pallas.window_attention import packed_window_attention

WW = 49


def timeit(fn, *args, n=20, windows=3):
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


def xla_core(q, k, v, bias, heads):
    nB, ww, C = q.shape
    hd = C // heads
    qh = q.reshape(nB, ww, heads, hd)
    kh = k.reshape(nB, ww, heads, hd)
    vh = v.reshape(nB, ww, heads, hd)
    logits = jnp.einsum("bnhd,bmhd->bhnm", qh, kh).astype(jnp.float32) / (hd**0.5)
    logits = logits + bias[None]
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", p, vh).reshape(nB, ww, C)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--variants", type=str, default="stacked")
    ap.add_argument("--groups", type=str, default="2,4,8")
    ap.add_argument("--stages", type=str, default="1,2,3,4")
    args = ap.parse_args()
    global VARIANTS, GROUPS
    VARIANTS = args.variants.split(",")
    GROUPS = [int(g) for g in args.groups.split(",")]
    B = args.batch

    # (stage, nW per 224px image, C, heads) — batch for the 2 globals = 2B
    stages = [(1, 64, 96, 3), (2, 16, 192, 6), (3, 4, 384, 12), (4, 1, 768, 24)]
    keep = {int(x) for x in args.stages.split(",")}
    for s, nW, C, heads in stages:
        if s not in keep:
            continue
        nB = 2 * B * nW
        key = jax.random.PRNGKey(s)
        ks = jax.random.split(key, 4)
        q = jax.random.normal(ks[0], (nB, WW, C), jnp.bfloat16)
        k = jax.random.normal(ks[1], (nB, WW, C), jnp.bfloat16)
        v = jax.random.normal(ks[2], (nB, WW, C), jnp.bfloat16)
        bias = 0.1 * jax.random.normal(ks[3], (heads, WW, WW), jnp.float32)

        CHAIN = 4  # dependent layers per program: amortizes the ~1-2 ms
        # relay dispatch latency (same trick as scripts/attn_dispatch_bench)

        def chain(core, q, k, v, bias):
            o = q
            for _ in range(CHAIN):
                o = core(o, k, v, bias)
            return o.astype(jnp.float32).sum()

        def loss_x(q, k, v, bias):
            return chain(lambda a, b, c, d: xla_core(a, b, c, d, heads),
                         q, k, v, bias)

        fx = timeit(jax.jit(loss_x), q, k, v, bias) / CHAIN
        gx = timeit(jax.jit(jax.grad(loss_x, argnums=(0, 1, 2, 3))),
                    q, k, v, bias) / CHAIN
        print(f"stage{s} nB={nB:5d} C={C:3d}: XLA fwd {fx:6.2f}  f+b {gx:6.2f} "
              f"ms/layer", flush=True)

        for variant in VARIANTS:
            for G in GROUPS:
                if nB % G:
                    continue

                def loss_k(q, k, v, bias, G=G, variant=variant):
                    return chain(
                        lambda a, b, c, d: packed_window_attention(
                            a, b, c, d, None, heads, nW, group=G,
                            variant=variant),
                        q, k, v, bias)

                fk = timeit(jax.jit(loss_k), q, k, v, bias) / CHAIN
                gk = timeit(jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3))),
                            q, k, v, bias) / CHAIN
                print(f"    {variant:7s} G={G:2d} ({G*WW:4d} rows): "
                      f"fwd {fk:6.2f} ({fx/fk:4.2f}x)  f+b {gk:6.2f} "
                      f"({gx/gk:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
