"""Probe: fold the qkv projection INTO the fused attention kernel.

The r4 wall analysis left ONE named lever on the ViT flagship: "a
materially different algorithm (e.g. fusing the qkv projection into the
kernel)" — the hypothesis being that the qkv GEMM (MXU) could overlap the
softmax phases (VPU) inside one program, recovering part of the ~21%
attention-kernel utilization (docs/performance.md:170-176).

This probe builds that kernel (forward): each (batch, feature-block)
program loads the x block (Np, D) + a resident (D, 3, 128) weight slice,
computes its q/k/v feature block with three MXU GEMMs, and runs the
production kernel's staged per-head phases — giving Mosaic the qkv GEMMs
as MXU work to overlap another head's VPU softmax. Compared against the
production composition (one XLA qkv GEMM + fused_mha) on 4-layer chains
at the bench operating shape (relay dispatch amortized, same protocol as
scripts/attn_pipeline.py).

Run: python scripts/qkv_fused_probe.py [--batch 20] [--n 785]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dinomc_tpu.ops.pallas.attention import (
    LANE,
    _pad_len,
    _probs,
    _scores,
)

CHAIN = 4


def _qkv_fwd_kernel(x_ref, w_ref, b_ref, o_ref, *, scale, n_valid, d, heads):
    x = x_ref[0]  # (Np, D)
    qkv = []
    for i in range(3):
        w = w_ref[:, i, :]  # (D, 128)
        qkv.append(
            jax.lax.dot_general(
                x, w.astype(x.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype) + b_ref[i].astype(x.dtype)
        )
    q, k, v = qkv
    sl = [slice(j * d, (j + 1) * d) for j in range(heads)]
    ss = [_scores(q[:, sl[j]], k[:, sl[j]], scale, n_valid) for j in range(heads)]
    ps = [_probs(s) for s in ss]
    for j in range(heads):
        p = ps[j].astype(x.dtype)
        o_ref[0, :, sl[j]] = jax.lax.dot_general(
            p, v[:, sl[j]], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def qkv_fused_mha(x, w_qkv, b_qkv, scale, n_valid):
    """x: (B, Np, D) bf16 padded; w_qkv: (D, 3, F); b_qkv: (3, F)."""
    B, Np, D = x.shape
    F = w_qkv.shape[-1]
    d = 64
    heads = LANE // d
    kern = functools.partial(
        _qkv_fwd_kernel, scale=scale, n_valid=n_valid, d=d, heads=heads
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Np, F), x.dtype),
        grid=(B, F // LANE),
        in_specs=[
            pl.BlockSpec((1, Np, D), lambda b, f: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3, LANE), lambda b, f: (0, 0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LANE), lambda b, f: (0, f),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Np, LANE), lambda b, f: (b, 0, f),
                               memory_space=pltpu.VMEM),
    )(x, w_qkv, b_qkv)


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
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--n", type=int, default=785)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    from dinomc_tpu.ops.pallas.attention import fused_mha

    B, N, D, heads, d = args.batch, args.n, 384, 6, 64
    Np = _pad_len(N)
    scale = 1.0 / d**0.5
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, Np, D), jnp.bfloat16) * 0.5
    x0 = x0 * (jnp.arange(Np)[None, :, None] < N)
    wq = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (CHAIN, D, 3, D),
                                  jnp.bfloat16)
    bq = jnp.zeros((CHAIN, 3, D), jnp.bfloat16)

    def baseline(x, wq, bq):
        for i in range(CHAIN):
            qkv = x @ wq[i].reshape(D, 3 * D) + bq[i].reshape(3 * D)
            q, k, v = (qkv[..., :D], qkv[..., D : 2 * D], qkv[..., 2 * D :])

            def hsplit(t):
                return t.reshape(B, Np, heads, d)[:, :N]

            o = fused_mha(hsplit(q), hsplit(k), hsplit(v), scale)
            o = o.reshape(B, N, D)
            x = jnp.pad(o, ((0, 0), (0, Np - N), (0, 0))).astype(x.dtype)
        return x.astype(jnp.float32).sum()

    def fused(x, wq, bq):
        for i in range(CHAIN):
            x = qkv_fused_mha(x, wq[i], bq[i], scale, N).astype(x.dtype)
            # zero padded rows so the next layer's keys stay masked-equal
            x = x * (jnp.arange(Np)[None, :, None] < N)
        return x.astype(jnp.float32).sum()

    if args.check:
        a = jax.jit(baseline)(x0, wq, bq)
        b = jax.jit(fused)(x0, wq, bq)
        print(f"baseline {float(a):.1f}  fused {float(b):.1f}  "
              f"rel diff {abs(float(a) - float(b)) / abs(float(a)):.2e}")

    tb = timeit(jax.jit(baseline), x0, wq, bq) / CHAIN
    tf = timeit(jax.jit(fused), x0, wq, bq) / CHAIN
    print(f"B={B} N={N}: XLA qkv + fused attn  fwd {tb:6.3f} ms/layer")
    print(f"          qkv-in-kernel fused     fwd {tf:6.3f} ms/layer "
          f"({tb / tf:4.2f}x)")


if __name__ == "__main__":
    main()
