"""Step-dissection of the XCiT DINO student — closing the r4 verdict's
"XCiT is the only arch family with no wall dissection" gap.

Methodology (same as scripts/step_dissect.py / swin_dissect.py): time the
full student fwd+bwd over all 7 multi-crop programs, then re-time with one
component stubbed to a cheap shape-preserving identity; the difference is
that component's wall share (stub-out attributes co-scheduled time to the
stubbed op, so shares can overstate — same caveat as the others).

Components stubbed:
  xca (all)   : whole XCA branch (incl. qkv/proj GEMMs) -> zero
  xca core    : keep qkv+proj GEMMs; skip token-norm/cross-cov/softmax/AV
  token norm  : keep everything but the f32 L2 normalize over tokens
  lpi         : Local Patch Interaction branch -> zero
  mlp         : block MLP branch -> zero
  stem        : conv stem -> strided subsample + channel pad
  cls_attn    : the two class-attention layers -> skipped

Run: python scripts/xcit_dissect.py [--batch 16] [--patch 8|16]
"""

import argparse
import os
import sys
import time
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dinomc_tpu.models import xcit as xc


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
    ap.add_argument("--patch", type=int, default=8)
    args = ap.parse_args()
    B = args.batch

    cfg = xc.xcit_small_12(patch_size=args.patch)
    params = xc.init_xcit(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    sizes = [(2 * B, 224)] + [(B, s) for s in (184, 164, 144, 124, 104, 84)]
    xs = [jax.random.uniform(jax.random.fold_in(key, i), (b, s, s, 3))
          for i, (b, s) in enumerate(sizes)]

    def full(params, xs):
        return sum(
            xc.xcit_forward(params, x, cfg).astype(jnp.float32).sum()
            for x in xs
        )

    base = timeit(jax.jit(jax.grad(full)), params, xs)
    print(f"XCiT-S12/{args.patch} student fwd+bwd (all crops): {base:7.2f} ms",
          flush=True)

    # ---- stubs ---------------------------------------------------------
    def stub_xca_all(tokens, bp, h, dtype):
        return jnp.zeros_like(tokens)

    def stub_xca_core(tokens, bp, h, dtype):
        B_, N, D = tokens.shape
        qkv = tokens @ bp["qkv"]["kernel"].astype(dtype) + bp["qkv"][
            "bias"].astype(dtype)
        v = qkv[..., 2 * D:]
        return v @ bp["proj"]["kernel"].astype(dtype) + bp["proj"][
            "bias"].astype(dtype)

    orig_xca = xc._xca

    def stub_no_token_norm(tokens, bp, h, dtype):
        import math as _m

        B_, N, D = tokens.shape
        dh = D // h
        qkv = tokens @ bp["qkv"]["kernel"].astype(dtype) + bp["qkv"][
            "bias"].astype(dtype)
        qkv = qkv.reshape(B_, N, 3, h, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bnhe->bhde", q, k).astype(jnp.float32)
        attn = attn * bp["temp"][None, :, None, None] / _m.sqrt(N)
        attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
        out = jnp.einsum("bhde,bnhe->bnhd", attn, v).reshape(B_, N, D)
        return out @ bp["proj"]["kernel"].astype(dtype) + bp["proj"][
            "bias"].astype(dtype)

    def stub_lpi(tokens, bp, gh, gw, eps, dtype):
        return jnp.zeros_like(tokens)

    orig_conv = xc._conv

    def stub_stem_conv(x, p, stride=1, groups=1):
        if stride == 2 and groups == 1:  # stem convs only
            co = p["kernel"].shape[-1]
            y = x[:, ::2, ::2, :]
            return jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, co - y.shape[-1])))
        return orig_conv(x, p, stride, groups)

    def run(patches):
        with mock.patch.multiple(xc, **patches):
            return timeit(jax.jit(jax.grad(full)), params, xs)

    rows = [
        ("xca (all)", {"_xca": stub_xca_all}),
        ("xca core only", {"_xca": stub_xca_core}),
        ("token norm only", {"_xca": stub_no_token_norm}),
        ("lpi", {"_lpi": stub_lpi}),
        ("stem convs", {"_conv": stub_stem_conv}),
    ]
    for name, patches in rows:
        t = run(patches)
        print(f"  - {name:<16} stubbed: {t:7.2f} ms  "
              f"(component ~{base - t:6.2f} ms, {100*(base-t)/base:4.1f}%)",
              flush=True)

    # MLP branch: fc1/fc2 are the only _lin calls with a 4x width ratio —
    # stub both to zeros (the gelu between them still runs on zeros, so
    # this slightly understates the branch).
    orig_lin = xc._lin

    def stub_mlp_lin(x, p):
        ki, ko = p["kernel"].shape[-2], p["kernel"].shape[-1]
        if ko == 4 * ki or ki == 4 * ko:
            return jnp.zeros(x.shape[:-1] + (ko,), x.dtype)
        return orig_lin(x, p)

    t = run({"_lin": stub_mlp_lin})
    print(f"  - {'mlp fc1+fc2':<16} stubbed: {t:7.2f} ms  "
          f"(component ~{base - t:6.2f} ms, {100*(base-t)/base:4.1f}%)",
          flush=True)

    # cls-attn layers: halve them (1 of 2) and double the delta — removing
    # both would cut the CLS token's only data dependency on the trunk and
    # let XLA dead-code the whole network (measured: 193 -> 4 ms, bogus).
    p2 = dict(params)
    p2["cls_blocks"] = params["cls_blocks"][:1]
    t = timeit(jax.jit(jax.grad(full)), p2, xs)
    comp = 2 * (base - t)
    print(f"  - {'cls_attn (x2 of half)':<16} : {t:7.2f} ms  "
          f"(component ~{comp:6.2f} ms, {100*comp/base:4.1f}%)",
          flush=True)


if __name__ == "__main__":
    main()
