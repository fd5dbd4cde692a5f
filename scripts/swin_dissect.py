"""Step-dissection of the Swin-T DINO step — the worst MFU row (0.100).

Methodology (same as scripts/step_dissect.py): time the full student
fwd+bwd, then re-time with one component stubbed to a cheap identity;
the difference is that component's wall share (overlap caveat: stubbing
assigns any co-scheduled time to the stubbed op, so shares can overstate).

Components stubbed:
  win_attn   : window attention core (QK^T/softmax/PV) -> identity on v
  shifts     : the jnp.roll cyclic shifts -> no-op
  merge      : patch-merging downsamples -> strided slice (keeps shapes)
  mlp        : block MLPs -> identity

Run: python scripts/swin_dissect.py [--batch 16]
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
    args = ap.parse_args()
    B = args.batch

    cfg = sw.swin_t()
    params = sw.init_swin(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    # the DINO student's crop set: 2x224 globals + 6 locals
    sizes = [(2 * B, 224)] + [(B, s) for s in (184, 164, 144, 124, 104, 84)]
    xs = [jax.random.uniform(jax.random.fold_in(key, i), (b, s, s, 3))
          for i, (b, s) in enumerate(sizes)]

    def full(params, xs):
        return sum(
            sw.swin_forward(params, x, cfg).astype(jnp.float32).sum()
            for x in xs
        )

    grad = jax.jit(jax.grad(full))
    base = timeit(grad, params, xs)
    print(f"student fwd+bwd (all crops): {base:7.2f} ms", flush=True)

    # ---- stubs ---------------------------------------------------------
    def stub_win_attn_all(x, bp, heads, w, mask, *a, **kw):
        """Whole attention (incl. qkv/proj GEMMs) -> identity."""
        return x

    def stub_attn_core(x, bp, heads, w, mask, *a, **kw):
        """Keep qkv + proj GEMMs; skip QK^T/softmax/PV + rel-bias gather."""
        C = x.shape[-1]
        qkv = sw._lin(x, {"kernel": bp["qkv"]["kernel"],
                          "bias": bp["qkv"]["bias"]})
        v = qkv[..., 2 * C:]
        return sw._lin(v, {"kernel": bp["proj"]["kernel"],
                           "bias": bp["proj"]["bias"]})

    def stub_roll(a, shift, axis=None):
        return a

    def run(patches=None, roll=False):
        ctx = (mock.patch.multiple(sw, **patches) if patches
               else mock.patch.object(jnp, "roll", stub_roll))
        with ctx:
            return timeit(jax.jit(jax.grad(full)), params, xs)

    for name, kw in [
        ("attention (all)", dict(patches={"_window_attention": stub_win_attn_all})),
        ("attn core only", dict(patches={"_window_attention": stub_attn_core})),
        ("shifts (jnp.roll)", dict(roll=True)),
    ]:
        t = run(**kw)
        print(f"  - {name:<18} stubbed: {t:7.2f} ms  "
              f"(component ~{base - t:6.2f} ms, {100*(base-t)/base:4.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
