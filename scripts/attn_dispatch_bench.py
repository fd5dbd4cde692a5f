"""Compare attention impls at the bench's ACTUAL shapes (real chip).

The dispatch rule (ops/attention.mha) sends padded N <= 1024 to the fused
whole-sequence kernel and 1024 < N <= 5120 to the chunked-query KV-resident
kernel (fused_long). Is that crossover right? Times fwd and fwd+bwd of
fused / fused_long / flash at the DINO-MC global-view shape and the 512px
segmentation shape.

Usage: python scripts/attn_dispatch_bench.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from dinomc_tpu.ops.attention import mha  # noqa: E402


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    h, d = 6, 64
    for B, N in [(20, 785), (10, 631), (2, 4097)]:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(k1, (B, N, h, d), jnp.bfloat16)
        k = jax.random.normal(k2, (B, N, h, d), jnp.bfloat16)
        v = jax.random.normal(k3, (B, N, h, d), jnp.bfloat16)
        print(f"-- B={B} N={N} h={h} d={d}")
        for impl in ["fused", "fused_long", "flash"]:
            from dinomc_tpu.ops.pallas.attention import MAX_FUSED_LEN, _pad_len

            if impl == "fused" and _pad_len(N) > MAX_FUSED_LEN:
                continue

            fwd = jax.jit(partial(mha, impl=impl))

            @jax.jit
            def fb(q, k, v, _impl=impl):
                def loss(q, k, v):
                    return jnp.sum(mha(q, k, v, impl=_impl).astype(jnp.float32) ** 2)

                return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

            t_f = timeit(fwd, q, k, v)
            t_fb = timeit(fb, q, k, v)
            print(f"  {impl:12s} fwd {t_f*1e3:7.3f} ms   f+b {t_fb*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
