"""Micro-benchmarks: raw MXU peak vs ViT block pieces at bench shapes."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timeit(fn, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    B, N, D = 64, 785, 384
    M = B * N
    dt = jnp.bfloat16
    k = jax.random.PRNGKey(0)

    # raw matmul at mlp fc1 shape
    a = jax.random.normal(k, (M, D), dt)
    w = jax.random.normal(k, (D, 4 * D), dt)

    mm = jax.jit(lambda a, w: a @ w)
    t = timeit(lambda: mm(a, w))
    fl = 2 * M * D * 4 * D
    print(f"matmul {M}x{D}x{4*D}: {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s")

    # chained matmuls (12 'layers' of fc1+fc2) to amortize dispatch
    w2 = jax.random.normal(k, (4 * D, D), dt)

    @jax.jit
    def chain(a, w, w2):
        def body(x, _):
            y = x @ w
            y = jax.nn.gelu(y, approximate=False)
            return y @ w2, None

        out, _ = jax.lax.scan(body, a, None, length=12)
        return out

    t = timeit(lambda: chain(a, w, w2))
    fl = 12 * 2 * 2 * M * D * 4 * D
    print(f"mlp chain x12:      {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s")

    # one full ViT-S block fwd x12 via model code
    from dinomc_tpu.models.vit import vit_small, init_vit, _scan_blocks

    cfg = vit_small(patch_size=8, img_size=224)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.normal(k, (B, N, D), dt)

    @jax.jit
    def blocks(params, tokens):
        out, _ = _scan_blocks(params, tokens, cfg, None, True, False)
        return out

    t = timeit(lambda: blocks(params, tokens))
    # block flops: qkv+proj+mlp matmuls + attention
    fl_l = 2 * M * D * (3 * D) + 2 * M * D * D + 2 * 2 * M * D * 4 * D
    fl_a = 4 * B * N * N * D * 2  # qk^T + pv, both heads combined
    fl = 12 * (fl_l + fl_a / 2)
    print(f"12 blocks fwd:      {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s (det)")

    # blocks without remat
    import dataclasses

    cfg_nr = dataclasses.replace(cfg, remat=False)

    @jax.jit
    def blocks_nr(params, tokens):
        out, _ = _scan_blocks(params, tokens, cfg_nr, None, True, False)
        return out

    t = timeit(lambda: blocks_nr(params, tokens))
    print(f"12 blocks fwd nore: {t*1e3:7.3f} ms")

    # fwd+bwd with remat
    @jax.jit
    def blocks_grad(params, tokens):
        def loss(p):
            out, _ = _scan_blocks(p, tokens, cfg, None, True, False)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.grad(loss)(params)

    t = timeit(lambda: blocks_grad(params, tokens), iters=10)
    print(f"12 blocks f+b remat:{t*1e3:7.3f} ms")

    # attention alone x12
    from dinomc_tpu.ops.attention import mha

    h, hd = 6, 64
    q = jax.random.normal(k, (B, N, h, hd), dt)

    @jax.jit
    def attn12(q):
        def body(x, _):
            return mha(x, x, x, 0.125, impl="auto"), None

        out, _ = jax.lax.scan(body, q, None, length=12)
        return out

    t = timeit(lambda: attn12(q))
    fl = 12 * 4 * B * h * N * N * hd * 2 / 2
    print(f"attn x12 fwd:       {t*1e3:7.3f} ms  ({fl/t/1e12:5.1f} TF/s)")

    # patchify+embed
    from dinomc_tpu.models.vit import prepare_tokens

    x = jax.random.normal(k, (B, 224, 224, 3), jnp.float32)
    pt = jax.jit(lambda p, x: prepare_tokens(p, x, cfg))
    t = timeit(lambda: pt(params, x))
    print(f"prepare_tokens:     {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
