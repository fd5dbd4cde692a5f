"""Probe: would packing local crops into fewer, longer sequences help?

Times the production ViT-S block stack (12 layers, lax.scan, remat='attn',
fused flash attention) over
  (a) the current layout — 6 separate forwards, one per local crop size
      (tokens 530/401/325/226/170/101 at patch 8, B each), and
  (b) a packed layout — 3 forwards pairing large+small crops into one
      sequence (631/571/551 tokens) with the kernel's static two-segment
      block-diagonal mask (attn_boundary; exact, no MLP padding waste).

Trade: packing computes the masked cross-attention blocks (~19% more
padded-quadratic attention work: 1.15M vs 0.97M padded token^2) but halves
the number of scan traversals and attention kernel launches. If (b) wins,
wire packing into ``train/dino_trainer._forward_crops``.
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from dinomc_tpu.models.vit import _scan_blocks, init_vit, vit_small  # noqa: E402

SIZES = [530, 401, 325, 226, 170, 101]
PAIRS = [(530, 101), (401, 226), (325, 170)]


def timeit(fn, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    cfg = vit_small(patch_size=8, img_size=224)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)

    xs = [jax.random.normal(key, (B, n, 384), jnp.bfloat16) for n in SIZES]
    packed = [jax.random.normal(key, (B, a + b, 384), jnp.bfloat16) for a, b in PAIRS]

    def run(p, x, c):
        out, _ = _scan_blocks({**params, "blocks": p}, x, c, None, True, False)
        return out

    def fwd_separate(p):
        return jnp.concatenate([run(p, x, cfg)[:, 0] for x in xs], 0)

    def fwd_packed(p):
        outs = []
        for x, (a, _b) in zip(packed, PAIRS):
            c = dataclasses.replace(cfg, attn_boundary=a)
            y = run(p, x, c)
            outs.append(y[:, 0])
            outs.append(y[:, a])
        return jnp.concatenate(outs, 0)

    def loss(fwd):
        return lambda p: jnp.sum(fwd(p).astype(jnp.float32) ** 2)

    blocks = params["blocks"]
    jf_sep = jax.jit(fwd_separate)
    jf_pack = jax.jit(fwd_packed)
    jg_sep = jax.jit(jax.grad(loss(fwd_separate)))
    jg_pack = jax.jit(jax.grad(loss(fwd_packed)))

    print(f"B={B}  sizes={SIZES}  pairs={PAIRS}")
    print(f"separate fwd:      {timeit(lambda: jf_sep(blocks))*1e3:8.2f} ms")
    print(f"packed   fwd:      {timeit(lambda: jf_pack(blocks))*1e3:8.2f} ms")
    print(f"separate fwd+bwd:  {timeit(lambda: jg_sep(blocks))*1e3:8.2f} ms")
    print(f"packed   fwd+bwd:  {timeit(lambda: jg_pack(blocks))*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
