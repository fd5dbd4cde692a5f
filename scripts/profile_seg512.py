"""512 px segmentation-path breakdown on the real chip.

Times, at the reference's big_image_size=512 (4097 tokens at patch 8):
  - attention-only: flash vs fused_long (chunked-q, KV-resident) kernels
  - ViT-S/8 backbone pyramid forward (the 4-tap feature extractor)
  - full UPerNet forward (backbone + PSP/FPN decode)
Usage: python scripts/profile_seg512.py [B]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))


def timeit(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    N, h, d = 4097, 6, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, N, h, d), jnp.bfloat16) for kk in ks)
    scale = 1.0 / (d ** 0.5)

    from dinomc_tpu.ops.attention import flash_mha
    from dinomc_tpu.ops.pallas.attention_long import long_mha

    for name, fn in [("flash", flash_mha), ("fused_long", long_mha)]:
        fwd = jax.jit(lambda q, k, v, f=fn: f(q, k, v, scale))
        t = timeit(fwd, q, k, v)
        print(f"attn {name:10s} fwd : {t*1e3:8.2f} ms  (B={B}, N={N})", flush=True)

        def loss(q, k, v, f=fn):
            return jnp.sum(f(q, k, v, scale).astype(jnp.float32) ** 2)

        gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        t = timeit(gfn, q, k, v)
        print(f"attn {name:10s} f+b : {t*1e3:8.2f} ms", flush=True)

    from dinomc_tpu.models.upernet import UPerNetConfig, dino_pyramid
    from dinomc_tpu.train.seg_trainer import (
        SegConfig,
        init_seg_train_state,
        seg_predict,
    )

    scfg = SegConfig(model=UPerNetConfig(num_classes=8), train_backbone=False)
    state = init_seg_train_state(jax.random.PRNGKey(0), scfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, 512, 512, 3))

    bb = jax.jit(lambda p, x: dino_pyramid(p["backbone"], x, scfg.model))
    t = timeit(bb, state.params, imgs)
    print(f"backbone pyramid fwd : {t*1e3:8.2f} ms  ({t/B*1e3:.1f} ms/img)", flush=True)

    t = timeit(lambda: seg_predict(state.params, state.bn_state, imgs, scfg))
    print(f"upernet full fwd     : {t*1e3:8.2f} ms  ({t/B*1e3:.1f} ms/img)", flush=True)


if __name__ == "__main__":
    main()
