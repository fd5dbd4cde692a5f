"""Segmentation-path timing on the real chip.

Times the UPerNet(DINO ViT-S/8) seg train step at 224 px (reference
fine-tune resolution, frozen backbone like ``train_dino_mc_seg.py:271``)
and the 512 px forward (``config.py:343`` big_image_size), plus the tiled
inference throughput. Usage: python scripts/profile_seg.py [B224]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))


def timeit(fn, *args, iters=10, warmup=2, **kw):
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from dinomc_tpu.models.upernet import UPerNetConfig, upernet_forward
    from dinomc_tpu.train.seg_trainer import (
        SegConfig,
        init_seg_train_state,
        seg_train_step,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = SegConfig(model=UPerNetConfig(num_classes=8), train_backbone=False)
    state = init_seg_train_state(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, 224, 224, 3))
    masks = jnp.zeros((B, 224, 224), jnp.int32)
    lr = jnp.asarray(3e-4)
    wd = jnp.asarray(1e-4)

    def time_steps(state, cfg, iters=10, warmup=2):
        # state buffers are DONATED by seg_train_step — must chain, not reuse
        for _ in range(warmup):
            state, m = seg_train_step(state, imgs, masks, lr, wd, cfg)
        sync(m)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = seg_train_step(state, imgs, masks, lr, wd, cfg)
        sync(m)
        return (time.perf_counter() - t0) / iters

    dt = time_steps(state, cfg)
    print(f"seg train step 224px B={B} (frozen backbone): {dt*1e3:8.2f} ms "
          f"({B/dt:.1f} img/s)", flush=True)

    cfg_ft = SegConfig(model=UPerNetConfig(num_classes=8), train_backbone=True)
    state_ft = init_seg_train_state(jax.random.PRNGKey(0), cfg_ft)
    dt = time_steps(state_ft, cfg_ft)
    print(f"seg train step 224px B={B} (full fine-tune):  {dt*1e3:8.2f} ms "
          f"({B/dt:.1f} img/s)", flush=True)

    state = init_seg_train_state(jax.random.PRNGKey(0), cfg)

    # 512 px inference forward (big_image_size path, 4097 tokens)
    cfg512 = UPerNetConfig(num_classes=8)
    params, bn = state.params, state.bn_state
    big = jax.random.uniform(jax.random.PRNGKey(2), (2, 512, 512, 3))

    fwd = jax.jit(
        lambda p, s, x: upernet_forward(p, s, x, cfg512, train=False)[0]
    )
    dt = timeit(fwd, params, bn, big, iters=10)
    print(f"seg forward 512px B=2:                        {dt*1e3:8.2f} ms "
          f"({2/dt:.1f} img/s)", flush=True)

    # backbone-only forward at 224 to split encoder vs decoder cost
    from dinomc_tpu.models.upernet import dino_pyramid

    pyr = jax.jit(lambda p, x: dino_pyramid(p["backbone"], x, cfg512))
    dt = timeit(pyr, params, imgs, iters=10)
    print(f"backbone pyramid 224px B={B}:                  {dt*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
