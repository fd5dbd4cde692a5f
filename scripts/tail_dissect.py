"""Measure the train-step tail: loss-side vs clip+AdamW+EMA bookkeeping.

docs/performance.md's MFU table attributes "~6%" of the step to
optimizer/EMA/clip/loss elementwise work by subtraction, not by
measurement. This probe pins it at the bench operating point (B=10,
`qkv+attn+mlp`):

  1. full `dino_train_step` on fixed crops (donated state, as in bench.py)
  2. `dino_loss_and_grads` alone (teacher+student forwards, loss, backward)

(1) - (2) = per-tensor clip + last-layer freeze mask + AdamW + EMA teacher
update + schedule/bookkeeping — the whole "tail". A host-transfer float()
is the sync on the axon relay (block_until_ready returns early).

Measured 2026-08-22 (idle box): full step 86.83 ms, loss_and_grads
84.96 ms -> tail 1.87 ms (~2% of the step). The augmentation kernel's
own time is NOT measured here — timing an eager per-iteration
`fold_in`+dispatch loop on the relay measures key-op dispatch latency
(~39 ms/iter), not the kernel; profile_step.py's in-pipeline 5.4 ms is
the right augment number.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    from dinomc_tpu.core import schedules
    from dinomc_tpu.ops.augment import MultiCropConfig, multicrop_augment
    from dinomc_tpu.train.dino_trainer import (
        DinoConfig,
        DinoSchedules,
        dino_loss_and_grads,
        dino_train_step,
        init_dino_train_state,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    epochs, niter = 1, 1000
    cfg = DinoConfig(
        arch="vit_small", patch_size=8, out_dim=65536, niter_per_ep=niter,
        remat_policy="qkv+attn+mlp",
    )
    state = init_dino_train_state(jax.random.PRNGKey(0), cfg)
    sch = DinoSchedules(
        lr=jnp.asarray(schedules.cosine_scheduler(5e-4, 1e-6, epochs, niter)),
        wd=jnp.asarray(schedules.cosine_scheduler(0.04, 0.4, epochs, niter)),
        teacher_momentum=jnp.asarray(
            schedules.cosine_scheduler(0.996, 1.0, epochs, niter)
        ),
        teacher_temp=jnp.asarray(
            schedules.teacher_temp_schedule(0.04, 0.04, 0, epochs)
        ),
    )

    raw = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))
    mc = MultiCropConfig()
    aug = jax.jit(lambda k, x: multicrop_augment(k, x, mc))
    g, locals_ = aug(jax.random.PRNGKey(3), raw)
    float(jnp.sum(g[..., 0, 0, 0].astype(jnp.float32)))

    iters = 30

    # --- loss_and_grads alone (fwd+bwd+loss, no update) ---
    lg = jax.jit(
        lambda st, g, l: dino_loss_and_grads(
            st, g, l, sch.teacher_temp[0], jax.random.PRNGKey(7), cfg
        )[:2]
    )
    loss, grads = lg(state, g, locals_)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = lg(state, g, locals_)
    float(loss)
    t_lg = (time.perf_counter() - t0) / iters

    # --- full step (donated state, threaded) ---
    st, metrics = dino_train_step(state, g, locals_, sch, cfg)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        st, metrics = dino_train_step(st, g, locals_, sch, cfg)
    float(metrics["loss"])
    t_full = (time.perf_counter() - t0) / iters

    tail = t_full - t_lg
    print(f"loss_and_grads (f+b):    {t_lg*1e3:7.2f} ms")
    print(f"full train step:         {t_full*1e3:7.2f} ms")
    print(f"tail (clip+opt+EMA+bkkp):{tail*1e3:7.2f} ms ({tail/t_full:5.1%})")


if __name__ == "__main__":
    main()
