"""Does fusing the augmentation dispatch into the train-step jit help?

Three schedules of the SAME work (DINO-MC ViT-S/8 bench config):
  separate : augment jit -> step jit (two dispatches; what bench.py did)
  fused    : one jit doing augment + step (one dispatch, same data order)
  pipelined: one jit doing step(crops_N) + augment(raw -> crops_{N+1}) —
             the augment for the NEXT step has no data dependency on the
             current step, so XLA may interleave its memory-bound
             elementwise work with the MXU-bound forward/backward.

Usage: python scripts/fused_aug_bench.py [B] [policy]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    from dinomc_tpu.core import schedules
    from dinomc_tpu.ops.augment import MultiCropConfig, multicrop_augment
    from dinomc_tpu.train.dino_trainer import (
        DinoConfig,
        DinoSchedules,
        dino_train_step,
        init_dino_train_state,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    policy = sys.argv[2] if len(sys.argv) > 2 else "qkv+attn+mlp"
    epochs, niter = 1, 100
    cfg = DinoConfig(
        arch="vit_small", patch_size=8, out_dim=65536, niter_per_ep=niter,
        remat_policy=policy,
    )
    state0 = init_dino_train_state(jax.random.PRNGKey(0), cfg)
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
    mc_cfg = MultiCropConfig()
    raw = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))
    step_inner = dino_train_step.__wrapped__  # un-jitted body

    def fresh_state():
        # dino_train_step donates its state arg — give each schedule its
        # own copy so earlier runs can't delete this one's buffers.
        return jax.tree_util.tree_map(jnp.copy, state0)

    def run(step_fn, init_carry, label, iters=10):
        carry = step_fn(*init_carry)
        float(carry[-1]["loss"])  # sync (axon block_until_ready returns early)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = step_fn(carry[0], carry[1])
        float(carry[-1]["loss"])
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:10s} {dt*1e3:8.2f} ms/step   {B/dt:7.1f} img/s")
        return B / dt

    # -- separate dispatches (bench.py schedule) --
    def sep(state, rng):
        rng, k = jax.random.split(rng)
        g, locals_ = multicrop_augment(k, raw, mc_cfg)
        state, metrics = dino_train_step(state, g, locals_, sch, cfg)
        return state, rng, metrics

    run(sep, (fresh_state(), jax.random.PRNGKey(2)), "separate")

    # -- one jit: augment then step --
    @partial(jax.jit, donate_argnums=(0,))
    def fused(state, rng):
        rng, k = jax.random.split(rng)
        g, locals_ = multicrop_augment(k, raw, mc_cfg)
        state, metrics = step_inner(state, g, locals_, sch, cfg)
        return state, rng, metrics

    run(fused, (fresh_state(), jax.random.PRNGKey(2)), "fused")

    # -- one jit: step on pre-augmented crops + augment the NEXT batch --
    @partial(jax.jit, donate_argnums=(0,))
    def pipelined(state, carry_rng_crops):
        rng, g, locals_ = carry_rng_crops
        state, metrics = step_inner(state, g, locals_, sch, cfg)
        rng, k = jax.random.split(rng)
        g2, locals2 = multicrop_augment(k, raw, mc_cfg)
        return state, (rng, g2, locals2), metrics

    g0, l0 = multicrop_augment(jax.random.PRNGKey(3), raw, mc_cfg)
    run(pipelined, (fresh_state(), (jax.random.PRNGKey(2), g0, l0)), "pipelined")


if __name__ == "__main__":
    main()
