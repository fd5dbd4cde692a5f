"""Component-level timing of the DINO-MC train step on the real chip.

Times (a) multicrop augmentation alone, (b) teacher forward, (c) student
forward+loss+backward, (d) the full step, to show where the ms go.
Usage: python scripts/profile_step.py [B]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: float(jnp.sum(a)) if hasattr(a, "dtype") else a,
        jax.tree_util.tree_leaves(out)[:1],
    )
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: float(jnp.sum(a)) if hasattr(a, "dtype") else a,
        jax.tree_util.tree_leaves(out)[:1],
    )
    return (time.perf_counter() - t0) / iters


def main():
    from dinomc_tpu.core import schedules
    from dinomc_tpu.ops.augment import MultiCropConfig, multicrop_augment
    from dinomc_tpu.train.dino_trainer import (
        DinoConfig,
        DinoSchedules,
        dino_train_step,
        init_dino_train_state,
        _forward_crops,
    )
    from functools import partial

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    epochs, niter = 1, 100
    cfg = DinoConfig(arch="vit_small", patch_size=8, out_dim=65536, niter_per_ep=niter)
    state = init_dino_train_state(jax.random.PRNGKey(0), cfg)
    sch = DinoSchedules(
        lr=jnp.asarray(schedules.cosine_scheduler(5e-4, 1e-6, epochs, niter)),
        wd=jnp.asarray(schedules.cosine_scheduler(0.04, 0.4, epochs, niter)),
        teacher_momentum=jnp.asarray(schedules.cosine_scheduler(0.996, 1.0, epochs, niter)),
        teacher_temp=jnp.asarray(schedules.teacher_temp_schedule(0.04, 0.04, 0, epochs)),
    )
    mc_cfg = MultiCropConfig()
    raw = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))

    t_aug = timeit(lambda: multicrop_augment(jax.random.PRNGKey(3), raw, mc_cfg))
    print(f"augment only:        {t_aug*1e3:8.2f} ms")

    g, locals_ = jax.block_until_ready(
        multicrop_augment(jax.random.PRNGKey(3), raw, mc_cfg)
    )

    enc_t = cfg.encoder(student=False)
    head_cfg = cfg.head_config()

    @jax.jit
    def teacher_fwd(params, g):
        out, _ = _forward_crops(params, {}, g, (), enc_t, head_cfg, None, False)
        return out

    t_t = timeit(lambda: teacher_fwd(state.teacher, g))
    print(f"teacher fwd (2x224): {t_t*1e3:8.2f} ms")

    enc_s = cfg.encoder(student=True)

    @jax.jit
    def student_fwd(params, g, locals_):
        out, _ = _forward_crops(
            params, {}, g, locals_, enc_s, head_cfg, jax.random.PRNGKey(0), True
        )
        return out

    t_s = timeit(lambda: student_fwd(state.student, g, locals_))
    print(f"student fwd (8 cr):  {t_s*1e3:8.2f} ms")

    @jax.jit
    def student_fwd_bwd(params, g, locals_):
        def loss_fn(p):
            out, _ = _forward_crops(
                p, {}, g, locals_, enc_s, head_cfg, jax.random.PRNGKey(0), True
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.grad(loss_fn)(params)

    t_sb = timeit(lambda: student_fwd_bwd(state.student, g, locals_))
    print(f"student fwd+bwd:     {t_sb*1e3:8.2f} ms")

    def full(state, rng):
        rng, k = jax.random.split(rng)
        g, locals_ = multicrop_augment(k, raw, mc_cfg)
        state, metrics = dino_train_step(state, g, locals_, sch, cfg)
        return state, rng, metrics

    rng = jax.random.PRNGKey(2)
    state, rng, m = full(state, rng)
    float(m["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, rng, m = full(state, rng)
    float(m["loss"])
    t_full = (time.perf_counter() - t0) / iters
    print(f"full step:           {t_full*1e3:8.2f} ms   ({B/t_full:.1f} img/s)")


if __name__ == "__main__":
    main()
