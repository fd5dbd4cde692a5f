"""Compare remat policies / batch sizes on the full DINO step (real chip).

Usage: python scripts/remat_bench.py [-B 16,24,32] [policy ...]
Policies default to: dots dots+attn. B defaults to {32, 64}.
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from dinomc_tpu.core import schedules
from dinomc_tpu.models import vit as vt
from dinomc_tpu.models.encoders import EncoderConfig
from dinomc_tpu.ops.augment import MultiCropConfig, multicrop_augment
from dinomc_tpu.train.dino_trainer import (
    DinoConfig,
    DinoSchedules,
    dino_train_step,
    init_dino_train_state,
)


def run(policy: str, B: int) -> float:
    # 'none' (disable remat entirely) still needs the factory patch; named
    # policies flow through DinoConfig.remat_policy (part of the jit key).
    jax.clear_caches()
    orig = EncoderConfig._vit_cfg

    def patched(self):
        return dataclasses.replace(orig(self), remat=False)

    if policy == "none":
        EncoderConfig._vit_cfg = patched
    try:
        epochs, niter = 1, 100
        cfg = DinoConfig(
            arch="vit_small",
            patch_size=8,
            out_dim=65536,
            niter_per_ep=niter,
            remat_policy=policy if policy != "none" else "attn",
        )
        state = init_dino_train_state(jax.random.PRNGKey(0), cfg)
        sch = DinoSchedules(
            lr=jnp.asarray(schedules.cosine_scheduler(5e-4, 1e-6, epochs, niter)),
            wd=jnp.asarray(schedules.cosine_scheduler(0.04, 0.4, epochs, niter)),
            teacher_momentum=jnp.asarray(
                schedules.cosine_scheduler(0.996, 1.0, epochs, niter)
            ),
            teacher_temp=jnp.asarray(schedules.teacher_temp_schedule(0.04, 0.04, 0, epochs)),
        )
        mc_cfg = MultiCropConfig()
        raw = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))

        def step(state, rng):
            rng, k = jax.random.split(rng)
            g, locals_ = multicrop_augment(k, raw, mc_cfg)
            state, metrics = dino_train_step(state, g, locals_, sch, cfg)
            return state, rng, metrics

        rng = jax.random.PRNGKey(2)
        state, rng, m = step(state, rng)
        float(m["loss"])
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            state, rng, m = step(state, rng)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        return B / dt
    finally:
        EncoderConfig._vit_cfg = orig


if __name__ == "__main__":
    argv = sys.argv[1:]
    bs = (32, 64)
    if argv and argv[0] == "-B":
        try:
            bs = tuple(int(x) for x in argv[1].split(","))
        except (IndexError, ValueError):
            sys.exit("usage: remat_bench.py [-B 16,24,32] [policy ...]")
        argv = argv[2:]
    policies = argv or ["dots", "dots+attn"]
    for policy in policies:
        for B in bs:
            try:
                ips = run(policy, B)
                print(f"policy={policy:10s} B={B:3d}  {ips:7.1f} img/s", flush=True)
            except Exception as e:
                print(f"policy={policy:10s} B={B:3d}  FAILED: {str(e)[:150]}", flush=True)
