"""Measure the merged-bucket GEMM lever (DinoConfig.bucket_merge) on the
real chip: the full bench.py step (augment + teacher/student + loss +
backward + optimizer + EMA) with all crop buckets' dense GEMMs merged into
single large-M GEMMs per layer (models/vit.vit_forward_multi) vs the
per-bucket baseline.

Motivation (docs/performance.md, r3 probe): standalone MLP-shape GEMM
chains measure 6.3 -> 35.6 TF/s going M = 7.9k -> 56k; the per-bucket step
runs its dense matmuls (80% of model FLOPs) at M ~ 2-16k => ~47% util.
Merging all buckets puts qkv/proj/MLP at M ~ 33k (B=10).

Usage:
    python scripts/merge_bench.py --batch 10 --merge 1
    python scripts/merge_bench.py --sweep       # B x merge grid
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def measure(B: int, merge: bool, policy: str, iters: int = 10,
            windows: int = 3) -> float:
    from dinomc_tpu.core import schedules
    from dinomc_tpu.ops.augment import MultiCropConfig, multicrop_augment
    from dinomc_tpu.train.dino_trainer import (
        DinoConfig, DinoSchedules, dino_train_step, init_dino_train_state,
    )

    epochs, niter = 1, 100
    cfg = DinoConfig(
        arch="vit_small", patch_size=8, out_dim=65536, niter_per_ep=niter,
        remat_policy=policy, bucket_merge=merge,
    )
    state = init_dino_train_state(jax.random.PRNGKey(0), cfg)
    sch = DinoSchedules(
        lr=jnp.asarray(schedules.cosine_scheduler(5e-4, 1e-6, epochs, niter)),
        wd=jnp.asarray(schedules.cosine_scheduler(0.04, 0.4, epochs, niter)),
        teacher_momentum=jnp.asarray(
            schedules.cosine_scheduler(0.996, 1.0, epochs, niter)),
        teacher_temp=jnp.asarray(
            schedules.teacher_temp_schedule(0.04, 0.04, 0, epochs)),
    )
    mc_cfg = MultiCropConfig()
    raw = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))

    def step(state, rng):
        rng, k = jax.random.split(rng)
        g, locals_ = multicrop_augment(k, raw, mc_cfg)
        state, metrics = dino_train_step(state, g, locals_, sch, cfg)
        return state, rng, metrics

    rng = jax.random.PRNGKey(2)
    state, rng, metrics = step(state, rng)
    float(metrics["loss"])  # compile + sync (axon: block_until_ready lies)

    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, rng, m = step(state, rng)
        float(m["loss"])
        best = min(best, time.perf_counter() - t0)
    return B * iters / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--merge", type=int, default=1)
    ap.add_argument("--policy", default="qkv+attn+mlp")
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()

    if args.sweep:
        for B in (10, 12, 16, 20, 24):
            for merge in (False, True):
                try:
                    r = measure(B, merge, args.policy)
                    print(json.dumps({"batch": B, "merge": merge,
                                      "img_per_sec": round(r, 2)}), flush=True)
                except Exception as e:  # OOM at larger B is expected
                    print(json.dumps({"batch": B, "merge": merge,
                                      "error": str(e)[:160]}), flush=True)
    else:
        r = measure(args.batch, bool(args.merge), args.policy)
        print(json.dumps({"batch": args.batch, "merge": bool(args.merge),
                          "policy": args.policy,
                          "img_per_sec": round(r, 2)}))


if __name__ == "__main__":
    main()
