"""Per-architecture DINO pretraining throughput on the real chip.

The reference pretrains four backbone families (``main_dino_mc.py:209-229``):
ViT-S/8 (AdamW), ResNet-50 + WRN-50-2 (SyncBN, LARS, ``:250-256,286``) and
Swin-T. bench.py covers only the ViT flagship; this script times the SAME
full step (on-device multi-crop aug + teacher/student + loss + optimizer +
EMA) for every arch and prints one JSON line each — the per-arch table in
docs/performance.md.

Batch sizes are per-arch sweep winners (--sweep re-runs the sweep). The
convnet steps exercise BN batch-stat reductions exactly as a sharded run
would (stats over the full per-chip batch; under SPMD the batch axis mean
becomes the cross-chip collective, tests/test_syncbn.py).

Run: python scripts/bench_archs.py [--archs resnet50 swin_t] [--iters 10]
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (batch, optimizer) per arch: reference optimizer choices
# (main_dino_mc.py:280-286 — adamw for ViT/Swin/XCiT, LARS recommended for
# convnets). Batches are v5e-16GB sweep winners (--sweep).
ARCH_SETUPS = {
    "vit_small": dict(batch=10, optimizer="adamw", patch_size=8,
                      remat_policy="qkv+attn+mlp"),
    "resnet50": dict(batch=24, optimizer="lars"),
    "wide_resnet50_2": dict(batch=16, optimizer="lars"),
    "swin_t": dict(batch=16, optimizer="adamw"),
    # p16 is the table default; p8 also trains since XCiTConfig.remat
    # (docs/performance.md per-arch table). The r5 tanh-GELU + lean-BN
    # lever moved the sweep optimum 8 -> 32 (246/276/298/322/323 at
    # B=8/12/16/24/32 — the erf-GELU-dominated step stopped scaling at
    # B=8; the lean one keeps scaling to the HBM plateau).
    "xcit_small_12": dict(batch=32, optimizer="adamw", patch_size=16),
}


def bench_arch(arch: str, B: int, iters: int = 10, windows: int = 3) -> dict:
    from dinomc_tpu.core import schedules
    from dinomc_tpu.ops.augment import MultiCropConfig, multicrop_augment
    from dinomc_tpu.train.dino_trainer import (
        DinoConfig,
        DinoSchedules,
        dino_train_step,
        init_dino_train_state,
    )

    setup = ARCH_SETUPS[arch]
    epochs, niter = 1, 100
    cfg = DinoConfig(
        arch=arch,
        patch_size=setup.get("patch_size", 16),
        out_dim=65536,
        niter_per_ep=niter,
        optimizer=setup["optimizer"],
        remat_policy=setup.get("remat_policy", "attn"),
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
    mc_cfg = MultiCropConfig()
    raw = jax.random.uniform(jax.random.PRNGKey(1), (B, 256, 256, 3))

    def step(state, rng):
        rng, k = jax.random.split(rng)
        g, locals_ = multicrop_augment(k, raw, mc_cfg)
        state, metrics = dino_train_step(state, g, locals_, sch, cfg)
        return state, rng, metrics

    rng = jax.random.PRNGKey(2)
    t_c0 = time.perf_counter()
    state, rng, metrics = step(state, rng)
    float(metrics["loss"])  # host sync (axon block_until_ready returns early)
    compile_s = time.perf_counter() - t_c0

    dts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, rng, metrics = step(state, rng)
        float(metrics["loss"])
        dts.append(time.perf_counter() - t0)
    img_s = B * iters / min(dts)

    # Per-arch MFU from the jaxpr matmul-FLOP counter (utils/flops.py) —
    # same convention as bench.py's analytic ViT number (validated 1.0000x
    # against it, and against published RN50 4.1 / Swin-T 4.5 GMACs).
    from dinomc_tpu.utils import flops as flops_model

    f_img = flops_model.arch_step_flops_per_image(
        arch, patch_size=setup.get("patch_size", 16),
        global_size=mc_cfg.global_size, local_sizes=mc_cfg.local_sizes,
    )
    kind = jax.devices()[0].device_kind.lower()
    peak = next(
        (v for k, v in flops_model.TPU_PEAK_FLOPS.items() if k in kind),
        flops_model.TPU_PEAK_FLOPS["v5e"],
    )
    return {
        "metric": f"dino_mc_{arch}_pretrain_throughput",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "value_mean": round(B * iters * len(dts) / sum(dts), 2),
        "batch": B,
        "optimizer": setup["optimizer"],
        "mfu": round(flops_model.mfu(img_s, f_img, peak), 4),
        "model_gflops_per_image": round(f_img / 1e9, 1),
        "compile_s": round(compile_s, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--archs", nargs="+", default=list(ARCH_SETUPS))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--sweep", action="store_true",
                    help="sweep batch sizes around the default per arch")
    args = ap.parse_args()

    for arch in args.archs:
        if args.sweep:
            base = ARCH_SETUPS[arch]["batch"]
            for B in sorted({max(base // 2, 2), base, base + base // 2,
                             base * 2}):
                try:
                    print(json.dumps(bench_arch(arch, B, args.iters)),
                          flush=True)
                except Exception as e:  # OOM at large B ends the sweep
                    print(json.dumps({"metric": f"dino_mc_{arch}",
                                      "batch": B,
                                      "error": str(e)[:120]}), flush=True)
                    break
        else:
            try:
                print(json.dumps(
                    bench_arch(arch, ARCH_SETUPS[arch]["batch"], args.iters)
                ), flush=True)
            except Exception as e:  # keep the remaining archs' rows
                print(json.dumps({"metric": f"dino_mc_{arch}",
                                  "batch": ARCH_SETUPS[arch]["batch"],
                                  "error": str(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
