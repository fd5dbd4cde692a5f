"""DINO-MC / DINO-TP self-supervised pretraining entry point.

Parity target: ``main_dino_mc.py`` (flags mirror its argparse,
``:46-151``; flow mirrors ``train_dino``/``train_one_epoch``,
``:154-416``). Differences are TPU-native by design:
  * one SPMD program over a data mesh instead of one process per GPU;
  * the PIL augmentation worker pool becomes the on-device
    ``multicrop_augment`` chain inside the step;
  * bf16 compute instead of fp16+GradScaler (``--use_fp16`` accepted and
    ignored — bf16 needs no scaler and is stable at patch 8);
  * orbax epoch checkpoints with restart-from-latest (the submitit
    requeue path, ``run_dino_with_submitit.py:71-78``, reduces to
    re-running this script with the same --output_dir).

Run ``python -m dinomc_tpu.cli.train_dino --help``. Use
``--data_path synthetic`` for a datasets-free smoke run.
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import numpy as np


def get_args_parser() -> argparse.ArgumentParser:
    from dinomc_tpu.cli.common import bool_flag

    p = argparse.ArgumentParser("DINO-MC (TPU)", add_help=False)
    # model
    p.add_argument("--arch", default="vit_small", type=str,
                   choices=["vit_tiny", "vit_small", "vit_base", "resnet50",
                            "wide_resnet50_2", "swin_t", "xcit_small_12", "xcit_medium_24"])
    p.add_argument("--patch_size", default=8, type=int)
    p.add_argument("--out_dim", default=65536, type=int)
    p.add_argument("--norm_last_layer", default=True, type=bool_flag)
    p.add_argument("--momentum_teacher", default=0.996, type=float)
    p.add_argument("--use_bn_in_head", default=False, type=bool_flag)
    p.add_argument("--data_mode", default="mc", type=str, choices=["dino", "mc", "tp"])
    # teacher temperature
    p.add_argument("--warmup_teacher_temp", default=0.04, type=float)
    p.add_argument("--teacher_temp", default=0.04, type=float)
    p.add_argument("--warmup_teacher_temp_epochs", default=0, type=int)
    # optimization
    p.add_argument("--use_fp16", default=True, type=bool_flag,
                   help="accepted for parity; TPU path always computes in bf16")
    p.add_argument("--weight_decay", default=0.04, type=float)
    p.add_argument("--weight_decay_end", default=0.4, type=float)
    p.add_argument("--clip_grad", default=3.0, type=float)
    p.add_argument("--batch_size_per_gpu", default=8, type=int,
                   help="per-process batch size (name kept for parity)")
    p.add_argument("--epochs", default=300, type=int)
    p.add_argument("--freeze_last_layer", default=1, type=int)
    p.add_argument("--lr", default=0.0005, type=float)
    p.add_argument("--warmup_epochs", default=10, type=int)
    p.add_argument("--min_lr", default=1e-6, type=float)
    p.add_argument("--optimizer", default="adamw", choices=["adamw", "sgd", "lars"])
    p.add_argument("--drop_path_rate", default=0.1, type=float)
    # multi-crop
    p.add_argument("--global_crops_scale", type=float, nargs="+", default=(0.32, 1.0))
    p.add_argument("--global_crops_number", type=int, default=2)
    p.add_argument("--local_crops_number", type=int, default=6)
    p.add_argument("--size_crops", type=int, nargs="+",
                   default=[184, 164, 144, 124, 104, 84])
    p.add_argument("--local_crops_scale", type=float, nargs="+", default=(0.05, 0.32))
    # misc
    p.add_argument("--data_path", default="synthetic", type=str,
                   help="SeCo-style root dir, or 'synthetic' for a smoke run")
    p.add_argument("--image_size", default=256, type=int,
                   help="host-side decode/resize resolution before device aug")
    p.add_argument("--bands", default=None, type=str, nargs="+",
                   help="multispectral pretraining: Sentinel-2 band names "
                        "(e.g. --bands B4 B3 B2) read from multi-band tifs "
                        "or per-band {B}.tif directories with per-band "
                        "quantile normalization (reference main_dino_mc.py "
                        "--bands / dino_dataset.py:69-87). Exactly 3 bands "
                        "(the aug chain is defined on 3 channels, as the "
                        "reference's is); default = plain RGB decode")
    p.add_argument("--output_dir", default="output_dir", type=str)
    p.add_argument("--saveckp_freq", default=20, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--print_freq", default=10, type=int)
    p.add_argument("--max_steps", default=0, type=int,
                   help="stop after N optimizer steps (0 = full run); smoke-test aid")
    p.add_argument("--model_parallel", default=1, type=int,
                   help="mesh size of the 'model' axis: shards the DINO head's "
                        "out_dim-wide last layer, its Adam moments, the EMA copy "
                        "and the center across chips (tensor parallelism); the "
                        "remaining chips form the 'data' axis")
    p.add_argument("--fsdp", default=False, type=bool_flag,
                   help="ZeRO-shard params / Adam moments / EMA copy over the "
                        "'data' axis (XLA all-gathers at use); memory lever for "
                        "the larger encoders")
    p.add_argument("--grad_accum_steps", default=1, type=int,
                   help="split each batch into N sequential microbatches and "
                        "apply one optimizer step on the averaged gradients "
                        "(reference-scale effective batches on few chips); "
                        "batch_size_per_gpu must be divisible by N")
    p.add_argument("--remat_policy", default="attn", type=str,
                   choices=["full", "dots", "dots+attn", "attn", "qkv+attn",
                            "attn+mlp", "qkv+attn+mlp"],
                   help="ViT selective rematerialization: which block "
                        "activations to save for backward (all numerically "
                        "identical; recompute-vs-HBM trade — see "
                        "models/vit.ViTConfig and scripts/remat_bench.py; "
                        "'qkv+attn+mlp' is fastest at small per-chip batches, "
                        "'attn' at larger ones)")
    return p


class _SyntheticImages:
    """Random-image dataset for smoke runs (no datasets in the container)."""

    def __init__(self, n: int, size: int, temporal: bool):
        self.n, self.size, self.temporal = n, size, temporal

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        if self.temporal:
            return rng.rand(4, self.size, self.size, 3).astype(np.float32)
        return rng.rand(self.size, self.size, 3).astype(np.float32)


def train_dino(args) -> float:
    import jax
    import jax.numpy as jnp

    from dinomc_tpu.cli.common import ensure_dir, resolve_platform, set_seed
    from dinomc_tpu.ckpt.orbax_io import CheckpointManager
    from dinomc_tpu.core import schedules
    from dinomc_tpu.core.mesh import (
        batch_sharding,
        make_mesh,
        replicate,
        shard_dino_state,
    )
    from dinomc_tpu.data import packed
    from dinomc_tpu.data.loader import PrefetchLoader, ShardedSampler
    from dinomc_tpu.data.seco import FlatImageFolder, MCBase, MCTemporal
    from dinomc_tpu.ops.augment import (
        MultiCropConfig,
        multicrop_augment,
        multicrop_augment_tp,
    )
    from dinomc_tpu.parallel.distributed import (
        get_rank,
        get_world_size,
        init_distributed_mode,
        setup_for_distributed,
    )
    from dinomc_tpu.train.dino_trainer import (
        DinoConfig,
        DinoSchedules,
        dino_train_step,
        dino_train_step_accum,
        init_dino_train_state,
    )
    from dinomc_tpu.utils.logging import JsonlLogger, MetricLogger

    resolve_platform()
    init_distributed_mode()
    setup_for_distributed()
    set_seed(args.seed + get_rank())
    ensure_dir(args.output_dir)

    n_devices = len(jax.devices())
    tp = max(1, getattr(args, "model_parallel", 1))
    assert n_devices % tp == 0, f"model_parallel={tp} must divide {n_devices} devices"
    mesh = make_mesh(data=n_devices // tp, model=tp)
    temporal = args.data_mode == "tp"

    # ---- data -------------------------------------------------------------
    bands = getattr(args, "bands", None)
    if bands is not None:
        assert len(bands) == 3, (
            f"--bands takes exactly 3 band names (got {bands}): the "
            "augmentation chain (color jitter/grayscale/solarize) is "
            "defined on 3 channels, as the reference's RGB transforms are"
        )
    if args.data_path == "synthetic":
        dataset = _SyntheticImages(
            max(args.batch_size_per_gpu * n_devices * 4, 64), args.image_size, temporal
        )
    elif packed.is_packed(args.data_path):
        # decode-once packed shards (data/packed.py): mmap reads, uint8 to
        # the device, f32 conversion fused into the on-device aug chain —
        # the production host path for feeding 8 chips (docs/performance.md)
        if temporal:
            dataset = packed.PackedMCTemporal(args.data_path, seed=args.seed)
        else:
            dataset = packed.PackedMC(args.data_path, seed=args.seed)
    elif temporal:
        dataset = MCTemporal(
            args.data_path, image_size=args.image_size, bands=bands
        )
    else:
        try:
            dataset = MCBase(
                args.data_path, image_size=args.image_size, bands=bands
            )
            if len(dataset) == 0:
                raise FileNotFoundError
        except (FileNotFoundError, NotADirectoryError):
            dataset = FlatImageFolder(args.data_path, image_size=args.image_size)

    # n_devices (= len(jax.devices())) is GLOBAL across hosts; each host
    # loads batch_size_per_gpu x its local chips and the loader assembles
    # the global array from the per-process shards.
    global_batch = args.batch_size_per_gpu * n_devices
    sampler = ShardedSampler(
        len(dataset), args.batch_size_per_gpu * jax.local_device_count(),
        num_shards=get_world_size(), shard_id=get_rank(), seed=args.seed,
    )
    loader = PrefetchLoader(
        dataset, sampler, sharding=batch_sharding(mesh), prefetch=2
    )
    niter_per_ep = max(len(loader), 1)

    # ---- model + schedules ------------------------------------------------
    size_crops = list(args.size_crops)
    if len(size_crops) > args.local_crops_number:
        size_crops = size_crops[len(size_crops) - args.local_crops_number:]
    mc_cfg = MultiCropConfig(
        global_size=224,
        global_scale=tuple(args.global_crops_scale),
        local_sizes=tuple(size_crops),
        local_scale=tuple(args.local_crops_scale),
    )
    cfg = DinoConfig(
        arch=args.arch,
        patch_size=args.patch_size,
        out_dim=args.out_dim,
        norm_last_layer=args.norm_last_layer,
        use_bn_in_head=args.use_bn_in_head,
        drop_path_rate=args.drop_path_rate,
        clip_grad=args.clip_grad,
        freeze_last_layer=args.freeze_last_layer,
        optimizer=args.optimizer,
        niter_per_ep=niter_per_ep,
        n_global_crops=3 if temporal else args.global_crops_number,
        remat_policy=args.remat_policy,
    )
    sch = DinoSchedules(
        lr=jnp.asarray(schedules.cosine_scheduler(
            schedules.linear_scaled_lr(args.lr, global_batch), args.min_lr,
            args.epochs, niter_per_ep, warmup_epochs=args.warmup_epochs,
        )),
        wd=jnp.asarray(schedules.cosine_scheduler(
            args.weight_decay, args.weight_decay_end, args.epochs, niter_per_ep
        )),
        teacher_momentum=jnp.asarray(schedules.cosine_scheduler(
            args.momentum_teacher, 1.0, args.epochs, niter_per_ep
        )),
        teacher_temp=jnp.asarray(schedules.teacher_temp_schedule(
            args.warmup_teacher_temp, args.teacher_temp,
            args.warmup_teacher_temp_epochs, args.epochs,
        )),
    )

    state = init_dino_train_state(jax.random.PRNGKey(args.seed), cfg)
    ckpt = CheckpointManager(
        f"{args.output_dir}/checkpoints", max_to_keep=2,
        keep_period=args.saveckp_freq * niter_per_ep if args.saveckp_freq else None,
    )
    restored = ckpt.restore(state)
    start_epoch = 0
    if restored is not None:
        state = restored
        start_epoch = int(state.step) // niter_per_ep
        print(f"resumed from step {int(state.step)} (epoch {start_epoch})")
    # head-TP shardings over the 'model' axis (+ optional ZeRO over 'data');
    # degenerates to replication when model_parallel == 1 and fsdp is off.
    state = shard_dino_state(mesh, state, fsdp=getattr(args, "fsdp", False))
    sch = replicate(mesh, sch)

    logger = JsonlLogger(f"{args.output_dir}/log.txt")
    aug_rng = jax.random.PRNGKey(args.seed + 1)
    last_loss = float("nan")
    accum = max(1, getattr(args, "grad_accum_steps", 1))
    if accum > 1:
        # Per-GPU divisibility (as documented): microbatches then keep
        # b = (batch_size_per_gpu/accum) * n_devices samples — still
        # divisible by the data axis, so each microbatch shards cleanly
        # instead of silently replicating.
        assert args.batch_size_per_gpu % accum == 0, (
            f"grad_accum_steps={accum} must divide "
            f"batch_size_per_gpu={args.batch_size_per_gpu}"
        )

    for epoch in range(start_epoch, args.epochs):
        sampler.set_epoch(epoch)
        if hasattr(dataset, "set_epoch"):
            dataset.set_epoch(epoch)
        metric_logger = MetricLogger()
        for it, batch in enumerate(
            metric_logger.log_every(loader, args.print_freq, f"Epoch [{epoch}]")
        ):
            aug_rng, k = jax.random.split(aug_rng)
            if temporal:
                # (B, 4, H, W, 3); the view transpose happens inside the jit
                # (eager ops can't touch multi-host global arrays)
                g, locals_ = multicrop_augment_tp(k, batch, mc_cfg, batch_first=True)
            else:
                g, locals_ = multicrop_augment(k, batch, mc_cfg)
            if accum > 1:
                state, metrics = dino_train_step_accum(
                    state, g, locals_, sch, cfg, accum=accum
                )
            else:
                state, metrics = dino_train_step(state, g, locals_, sch, cfg)
            if it % args.print_freq == 0:
                last_loss = float(metrics["loss"])  # host sync
                if not math.isfinite(last_loss):
                    # NaN guard (main_dino_mc.py:378-380)
                    print(f"Loss is {last_loss}, stopping training", force=True)
                    sys.exit(1)
                metric_logger.update(
                    loss=last_loss, lr=float(metrics["lr"]), wd=float(metrics["wd"])
                )
            if args.max_steps and int(state.step) >= args.max_steps:
                break
        ckpt.save(int(state.step), jax.device_get(state))
        logger.write({"epoch": epoch, "train_loss": last_loss,
                      "step": int(state.step), "time": time.time()})
        if args.max_steps and int(state.step) >= args.max_steps:
            break
    ckpt.wait()
    ckpt.close()
    return last_loss


def main():
    args = argparse.ArgumentParser("DINO-MC", parents=[get_args_parser()]).parse_args()
    train_dino(args)


if __name__ == "__main__":
    main()
