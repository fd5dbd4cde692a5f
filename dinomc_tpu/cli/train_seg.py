"""Segmentation fine-tuning entry point (UPerNet on DINO features).

Parity target: ``train_dino_mc_seg.py`` / ``train_deit_seg.py`` /
``train_deit_seg_udd6.py`` unified (the three reference scripts differ only
in dataset + checkpoint source): AdamW(3e-4, wd 1e-4) + cosine annealing
over epochs, DiceCE loss, decoder-only fine-tune by default, per-epoch val
with per-class metrics, best-mIoU checkpoint, per-epoch CSV + JSONL logs
(``train_dino_mc_seg.py:27-208``).

``--pretrained_ckpt`` accepts a reference ``.pth`` (imported via
ckpt/torch_import with ``checkpoint_key='teacher'`` like
``networks.py:196-203``; use ``--checkpoint_key none`` for Facebook
DINO/DeiT checkpoints) or an orbax directory saved by this framework.
Use ``--data_root synthetic`` for a datasets-free smoke run.
"""

from __future__ import annotations

import argparse

import numpy as np


def get_args_parser() -> argparse.ArgumentParser:
    from dinomc_tpu.cli.common import bool_flag

    p = argparse.ArgumentParser("seg-finetune (TPU)", add_help=False)
    p.add_argument("--dataset", default="uavid",
                   choices=["uavid", "udd6", "potsdam", "loveda"])
    p.add_argument("--data_root", default="synthetic", type=str,
                   help="dir with train/{images,masks} and val/{images,masks}, "
                        "or 'synthetic'")
    p.add_argument("--arch", default="vit_small",
                   choices=["vit_tiny", "vit_small", "vit_base"])
    p.add_argument("--patch_size", default=8, type=int)
    p.add_argument("--image_size", default=224, type=int)
    p.add_argument("--pretrained_ckpt", default="", type=str)
    p.add_argument("--checkpoint_key", default="teacher", type=str)
    p.add_argument("--train_backbone", default=False, type=bool_flag)
    p.add_argument("--train_decoder", default=True, type=bool_flag)
    p.add_argument("--use_aux_loss", default=False, type=bool_flag)
    p.add_argument("--use_fpn_neck", default=False, type=bool_flag)
    p.add_argument("--lr", default=3e-4, type=float)
    p.add_argument("--weight_decay", default=1e-4, type=float)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--output_dir", default="seg_output", type=str)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--print_freq", default=10, type=int)
    p.add_argument("--max_steps", default=0, type=int)
    p.add_argument("--seq_parallel", default=1, type=int,
                   help="shard the ViT token axis over N chips (ring "
                        "attention); the remaining chips form the data axis. "
                        "For large inputs (512 px = 4097 tokens at patch 8)")
    p.add_argument("--wandb", default=False, type=bool_flag,
                   help="log per-epoch metrics to Weights & Biases (no-op "
                        "when the wandb package / login is unavailable); "
                        "reference: train_dino_mc_seg.py:44-59")
    p.add_argument("--wandb_project", default="dinomc_tpu_seg", type=str)
    return p


class _SyntheticSeg:
    def __init__(self, n, size, num_classes):
        self.n, self.size, self.C = n, size, num_classes

    def __len__(self):
        return self.n

    def batches(self, batch_size, shuffle=False, seed=0, drop_last=True):
        rng = np.random.RandomState(seed)
        for _ in range(max(self.n // batch_size, 1)):
            imgs = rng.rand(batch_size, self.size, self.size, 3).astype(np.float32)
            masks = rng.randint(0, self.C, (batch_size, self.size, self.size))
            yield imgs, masks.astype(np.int32)


def train_seg(args) -> float:
    import os

    import jax
    import jax.numpy as jnp

    from dinomc_tpu.cli.common import ensure_dir, resolve_platform, set_seed
    from dinomc_tpu.ckpt.orbax_io import CheckpointManager
    from dinomc_tpu.core.schedules import cosine_scheduler
    from dinomc_tpu.data import seg_datasets as sd
    from dinomc_tpu.eval import metrics as M
    from dinomc_tpu.models.upernet import UPerNetConfig
    from dinomc_tpu.train.seg_trainer import (
        SegConfig,
        init_seg_train_state,
        seg_predict,
        seg_train_step,
    )
    from dinomc_tpu.utils.logging import JsonlLogger, MetricLogger, write_epoch_csv

    resolve_platform()
    set_seed(args.seed)
    ensure_dir(args.output_dir)
    spec = sd.SPECS[args.dataset]

    mesh = None
    sp = max(1, getattr(args, "seq_parallel", 1))
    if sp > 1:
        from dinomc_tpu.core.mesh import make_mesh

        n_dev = len(jax.devices())
        assert n_dev % sp == 0, f"seq_parallel={sp} must divide {n_dev} devices"
        mesh = make_mesh(data=n_dev // sp, seq=sp)
        print(f"sequence-parallel backbone: mesh {dict(mesh.shape)}")

    if args.data_root == "synthetic":
        train_ds = _SyntheticSeg(16, args.image_size, spec.num_classes)
        val_ds = _SyntheticSeg(8, args.image_size, spec.num_classes)
    else:
        train_ds = sd.SegSampleIndex(
            os.path.join(args.data_root, "train", "images"),
            os.path.join(args.data_root, "train", "masks"),
            spec, image_size=args.image_size,
        )
        val_ds = sd.SegSampleIndex(
            os.path.join(args.data_root, "val", "images"),
            os.path.join(args.data_root, "val", "masks"),
            spec, image_size=args.image_size,
        )

    cfg = SegConfig(
        model=UPerNetConfig(
            num_classes=spec.num_classes,
            arch=args.arch,
            patch_size=args.patch_size,
            use_fpn_neck=args.use_fpn_neck,
        ),
        train_backbone=args.train_backbone,
        train_decoder=args.train_decoder,
        use_aux_loss=args.use_aux_loss,
        ignore_index=spec.ignore_index,
    )
    state = init_seg_train_state(jax.random.PRNGKey(args.seed), cfg)

    if args.pretrained_ckpt:
        if args.pretrained_ckpt.endswith((".pth", ".pt")):
            from dinomc_tpu.ckpt.torch_import import load_dino_backbone

            key = None if args.checkpoint_key.lower() == "none" else args.checkpoint_key
            backbone = load_dino_backbone(args.pretrained_ckpt, checkpoint_key=key)
            params = dict(state.params)
            params["backbone"] = jax.tree_util.tree_map(jnp.asarray, backbone)
            state = state.replace(params=params)
        else:
            from dinomc_tpu.ckpt.orbax_io import restore_pytree

            tree = restore_pytree(args.pretrained_ckpt)
            src = tree.get("teacher", tree) if isinstance(tree, dict) else tree
            params = dict(state.params)
            params["backbone"] = jax.tree_util.tree_map(
                jnp.asarray, src["backbone"] if "backbone" in src else src
            )
            state = state.replace(params=params)
        print(f"loaded pretrained backbone from {args.pretrained_ckpt}")

    niter = max(len(list(train_ds.batches(args.batch_size, seed=0))), 1)
    lrs = cosine_scheduler(args.lr, 1e-6, args.epochs, niter)
    ckpt = CheckpointManager(
        f"{args.output_dir}/checkpoints", max_to_keep=1, best_mode="max",
        metric_name="miou",
    )
    logger = JsonlLogger(f"{args.output_dir}/log.txt")
    from dinomc_tpu.utils.logging import WandbLogger

    wb = WandbLogger(
        args.wandb_project, name=f"{args.dataset}_{args.arch}",
        config=vars(args), enabled=bool(getattr(args, "wandb", False)),
    )
    aug_rng = jax.random.PRNGKey(args.seed)
    best_miou, it, start_epoch = 0.0, 0, 0
    # resume from this run's newest checkpoint (the reference seg trainers
    # cannot resume at all — best-only torch.save, train_dino_mc_seg.py:187-197)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        it = int(state.step)
        start_epoch = min(int(ckpt.latest_step()) + 1, args.epochs)
        print(f"resumed from checkpoint at epoch {start_epoch - 1}")

    for epoch in range(start_epoch, args.epochs):
        ml = MetricLogger()
        batches = train_ds.batches(args.batch_size, shuffle=True, seed=epoch)
        for images, masks in ml.log_every(
            batches, args.print_freq, f"Epoch [{epoch}]", total=niter
        ):
            aug_rng, k = jax.random.split(aug_rng)
            imgs, msks = sd.augment_batch(
                k, jnp.asarray(images), jnp.asarray(masks), spec, train=True
            )
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                n_data = mesh.shape["data"]
                if n_data > 1 and imgs.shape[0] % n_data == 0:
                    imgs = jax.device_put(imgs, NamedSharding(mesh, P("data")))
                    msks = jax.device_put(msks, NamedSharding(mesh, P("data")))
            state, m = seg_train_step(
                state, imgs, msks, jnp.float32(lrs[min(it, len(lrs) - 1)]),
                jnp.float32(args.weight_decay), cfg, mesh=mesh,
            )
            it += 1
            if it % args.print_freq == 0:
                ml.update(loss=float(m["loss"]), acc=float(m["pixel_acc"]))
            if args.max_steps and it >= args.max_steps:
                break

        # validation (per-class CM metrics, train_dino_mc_seg.py:129-164)
        stats = M.seg_stats_init(spec.num_classes)
        for images, masks in val_ds.batches(args.batch_size, seed=0):
            imgs, _ = sd.augment_batch(
                jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(masks),
                spec, train=False,
            )
            logits = seg_predict(state.params, state.bn_state, imgs, cfg, mesh=mesh)
            stats = M.seg_stats_update(stats, logits.argmax(-1), jnp.asarray(masks))
        scores = M.seg_stats_finalize(stats)
        print(M.format_class_metrics_table(spec.classes, scores))
        logger.write({"epoch": epoch, "miou": scores["miou"], "mf1": scores["mf1"],
                      "acc": scores["acc"]})
        if wb.active:
            # per-class IoU/F1 panels, as the reference logs them
            # (train_dino_mc_seg.py:171-185)
            wb.log(
                {"epoch": epoch, "val/miou": scores["miou"],
                 "val/mf1": scores["mf1"], "val/acc": scores["acc"],
                 **{f"val/iou_{c}": v for c, v in
                    zip(spec.classes, scores["iou"])},
                 **{f"val/f1_{c}": v for c, v in
                    zip(spec.classes, scores["f1"])}},
                step=epoch,
            )
        write_epoch_csv(
            f"{args.output_dir}/metrics.csv", epoch,
            {"miou": scores["miou"], "mf1": scores["mf1"], "acc": scores["acc"]},
            per_class={"iou": scores["iou"], "f1": scores["f1"]},
            class_names=spec.classes,
        )
        if scores["miou"] >= best_miou:
            best_miou = scores["miou"]
            ckpt.save(epoch, jax.device_get(state), metric=scores["miou"])
        if args.max_steps and it >= args.max_steps:
            break
    ckpt.wait()
    ckpt.close()
    wb.finish()
    print(f"best mIoU: {best_miou:.4f}")
    return best_miou


def main():
    args = argparse.ArgumentParser("seg", parents=[get_args_parser()]).parse_args()
    train_seg(args)


if __name__ == "__main__":
    main()
