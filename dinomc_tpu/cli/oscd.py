"""OSCD change-detection entry point.

Parity target: ``main_oscd.py`` — SiamSegment over a frozen pretrained
encoder, BCE or dice_bce loss, Adam(lr) + ExponentialLR(0.95), binary
precision/recall/F1 on sigmoid>0.5, best-F1 checkpoint
(``main_oscd.py:28-185``).
"""

from __future__ import annotations

import argparse

import numpy as np


def get_args_parser() -> argparse.ArgumentParser:
    from dinomc_tpu.cli.common import bool_flag

    p = argparse.ArgumentParser("OSCD (TPU)", add_help=False)
    p.add_argument("--backbone", default="resnet50",
                   choices=["resnet50", "wide_resnet50_2"])
    p.add_argument("--data_path", default="synthetic", type=str,
                   help="OSCD root with <city>/{imgs_1,imgs_2,cm}, or 'synthetic'")
    p.add_argument("--pretrained_weights", default="", type=str)
    p.add_argument("--checkpoint_key", default="teacher", type=str)
    p.add_argument("--loss", default="bce", choices=["bce", "dice_bce"])
    p.add_argument("--train_cities", default="", type=str,
                   help="comma-separated city dirs; default: the official "
                        "OSCD 14-city train split")
    p.add_argument("--val_cities", default="", type=str,
                   help="comma-separated city dirs; default: the official "
                        "OSCD 10-city test split")
    p.add_argument("--freeze_encoder", default=True, type=bool_flag)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--output_dir", default="oscd_output", type=str)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--max_steps", default=0, type=int)
    p.add_argument("--print_freq", default=5, type=int)
    p.add_argument("--panel_samples", default=8, type=int,
                   help="val samples visualized per epoch under "
                        "<output_dir>/panels (img1|img2|gt|pred strips, "
                        "the reference's per-sample TensorBoard panels, "
                        "main_oscd.py:54-78); 0 disables")
    return p


def iter_index_batches(indices, global_batch, n_dev, shuffle, seed, trim=True):
    """Yield index chunks of up to ``global_batch``.

    trim=True (train): stop at the last full global batch and trim each
    chunk to an ``n_dev`` multiple so it splits evenly over the data axis.
    trim=False (eval): iterate to ``len(indices)`` so the final partial
    batch is yielded — eval must score every sample (the remainder batch
    runs unsharded).
    """
    import numpy as np

    order = np.array(indices)
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    bs = global_batch
    end = len(order) if not trim else max(len(order) - len(order) % bs, bs)
    for s in range(0, end, bs):
        chunk = order[s : s + bs]
        if trim:
            chunk = chunk[: len(chunk) - len(chunk) % n_dev]
        if len(chunk) == 0:
            break
        yield chunk


class _SyntheticPairs:
    def __init__(self, n, size=96):
        self.n, self.size = n, size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        x1 = rng.rand(self.size, self.size, 3).astype(np.float32)
        change = (rng.rand(self.size, self.size) > 0.9).astype(np.float32)
        x2 = np.clip(x1 + change[..., None] * 0.5, 0, 1).astype(np.float32)
        return x1, x2, change


def run(args) -> float:
    import jax
    import jax.numpy as jnp

    from dinomc_tpu.cli.common import ensure_dir, resolve_platform, set_seed
    from dinomc_tpu.ckpt.orbax_io import CheckpointManager
    from dinomc_tpu.data.oscd import OSCDTiles, collate_pairs
    from dinomc_tpu.models.siamese import SiameseConfig
    from dinomc_tpu.train.oscd_trainer import (
        OSCDConfig,
        exponential_lr,
        init_oscd_train_state,
        oscd_predict,
        oscd_train_step,
    )
    from dinomc_tpu.utils.logging import JsonlLogger, MetricLogger

    from dinomc_tpu.core.mesh import make_mesh, replicate, shard_batch

    resolve_platform()
    set_seed(args.seed)
    ensure_dir(args.output_dir)

    # Data-parallel over all chips: params replicated, tile batches sharded
    # over the data axis (the reference trains OSCD single-process; this is
    # the same mesh pattern as cli/eurosat.py). --batch_size is per chip.
    mesh = make_mesh()
    n_dev = len(jax.devices())
    global_batch = args.batch_size * n_dev

    if args.data_path == "synthetic":
        ds = _SyntheticPairs(32)
        n_val = max(len(ds) // 5, 1)
        train_ds = val_ds = ds
        train_idx = np.arange(len(ds) - n_val)
        val_idx = np.arange(len(ds) - n_val, len(ds))
    else:
        # Split by CITY (official OSCD 14/10 protocol, the reference's
        # datamodule semantics) — an index split would leak tiles of one
        # city into both sides. Falls back to an 80/20 index split when
        # the directory names match neither list (custom corpora).
        from pathlib import Path

        from dinomc_tpu.data.oscd import TEST_CITIES, TRAIN_CITIES

        train_c = args.train_cities.split(",") if args.train_cities else TRAIN_CITIES
        val_c = args.val_cities.split(",") if args.val_cities else TEST_CITIES
        present = {p.name for p in Path(args.data_path).iterdir() if p.is_dir()}
        if present & set(train_c) and present & set(val_c):
            train_ds = OSCDTiles(args.data_path, cities=train_c)
            val_ds = OSCDTiles(args.data_path, cities=val_c)
            train_idx = np.arange(len(train_ds))
            val_idx = np.arange(len(val_ds))
            print(f"city split: {len(train_ds)} train / {len(val_ds)} val tiles")
        else:
            print("city names match no OSCD split; using 80/20 tile split")
            ds = OSCDTiles(args.data_path)
            n_val = max(len(ds) // 5, 1)
            train_ds = val_ds = ds
            train_idx = np.arange(len(ds) - n_val)
            val_idx = np.arange(len(ds) - n_val, len(ds))

    def batches(ds, indices, shuffle, seed, trim=True):
        for chunk in iter_index_batches(
            indices, global_batch, n_dev, shuffle, seed, trim
        ):
            yield collate_pairs([ds[int(i)] for i in chunk])

    def shard_if_divisible(tree):
        """Shard over the data axis when the batch divides the mesh; run a
        remainder batch unsharded (eval must score every sample)."""
        n = len(jax.tree_util.tree_leaves(tree)[0])
        return shard_batch(mesh, tree) if n % n_dev == 0 else tree

    if len(train_idx) < n_dev:
        # The per-batch trim to an n_dev multiple would make every train
        # batch empty — every epoch would silently train nothing.
        raise SystemExit(
            f"train set ({len(train_idx)} tiles) smaller than the device "
            f"count ({n_dev}); need at least one tile per chip"
        )
    cfg = OSCDConfig(
        model=SiameseConfig(arch=args.backbone, freeze_encoder=args.freeze_encoder),
        loss=args.loss,
    )
    pretrained, pretrained_bn = None, None
    if args.pretrained_weights:
        if args.pretrained_weights.endswith((".pth", ".pt", ".ckpt")):
            # reference convnet DINO checkpoints (main_oscd.py loads RN50/WRN
            # teachers): torchvision-format state dicts incl. BN stats
            from dinomc_tpu.ckpt.torch_import import load_convnet_backbone

            pretrained, pretrained_bn = load_convnet_backbone(
                args.pretrained_weights
            )
        else:  # our own orbax trees load directly
            from dinomc_tpu.ckpt.orbax_io import restore_pytree

            tree = restore_pytree(args.pretrained_weights)
            src = tree.get("teacher", tree) if isinstance(tree, dict) else tree
            pretrained = src["backbone"] if "backbone" in src else src
    state = init_oscd_train_state(
        jax.random.PRNGKey(args.seed), cfg, pretrained, pretrained_bn
    )
    state = replicate(mesh, state)

    ckpt = CheckpointManager(f"{args.output_dir}/checkpoints", max_to_keep=1,
                             best_mode="max", metric_name="f1")
    logger = JsonlLogger(f"{args.output_dir}/log.txt")

    def evaluate(epoch=None):
        from dinomc_tpu.utils.visualization import save_change_panel

        panel_dir = None
        if epoch is not None and args.panel_samples > 0:
            panel_dir = ensure_dir(f"{args.output_dir}/panels/epoch_{epoch:03d}")
        n_panels = 0
        tp = fp = fn = 0.0
        for x1, x2, m in batches(val_ds, val_idx, False, 0, trim=False):
            x1d, x2d = shard_if_divisible((jnp.asarray(x1), jnp.asarray(x2)))
            logits = oscd_predict(state.params, state.bn_state, x1d, x2d, cfg)
            pred = np.asarray(jax.nn.sigmoid(logits)) > 0.5
            gt = m > 0.5
            tp += float((pred & gt).sum())
            fp += float((pred & ~gt).sum())
            fn += float((~pred & gt).sum())
            if panel_dir is not None:
                for i in range(len(x1)):
                    if n_panels >= args.panel_samples:
                        break
                    save_change_panel(
                        f"{panel_dir}/sample_{n_panels:02d}.png",
                        np.asarray(x1[i]), np.asarray(x2[i]),
                        gt[i].astype(np.float32),
                        pred[i].astype(np.float32),
                    )
                    n_panels += 1
        prec = tp / max(tp + fp, 1.0)
        rec = tp / max(tp + fn, 1.0)
        f1 = 2 * prec * rec / max(prec + rec, 1e-12)
        iou = tp / max(tp + fp + fn, 1.0)
        return prec * 100, rec * 100, f1 * 100, iou * 100

    it, best_f1, start_epoch = 0, 0.0, 0
    # resume from this run's newest checkpoint (the reference's Lightning
    # ModelCheckpoint keeps best weights only, main_oscd.py:173-180)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        it = int(state.step)
        start_epoch = min(int(ckpt.latest_step()) + 1, args.epochs)
        print(f"resumed from checkpoint at epoch {start_epoch - 1}")
    for epoch in range(start_epoch, args.epochs):
        lr = exponential_lr(args.lr, epoch)
        ml = MetricLogger()
        for x1, x2, m in ml.log_every(
            batches(train_ds, train_idx, True, epoch), args.print_freq, f"Epoch [{epoch}]",
            total=max(len(train_idx) // global_batch, 1),
        ):
            x1d, x2d, md = shard_batch(
                mesh, (jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(m))
            )
            state, metrics = oscd_train_step(
                state, x1d, x2d, md, jnp.float32(lr), cfg,
            )
            it += 1
            if it % args.print_freq == 0:
                ml.update(loss=float(metrics["loss"]), f1=float(metrics["f1"]))
            if args.max_steps and it >= args.max_steps:
                break
        prec, rec, f1, iou = evaluate(epoch)
        print(f"epoch {epoch}: P {prec:.2f} R {rec:.2f} F1 {f1:.2f} IoU {iou:.2f}")
        logger.write({"epoch": epoch, "precision": prec, "recall": rec,
                      "f1": f1, "iou": iou})
        if f1 >= best_f1:
            best_f1 = f1
            ckpt.save(epoch, jax.device_get(state), metric=f1)
        if args.max_steps and it >= args.max_steps:
            break
    ckpt.wait()
    ckpt.close()
    print(f"best F1: {best_f1:.2f}")
    return best_f1


def main():
    args = argparse.ArgumentParser("oscd", parents=[get_args_parser()]).parse_args()
    run(args)


if __name__ == "__main__":
    main()
