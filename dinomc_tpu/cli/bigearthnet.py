"""BigEarthNet 19-label multi-label classification entry point.

Parity target: ``main_bigearthnet.py`` — MultiLabelSoftMarginLoss
fine-tune, micro-mAP eval via average precision over all (sample, class)
decisions (``:223-225,262``), LMDB-or-folder dataset, and ``--train_frac``
fractional subsets (the BigEarthNet-10% rows, ``:88-90``). The reference's
``data_process.bigearthnet_dataset``/``optim_factory`` imports are absent
from its repo (SURVEY.md §2.7); reconstructed in
data/classification.py.
"""

from __future__ import annotations

import argparse

import numpy as np


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("BigEarthNet (TPU)", add_help=False)
    p.add_argument("--arch", default="resnet50",
                   choices=["vit_tiny", "vit_small", "vit_base", "resnet50",
                            "wide_resnet50_2", "swin_t", "xcit_small_12", "xcit_medium_24"])
    p.add_argument("--patch_size", default=8, type=int)
    p.add_argument("--data_path", default="synthetic", type=str,
                   help="BigEarthNet patch-folder root, .lmdb path, or 'synthetic'")
    p.add_argument("--val_path", default="", type=str)
    p.add_argument("--train_frac", default=1.0, type=float)
    p.add_argument("--pretrained_weights", default="", type=str)
    p.add_argument("--checkpoint_key", default="teacher", type=str)
    p.add_argument("--epochs", default=20, type=int)
    p.add_argument("--batch_size_per_gpu", default=32, type=int)
    p.add_argument("--lr", default=0.001, type=float)
    p.add_argument("--image_size", default=120, type=int)
    p.add_argument("--output_dir", default="ben_output", type=str)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--max_steps", default=0, type=int)
    p.add_argument("--print_freq", default=10, type=int)
    return p


class _SyntheticML:
    def __init__(self, n, size=64, num_classes=19):
        self.n, self.size, self.C = n, size, num_classes

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        y = (rng.rand(self.C) > 0.8).astype(np.float32)
        return rng.rand(self.size, self.size, 3).astype(np.float32), y


def run(args) -> float:
    import jax
    import jax.numpy as jnp

    from dinomc_tpu.cli.common import (
        ensure_dir, load_pretrained_backbone, resolve_platform, set_seed,
    )
    from dinomc_tpu.core.schedules import cosine_scheduler, linear_scaled_lr
    from dinomc_tpu.data.classification import BigEarthNetFolder, LMDBDataset
    from dinomc_tpu.data.loader import random_subset
    from dinomc_tpu.eval.metrics import micro_map
    from dinomc_tpu.ops import augment as aug
    from dinomc_tpu.train.cls_trainer import (
        ClsConfig,
        cls_predict,
        cls_train_step,
        init_cls_train_state,
    )
    from dinomc_tpu.utils.logging import JsonlLogger, MetricLogger

    from dinomc_tpu.core.mesh import make_mesh, replicate, shard_batch

    resolve_platform()
    set_seed(args.seed)
    ensure_dir(args.output_dir)

    # Data-parallel fine-tune over all chips (the reference runs this under
    # DDP with world-size lr scaling — same pattern as main_eurosat.py):
    # params replicated, batches sharded over the data axis.
    mesh = make_mesh()
    global_batch = args.batch_size_per_gpu * len(jax.devices())

    def load_ds(path):
        if path == "synthetic":
            return _SyntheticML(64, 64)
        if path.endswith(".lmdb"):
            return LMDBDataset(path)
        return BigEarthNetFolder(path, image_size=args.image_size)

    train_ds = load_ds(args.data_path)
    val_ds = load_ds(args.val_path or args.data_path)
    idx = np.arange(len(train_ds))
    if args.train_frac < 1.0:  # BigEarthNet-10% path
        idx = random_subset(len(train_ds), args.train_frac, seed=args.seed)
    if len(idx) < global_batch:
        # With drop_last=True a train set smaller than one global batch
        # yields ZERO batches — every epoch would silently train nothing
        # while the schedule/logging suggest progress. Fail loudly.
        raise SystemExit(
            f"train set ({len(idx)} samples) smaller than the global batch "
            f"({global_batch} = {args.batch_size_per_gpu}/chip x "
            f"{len(jax.devices())} chips); lower --batch_size_per_gpu"
        )

    def batches(ds, indices, shuffle, seed, drop_last=True):
        order = np.array(indices)
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        bs = global_batch
        end = len(order) - len(order) % bs if drop_last else len(order)
        for s in range(0, end, bs):
            items = [ds[int(i)] for i in order[s : s + bs]]
            yield np.stack([x for x, _ in items]), np.stack([y for _, y in items])

    cfg = ClsConfig(
        arch=args.arch, patch_size=args.patch_size, num_classes=19, multilabel=True
    )
    pretrained, pretrained_bn = None, None
    if args.pretrained_weights:
        pretrained, pretrained_bn = load_pretrained_backbone(
            args.pretrained_weights, args.arch, args.checkpoint_key
        )
    state = init_cls_train_state(
        jax.random.PRNGKey(args.seed), cfg, pretrained, pretrained_bn
    )
    state = replicate(mesh, state)

    def evaluate() -> float:
        scores, labels = [], []
        for images, y in batches(val_ds, np.arange(len(val_ds)), False, 0,
                                 drop_last=False):
            images = jnp.asarray(images)
            if len(images) % len(jax.devices()) == 0:  # remainder: unsharded
                images = shard_batch(mesh, images)
            logits = cls_predict(
                state.params, state.bn_state, aug.normalize(images), cfg
            )
            scores.append(np.asarray(jax.nn.sigmoid(logits)))
            labels.append(y)
        return micro_map(np.concatenate(scores), np.concatenate(labels)) * 100.0

    niter = max(len(idx) // global_batch, 1)
    lrs = cosine_scheduler(
        linear_scaled_lr(args.lr, global_batch), 1e-6, args.epochs, niter,
    )
    from dinomc_tpu.ckpt.orbax_io import CheckpointManager

    ckpt = CheckpointManager(f"{args.output_dir}/checkpoints", max_to_keep=1,
                             best_mode="max", metric_name="map")
    logger = JsonlLogger(f"{args.output_dir}/log.txt")
    rng = jax.random.PRNGKey(args.seed)
    it, best, start_epoch = 0, 0.0, 0
    # restart_from_checkpoint parity (main_bigearthnet.py:134-151)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        it = int(state.step)
        start_epoch = min(int(ckpt.latest_step()) + 1, args.epochs)
        print(f"resumed from checkpoint at epoch {start_epoch - 1}")
    for epoch in range(start_epoch, args.epochs):
        ml = MetricLogger()
        for images, y in ml.log_every(
            batches(train_ds, idx, True, epoch), args.print_freq,
            f"Epoch [{epoch}]", total=niter,
        ):
            rng, k = jax.random.split(rng)
            # shard BEFORE the augment chain so flips run data-parallel too
            x, y = shard_batch(mesh, (jnp.asarray(images), np.asarray(y)))
            x = aug.random_hflip(k, x)
            x = aug.normalize(x)
            state, m = cls_train_step(
                state, x, jnp.asarray(y),
                jnp.float32(lrs[min(it, len(lrs) - 1)]), jnp.float32(0.0), cfg,
            )
            it += 1
            if it % args.print_freq == 0:
                ml.update(loss=float(m["loss"]))
            if args.max_steps and it >= args.max_steps:
                break
        mAP = evaluate()
        print(f"epoch {epoch}: micro mAP {mAP:.2f}")
        logger.write({"epoch": epoch, "micro_map": mAP})
        if mAP >= best:
            best = mAP
            ckpt.save(epoch, jax.device_get(state), metric=mAP)
        if args.max_steps and it >= args.max_steps:
            break
    ckpt.wait()
    ckpt.close()
    print(f"best micro mAP: {best:.2f}")
    return best


def main():
    args = argparse.ArgumentParser("bigearthnet", parents=[get_args_parser()]).parse_args()
    run(args)


if __name__ == "__main__":
    main()
