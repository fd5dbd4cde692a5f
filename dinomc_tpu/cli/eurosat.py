"""EuroSAT land-use classification entry point.

Parity target: ``main_eurosat.py`` — end-to-end fine-tune (full model +
10-class head, SGD with linearly scaled lr + cosine annealing,
``main_eurosat.py:101-107``), train transform RandomResizedCrop(224)+flip,
val Resize(256)->CenterCrop(224) (``:57-98``), best-acc checkpointing, and
an ``--evaluate`` mode reporting top-1/top-5 plus per-class
precision/recall/F1 from the confusion matrix (``:198-248``). Additionally
exposes the k-NN and linear-probe protocols behind the README tables
(``--evaluate_knn`` / ``--evaluate_probe``).
"""

from __future__ import annotations

import argparse

import numpy as np


def get_args_parser() -> argparse.ArgumentParser:
    from dinomc_tpu.cli.common import bool_flag

    p = argparse.ArgumentParser("EuroSAT (TPU)", add_help=False)
    p.add_argument("--arch", default="resnet50",
                   choices=["vit_tiny", "vit_small", "vit_base", "resnet50",
                            "wide_resnet50_2", "swin_t", "xcit_small_12", "xcit_medium_24"])
    p.add_argument("--patch_size", default=8, type=int)
    p.add_argument("--data_path", default="synthetic", type=str,
                   help="root with train/ and val/ ImageFolder trees, or 'synthetic'")
    p.add_argument("--num_labels", default=10, type=int)
    p.add_argument("--pretrained_weights", default="", type=str)
    p.add_argument("--checkpoint_key", default="teacher", type=str)
    p.add_argument("--epochs", default=30, type=int)
    p.add_argument("--batch_size_per_gpu", default=32, type=int)
    p.add_argument("--lr", default=0.001, type=float,
                   help="scaled by global_batch/256 like the reference")
    p.add_argument("--evaluate", default=False, type=bool_flag)
    p.add_argument("--evaluate_knn", default=False, type=bool_flag)
    p.add_argument("--evaluate_probe", default=False, type=bool_flag)
    p.add_argument("--output_dir", default="eurosat_output", type=str)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--max_steps", default=0, type=int)
    p.add_argument("--print_freq", default=10, type=int)
    return p


class _SyntheticCls:
    classes = [f"c{i}" for i in range(10)]

    def __init__(self, n, size=64, num_classes=10):
        self.n, self.size, self.C = n, size, num_classes

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        return rng.rand(self.size, self.size, 3).astype(np.float32), i % self.C


def _batches(ds, batch_size, shuffle, seed, drop_last=True):
    order = np.arange(len(ds))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    end = len(order) - len(order) % batch_size if drop_last else len(order)
    for s in range(0, end, batch_size):
        items = [ds[int(i)] for i in order[s : s + batch_size]]
        yield np.stack([x for x, _ in items]), np.asarray([y for _, y in items])


def run(args) -> float:
    import jax
    import jax.numpy as jnp

    from dinomc_tpu.cli.common import (
        ensure_dir, load_pretrained_backbone, resolve_platform, set_seed,
    )
    from dinomc_tpu.ckpt.orbax_io import CheckpointManager
    from dinomc_tpu.core.schedules import cosine_scheduler, linear_scaled_lr
    from dinomc_tpu.data.classification import ImageFolderDataset, center_crop
    from dinomc_tpu.eval import metrics as M
    from dinomc_tpu.eval.knn import knn_accuracy
    from dinomc_tpu.eval.linear_probe import train_linear_probe
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

    # Data-parallel fine-tune over all chips (reference runs this under DDP
    # with world-size lr scaling, main_eurosat.py:25,101-106): params
    # replicated, batches sharded over the data axis, gradient reduction
    # emitted by GSPMD as ICI collectives. Convnet BN batch stats reduce
    # globally under SPMD (SyncBN semantics, tests/test_syncbn.py).
    mesh = make_mesh()
    n_dev = len(jax.devices())
    global_batch = args.batch_size_per_gpu * n_dev

    if args.data_path == "synthetic":
        train_ds = _SyntheticCls(64, 64, args.num_labels)
        val_ds = _SyntheticCls(32, 64, args.num_labels)
        train_size = val_size = 64
    else:
        train_ds = ImageFolderDataset(f"{args.data_path}/train", image_size=256)
        val_ds = ImageFolderDataset(f"{args.data_path}/val", image_size=256)
        train_size, val_size = 224, 224

    cfg = ClsConfig(
        arch=args.arch, patch_size=args.patch_size, num_classes=args.num_labels
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

    def val_images(images):
        x = jnp.asarray(images)
        if x.shape[1] > val_size:
            x = jnp.asarray(center_crop(np.asarray(x), val_size))
        return aug.normalize(x)

    def feats_fn(images):
        f, _ = cfg.encoder().apply(state.params["backbone"], state.bn_state,
                                   val_images(images), False, None)
        return f

    if args.evaluate_knn or args.evaluate_probe:
        from dinomc_tpu.eval.knn import extract_features

        trf, trl = extract_features(
            feats_fn, _batches(train_ds, args.batch_size_per_gpu, False, 0)
        )
        tef, tel = extract_features(
            feats_fn, _batches(val_ds, args.batch_size_per_gpu, False, 0)
        )
        if args.evaluate_knn:
            accs = knn_accuracy(
                jnp.asarray(trf), jnp.asarray(trl), jnp.asarray(tef),
                jnp.asarray(tel), ks=(10, 20), num_classes=args.num_labels,
            )
            print(f"k-NN top-1: {accs}")
            return max(accs.values())
        out = train_linear_probe(
            trf, trl, tef, tel, num_classes=args.num_labels, epochs=50
        )
        print(f"linear probe top-1: {out['top1']:.2f}")
        return out["top1"]

    def evaluate() -> float:
        cm = jnp.zeros((args.num_labels, args.num_labels), jnp.int32)
        for images, labels in _batches(val_ds, global_batch, False, 0,
                                       drop_last=False):
            images = jnp.asarray(images)
            if len(images) % n_dev == 0:  # remainder batch runs unsharded
                images = shard_batch(mesh, images)
            logits = cls_predict(state.params, state.bn_state, val_images(images), cfg)
            y = jnp.asarray(labels)
            cm = cm + M.confusion_matrix(logits.argmax(-1), y, args.num_labels)
        scores = M.cm2score(cm)
        # top-1 from the accumulated confusion matrix: sample-weighted, so a
        # smaller remainder batch (drop_last=False) is not overweighted the
        # way a mean of per-batch accuracies would be.
        top1 = 100.0 * float(cm.diagonal().sum()) / max(float(cm.sum()), 1.0)
        print(f"top1 {top1:.2f}  per-class P/R/F1:")
        for i in range(args.num_labels):
            print(f"  class {i}: {float(scores['precision'][i]):.3f} "
                  f"{float(scores['recall'][i]):.3f} {float(scores['f1'][i]):.3f}")
        return top1

    if args.evaluate:
        # reference --evaluate loads a FINE-TUNED full model (ckpt
        # 'state_dict' incl. the classifier head, main_eurosat.py:71-80).
        # A torch --pretrained_weights file whose state_dict carries a
        # classifier is loaded whole; otherwise restore this run's best
        # fine-tune checkpoint before scoring.
        if args.pretrained_weights.endswith((".pth", ".pt", ".pth.tar")):
            from dinomc_tpu.ckpt.torch_import import (
                load_cls_checkpoint,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(args.pretrained_weights, "state_dict")
            if "head.weight" in sd or "fc.weight" in sd:
                params, bn = load_cls_checkpoint(args.pretrained_weights, args.arch)
                state = state.replace(
                    params=jax.tree_util.tree_map(jnp.asarray, params),
                    bn_state=jax.tree_util.tree_map(jnp.asarray, bn),
                )
                print("loaded fine-tuned torch model (incl. classifier)")
                return evaluate()
        mgr = CheckpointManager(f"{args.output_dir}/checkpoints",
                                max_to_keep=1, best_mode="max",
                                metric_name="acc")
        restored = mgr.restore(state)
        mgr.close()
        if restored is not None:
            state = restored
        return evaluate()

    if len(train_ds) < global_batch:
        # drop_last=True on a train set smaller than one global batch yields
        # ZERO batches per epoch — fail loudly instead of training nothing.
        raise SystemExit(
            f"train set ({len(train_ds)} samples) smaller than the global "
            f"batch ({global_batch} = {args.batch_size_per_gpu}/chip x "
            f"{n_dev} chips); lower --batch_size_per_gpu"
        )
    niter = max(sum(1 for _ in _batches(train_ds, global_batch, False, 0)), 1)
    lrs = cosine_scheduler(
        linear_scaled_lr(args.lr, global_batch), 1e-6, args.epochs, niter
    )
    ckpt = CheckpointManager(f"{args.output_dir}/checkpoints", max_to_keep=1,
                             best_mode="max", metric_name="acc")
    logger = JsonlLogger(f"{args.output_dir}/log.txt")
    rng = jax.random.PRNGKey(args.seed)
    it, best, start_epoch = 0, 0.0, 0
    # restart_from_checkpoint parity (main_eurosat.py:109-114): resume from
    # this run's newest checkpoint (preemption requeue ≡ rerun same command)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        it = int(state.step)
        start_epoch = min(int(ckpt.latest_step()) + 1, args.epochs)
        print(f"resumed from checkpoint at epoch {start_epoch - 1}")
    for epoch in range(start_epoch, args.epochs):
        ml = MetricLogger()
        for images, labels in ml.log_every(
            _batches(train_ds, global_batch, True, epoch),
            args.print_freq, f"Epoch [{epoch}]", total=niter,
        ):
            rng, k1, k2 = jax.random.split(rng, 3)
            # shard BEFORE the augment chain so crops/flips run
            # data-parallel too
            x, labels = shard_batch(mesh, (jnp.asarray(images),
                                           np.asarray(labels)))
            # RandomResizedCrop(224)+flip train transform (main_eurosat.py:57-63)
            x = aug.random_resized_crop(k1, x, train_size, (0.08, 1.0))
            x = aug.random_hflip(k2, x)
            x = aug.normalize(x)
            state, m = cls_train_step(
                state, x, jnp.asarray(labels),
                jnp.float32(lrs[min(it, len(lrs) - 1)]), jnp.float32(0.0), cfg,
            )
            it += 1
            if it % args.print_freq == 0:
                ml.update(loss=float(m["loss"]), acc=float(m["acc"]))
            if args.max_steps and it >= args.max_steps:
                break
        acc = evaluate()
        logger.write({"epoch": epoch, "val_acc": acc})
        if acc >= best:
            best = acc
            ckpt.save(epoch, jax.device_get(state), metric=acc)
        if args.max_steps and it >= args.max_steps:
            break
    ckpt.wait()
    ckpt.close()
    print(f"best val acc: {best:.2f}")
    return best


def main():
    args = argparse.ArgumentParser("eurosat", parents=[get_args_parser()]).parse_args()
    run(args)


if __name__ == "__main__":
    main()
