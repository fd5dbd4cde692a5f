"""Tiled inference + stitched full-resolution evaluation entry point.

Replaces the reference's three-stage pipeline (SURVEY.md §3.4):
``utils/patch_cropper.py`` (offline tiling) +
``inference_*_patched_dataset.py`` (per-patch .npy logit export) +
``evaluate.py`` (stitch + streaming mIoU) — with ONE command that tiles
full-resolution images on device, runs the model per tile, stitches the
logits, and streams per-class IoU/F1/acc. ``--export_logits_dir`` also
writes per-patch ``.npy`` files + ``patches_metadata.json`` in the
reference's format for interop.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("stitched-eval (TPU)", add_help=False)
    p.add_argument("--dataset", default="uavid",
                   choices=["uavid", "udd6", "potsdam", "loveda"])
    p.add_argument("--data_root", default="synthetic", type=str,
                   help="dir with {images,masks} of FULL-RES pairs, or 'synthetic'")
    p.add_argument("--ckpt", default="", type=str,
                   help="orbax checkpoint dir of a seg train state")
    p.add_argument("--arch", default="vit_small")
    p.add_argument("--patch_size", default=8, type=int)
    p.add_argument("--grid", type=int, nargs=2, default=(2, 2))
    p.add_argument("--overlap_ratio", default=0.0, type=float)
    p.add_argument("--model_size", default=224, type=int)
    p.add_argument("--stitch_mode", default="paste", choices=["paste", "mean"])
    p.add_argument("--full_res", type=int, nargs=2, default=None,
                   help="resize stitched logits/GT to this (H, W); default native")
    p.add_argument("--export_logits_dir", default="", type=str)
    p.add_argument("--limit", default=0, type=int)
    p.add_argument("--seq_parallel", default=1, type=int,
                   help="shard the ViT token axis over N chips (ring "
                        "attention) for large --model_size tiles")
    return p


def run(args):
    import jax
    import jax.numpy as jnp

    from dinomc_tpu.cli.common import resolve_platform
    from dinomc_tpu.data import seg_datasets as sd
    from dinomc_tpu.data.patching import (
        coords_to_metadata,
        custom_grid_coords,
        grid_coords,
        save_metadata,
    )
    from dinomc_tpu.eval import metrics as M
    from dinomc_tpu.eval.tiled_inference import tiled_predict
    from dinomc_tpu.models.upernet import UPerNetConfig
    from dinomc_tpu.ops.augment import normalize
    from dinomc_tpu.train.seg_trainer import SegConfig, init_seg_train_state, seg_predict

    resolve_platform()
    spec = sd.SPECS[args.dataset]
    cfg = SegConfig(
        model=UPerNetConfig(
            num_classes=spec.num_classes, arch=args.arch, patch_size=args.patch_size
        )
    )
    state = init_seg_train_state(jax.random.PRNGKey(0), cfg)
    if args.ckpt and args.ckpt.endswith((".pth", ".pt")):
        # reference-trained mmseg UPerNet checkpoint (train_dino_mc_seg.py
        # save format) — imported into the native trees
        from dinomc_tpu.ckpt.torch_import import load_upernet_checkpoint

        params, bn_state = load_upernet_checkpoint(args.ckpt)
        state = state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, params),
            bn_state=jax.tree_util.tree_map(jnp.asarray, bn_state),
        )
        print(f"imported torch seg checkpoint from {args.ckpt}")
    elif args.ckpt:
        from dinomc_tpu.ckpt.orbax_io import CheckpointManager

        mgr = CheckpointManager(args.ckpt)
        restored = mgr.restore(jax.device_get(state))
        if restored is not None:
            state = restored
            print(f"restored seg checkpoint from {args.ckpt}")
        mgr.close()

    mesh = None
    sp = max(1, getattr(args, "seq_parallel", 1))
    if sp > 1:
        from dinomc_tpu.core.mesh import make_mesh

        n_dev = len(jax.devices())
        assert n_dev % sp == 0, f"seq_parallel={sp} must divide {n_dev} devices"
        mesh = make_mesh(data=n_dev // sp, seq=sp)

    def predict_fn(x):
        return seg_predict(state.params, state.bn_state, x, cfg, mesh=mesh)

    def samples():
        if args.data_root == "synthetic":
            rng = np.random.RandomState(0)
            for i in range(2):
                img = rng.rand(448, 448, 3).astype(np.float32)
                mask = rng.randint(0, spec.num_classes, (448, 448)).astype(np.int32)
                yield f"synthetic_{i}", img, mask
            return
        ds = sd.SegSampleIndex(
            os.path.join(args.data_root, "images"),
            os.path.join(args.data_root, "masks"),
            spec, image_size=None,
        )
        for i in range(len(ds)):
            img, mask = ds.load(i, size=None)
            yield ds.stems[i], img, mask

    stats = M.seg_stats_init(spec.num_classes)
    meta = {}
    n = 0
    for stem, img, mask in samples():
        H, W = img.shape[:2]
        x = normalize(jnp.asarray(img), spec.mean, spec.std)
        logits = tiled_predict(
            predict_fn, x, tuple(args.grid), args.model_size,
            args.overlap_ratio, args.stitch_mode,
        )
        if args.full_res is not None:
            fh, fw = args.full_res
            logits = jax.image.resize(
                logits, (fh, fw, logits.shape[-1]), "bicubic"
            )
            mask = np.asarray(
                jax.image.resize(
                    jnp.asarray(mask)[None, ..., None].astype(jnp.float32),
                    (1, fh, fw, 1), "nearest",
                )[0, ..., 0]
            ).astype(np.int32)
        pred = jnp.argmax(logits, axis=-1)
        stats = M.seg_stats_update(stats, pred, jnp.asarray(mask))

        if args.export_logits_dir:
            os.makedirs(args.export_logits_dir, exist_ok=True)
            if args.overlap_ratio > 0:
                coords = grid_coords(H, W, tuple(args.grid), args.overlap_ratio)
            else:
                coords = custom_grid_coords(H, W, *args.grid)
            meta.update(coords_to_metadata(coords, stem, cols=args.grid[1]))
            for ci, (y0, y1, x0, x1) in enumerate(coords):
                r, c = ci // args.grid[1], ci % args.grid[1]
                np.save(
                    os.path.join(args.export_logits_dir, f"{stem}_{r}_{c}.npy"),
                    np.asarray(logits[y0:y1, x0:x1]).transpose(2, 0, 1),
                )
        n += 1
        if args.limit and n >= args.limit:
            break

    if args.export_logits_dir:
        save_metadata(meta, os.path.join(args.export_logits_dir, "patches_metadata.json"))
    scores = M.seg_stats_finalize(stats)
    print(M.format_class_metrics_table(spec.classes, scores))
    print(f"images: {n}  mIoU {scores['miou']*100:.4f}  mF1 {scores['mf1']*100:.4f}  "
          f"acc {scores['acc']*100:.4f}")
    return scores


def main():
    args = argparse.ArgumentParser(
        "evaluate_stitched", parents=[get_args_parser()]
    ).parse_args()
    run(args)


if __name__ == "__main__":
    main()
