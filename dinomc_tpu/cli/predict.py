"""Single-image segmentation prediction + visualization.

Parity target: ``inference_segmentation.py`` — which is broken in the
reference (imports a nonexistent ``UPerNetDinoVit``, reads a nonexistent
config entry, and uses an undefined ``save_path``; SURVEY.md §7 known
bugs). This is the working equivalent: load a seg checkpoint, predict one
image (optionally tiled for large inputs), save a color mask and a
legend figure.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("predict (TPU)", add_help=False)
    p.add_argument("--image", required=True, type=str)
    p.add_argument("--dataset", default="uavid",
                   choices=["uavid", "udd6", "potsdam", "loveda"])
    p.add_argument("--ckpt", default="", type=str)
    p.add_argument("--arch", default="vit_small")
    p.add_argument("--patch_size", default=8, type=int)
    p.add_argument("--model_size", default=224, type=int)
    p.add_argument("--grid", type=int, nargs=2, default=None,
                   help="tile the image with this grid; default: whole-image")
    p.add_argument("--out", default="prediction.png", type=str)
    p.add_argument("--figure", default="", type=str,
                   help="also save a side-by-side legend figure here")
    p.add_argument("--seq_parallel", default=1, type=int,
                   help="shard the ViT token axis over N chips (ring "
                        "attention) for large --model_size inputs")
    return p


def run(args):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from dinomc_tpu.cli.common import resolve_platform
    from dinomc_tpu.data import seg_datasets as sd
    from dinomc_tpu.eval.tiled_inference import tiled_predict
    from dinomc_tpu.models.upernet import UPerNetConfig
    from dinomc_tpu.ops.augment import normalize
    from dinomc_tpu.train.seg_trainer import SegConfig, init_seg_train_state, seg_predict
    from dinomc_tpu.utils.visualization import save_segmentation_figure

    resolve_platform()
    spec = sd.SPECS[args.dataset]
    cfg = SegConfig(
        model=UPerNetConfig(
            num_classes=spec.num_classes, arch=args.arch, patch_size=args.patch_size
        )
    )
    state = init_seg_train_state(jax.random.PRNGKey(0), cfg)
    if args.ckpt and args.ckpt.endswith((".pth", ".pt")):
        from dinomc_tpu.ckpt.torch_import import load_upernet_checkpoint

        params, bn_state = load_upernet_checkpoint(args.ckpt)
        state = state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, params),
            bn_state=jax.tree_util.tree_map(jnp.asarray, bn_state),
        )
    elif args.ckpt:
        from dinomc_tpu.ckpt.orbax_io import CheckpointManager

        mgr = CheckpointManager(args.ckpt)
        restored = mgr.restore(jax.device_get(state))
        if restored is not None:
            state = restored
        mgr.close()

    img = np.asarray(Image.open(args.image).convert("RGB"), np.float32) / 255.0
    x = normalize(jnp.asarray(img), spec.mean, spec.std)

    mesh = None
    sp = max(1, getattr(args, "seq_parallel", 1))
    if sp > 1:
        from dinomc_tpu.core.mesh import make_mesh

        n_dev = len(jax.devices())
        assert n_dev % sp == 0, f"seq_parallel={sp} must divide {n_dev} devices"
        mesh = make_mesh(data=n_dev // sp, seq=sp)

    def predict_fn(batch):
        return seg_predict(state.params, state.bn_state, batch, cfg, mesh=mesh)

    if args.grid:
        logits = tiled_predict(predict_fn, x, tuple(args.grid), args.model_size)
    else:
        s = args.model_size
        resized = jax.image.resize(x, (s, s, 3), "bicubic")
        logits = predict_fn(resized[None])[0]
        logits = jax.image.resize(
            logits, (img.shape[0], img.shape[1], spec.num_classes), "bicubic"
        )
    pred = np.asarray(jnp.argmax(logits, -1)).astype(np.uint8)

    Image.fromarray(sd.class_to_rgb(pred, spec)).save(args.out)
    print(f"saved color mask to {args.out}")
    if args.figure:
        save_segmentation_figure(
            img, pred, spec.classes, spec.palette, args.figure
        )
        print(f"saved figure to {args.figure}")
    return pred


def main():
    args = argparse.ArgumentParser("predict", parents=[get_args_parser()]).parse_args()
    run(args)


if __name__ == "__main__":
    main()
