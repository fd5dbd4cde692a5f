"""Self-attention video generation CLI.

Parity target: ``utils/video_generation.py:__main__`` (reference
``:297-378``): load a DINO ViT checkpoint, extract frames from a video
(or read a folder of frames), render thresholded CLS-attention heatmaps,
and assemble an output video. The reference's URL fallback to Facebook
DINO weights is replaced by an explicit error — this environment has no
egress, and silent random weights (the reference's final fallback) make
for confusing output.

Usage:
    python -m dinomc_tpu.cli.attention_video \
        --input_path clip.mp4 --output_path runs/attn.mp4 \
        --pretrained_weights model_weights/dino_mc/vit_mc_checkpoint300.pth
"""

from __future__ import annotations

import argparse
import os


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("attention_video (TPU)", add_help=False)
    p.add_argument("--arch", default="vit_small",
                   choices=["vit_tiny", "vit_small", "vit_base"])
    p.add_argument("--patch_size", default=8, type=int)
    p.add_argument("--pretrained_weights", default="", type=str,
                   help="torch .pth checkpoint or orbax directory; empty "
                        "runs with random weights (reference parity)")
    p.add_argument("--checkpoint_key", default="teacher", type=str,
                   help='"teacher" / "student" / "none"')
    p.add_argument("--input_path", required=True, type=str,
                   help="video file or folder of frame images")
    p.add_argument("--output_path", default="attention.mp4", type=str)
    p.add_argument("--threshold", default=0.6, type=float,
                   help="keep the smallest patch set holding this fraction "
                        "of each head's attention mass; <=0 disables")
    p.add_argument("--image_size", default=224, type=int,
                   help="frames are resized to this square size (the "
                        "reference's --resize); rounded to a multiple of "
                        "the patch size")
    p.add_argument("--fps", default=30, type=int)
    p.add_argument("--head", default=None, type=int,
                   help="render one head instead of the mean over heads")
    p.add_argument("--batch_size", default=8, type=int)
    return p


def run(args) -> str:
    import jax

    from dinomc_tpu.cli.common import load_pretrained_backbone, resolve_platform
    from dinomc_tpu.models.vit import VIT_FACTORIES, init_vit
    from dinomc_tpu.utils.video_generation import VideoGenerator

    resolve_platform()
    size = max(args.patch_size, args.image_size // args.patch_size * args.patch_size)
    cfg = VIT_FACTORIES[args.arch](patch_size=args.patch_size, img_size=size)
    if args.pretrained_weights:
        params, _ = load_pretrained_backbone(
            args.pretrained_weights, args.arch, args.checkpoint_key
        )
    else:
        print("no --pretrained_weights given; using RANDOM weights")
        params = init_vit(jax.random.PRNGKey(0), cfg)

    gen = VideoGenerator(
        params,
        cfg,
        image_size=size,
        threshold=args.threshold if args.threshold > 0 else None,
        batch_size=args.batch_size,
    )
    out_dir = os.path.dirname(os.path.abspath(args.output_path))
    os.makedirs(out_dir, exist_ok=True)
    out = gen.generate(args.input_path, args.output_path, fps=args.fps,
                       head=args.head)
    print(f"wrote {out}")
    return out


def main():
    args = argparse.ArgumentParser(
        "attention_video", parents=[get_args_parser()]
    ).parse_args()
    run(args)


if __name__ == "__main__":
    main()
