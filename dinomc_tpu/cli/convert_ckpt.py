"""Convert orbax checkpoints to reference-format PyTorch ``.pth`` files.

The outbound half of checkpoint interop (``ckpt/torch_import.py`` is the
inbound half): anything pretrained here can be handed back to the
reference repo — its ``load_pretrained_weights`` (``utils/utils.py:75-119``)
reads the exported file unchanged, so a TPU-pretrained encoder can run
through the reference's eval/visualization scripts.

Usage:
    # from a training run's checkpoint manager directory (latest step)
    python -m dinomc_tpu.cli.convert_ckpt --ckpt runs/mc/checkpoints \
        --arch vit_small --out vit_mc_tpu.pth

    # a specific step, backbone-only file
    python -m dinomc_tpu.cli.convert_ckpt --ckpt runs/mc/checkpoints \
        --step 3000 --what backbone --source teacher --out teacher.pth
"""

from __future__ import annotations

import argparse
import os


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("convert_ckpt (orbax -> torch)", add_help=False)
    p.add_argument("--ckpt", required=True, type=str,
                   help="orbax CheckpointManager directory, one step's "
                        "directory, or a bare save_pytree directory")
    p.add_argument("--step", default=None, type=int,
                   help="step to export (default: latest)")
    p.add_argument("--arch", default="vit_small", type=str,
                   help="encoder architecture the tree belongs to")
    p.add_argument("--what", default="auto",
                   choices=["auto", "dino", "seg", "cls", "backbone"],
                   help="'dino': full student+teacher pretrain checkpoint "
                        "(reference main_dino_mc.py layout); 'seg': UPerNet "
                        "seg checkpoint (reference train_dino_mc_seg.py "
                        "layout); 'cls': fine-tuned classifier (reference "
                        "main_eurosat.py layout); 'backbone': minimal "
                        "{key: backbone} file; 'auto' picks from the tree")
    p.add_argument("--source", default="teacher", choices=["teacher", "student"],
                   help="which tower feeds a --what backbone export")
    p.add_argument("--checkpoint_key", default="teacher", type=str,
                   help="top-level key wrapping a --what backbone export "
                        "('none' for a bare state dict)")
    p.add_argument("--out", required=True, type=str)
    return p


def _resolve_step_dir(root: str, step) -> str:
    """CheckpointManager dir -> the chosen step's pytree directory."""
    steps = sorted(int(d) for d in os.listdir(root) if d.isdigit())
    if not steps:
        return root  # already a pytree directory (save_pytree output)
    chosen = int(step) if step is not None else steps[-1]
    if chosen not in steps:
        raise FileNotFoundError(f"step {chosen} not in {root} (have {steps})")
    d = os.path.join(root, str(chosen))
    # CheckpointManager nests the pytree under the item name ('default').
    return os.path.join(d, "default") if os.path.isdir(os.path.join(d, "default")) else d


def _field(tree, name):
    """flax-struct attribute or template-free-restored dict key."""
    return getattr(tree, name) if hasattr(tree, name) else tree[name]


def run(args) -> str:
    from dinomc_tpu.ckpt.orbax_io import restore_pytree
    from dinomc_tpu.ckpt.torch_export import (
        export_backbone,
        export_dino_checkpoint,
    )

    path = args.ckpt
    if os.path.isdir(path):
        path = _resolve_step_dir(path, args.step)
    tree = restore_pytree(path)

    out_dir = os.path.dirname(os.path.abspath(args.out))
    os.makedirs(out_dir, exist_ok=True)

    def has(k):
        return hasattr(tree, k) or (isinstance(tree, dict) and k in tree)

    is_train_state = all(has(k) for k in ("student", "teacher", "center"))
    is_model_state = all(has(k) for k in ("params", "bn_state"))
    model_params = _field(tree, "params") if is_model_state else {}
    is_cls_state = is_model_state and "fc" in model_params
    is_seg_state = is_model_state and "psp" in model_params
    what = args.what
    if what == "auto":
        what = ("dino" if is_train_state else "cls" if is_cls_state
                else "seg" if is_seg_state else "backbone")

    if what == "cls":
        from dinomc_tpu.ckpt.torch_export import export_cls_checkpoint

        if not is_cls_state:
            raise ValueError(f"{path} is not a classification train state")
        out = export_cls_checkpoint(
            args.out,
            args.arch,
            model_params,
            _field(tree, "bn_state") or None,
            epoch=int(_field(tree, "step")),
        )
        print(f"wrote {out}")
        return out

    if what == "seg":
        from dinomc_tpu.ckpt.torch_export import export_seg_checkpoint

        if not is_seg_state:
            raise ValueError(f"{path} is not a seg train state")
        out = export_seg_checkpoint(
            args.out,
            _field(tree, "params"),
            _field(tree, "bn_state"),
            epoch=int(_field(tree, "step")),
        )
        print(f"wrote {out}")
        return out

    if what == "dino":
        if not is_train_state:
            raise ValueError(
                f"{path} is not a DINO train state; use --what backbone "
                "for bare param trees"
            )
        out = export_dino_checkpoint(
            args.out,
            args.arch,
            student=_field(tree, "student"),
            teacher=_field(tree, "teacher"),
            student_state=_field(tree, "student_state") or None,
            teacher_state=_field(tree, "teacher_state") or None,
            epoch=int(_field(tree, "step")),
            center=_field(tree, "center"),
        )
    else:
        if is_train_state:
            params = _field(tree, args.source)["backbone"]
            bn = _field(tree, f"{args.source}_state") or None
        elif is_model_state:
            params = model_params["backbone"]
            # convnet cls states carry backbone BN stats; seg backbones are
            # ViT (their bn_state is the decoder's and is ignored for vit*)
            bn = _field(tree, "bn_state") or None
        else:
            params = tree.get("backbone", tree) if isinstance(tree, dict) else tree
            bn = None
        key = None if args.checkpoint_key in ("", "none") else args.checkpoint_key
        out = export_backbone(args.out, args.arch, params, bn, checkpoint_key=key)
    print(f"wrote {out}")
    return out


def main():
    args = argparse.ArgumentParser(
        "convert_ckpt", parents=[get_args_parser()]
    ).parse_args()
    run(args)


if __name__ == "__main__":
    main()
