"""Import reference PyTorch checkpoints into the JAX param trees.

Parity target: ``load_pretrained_weights`` (``utils/utils.py:75-119``) —
select a checkpoint key (``'teacher'`` for DINO-MC checkpoints,
``networks.py:196-203``; None for Facebook DINO/DeiT checkpoints), strip
``module.`` / ``backbone.`` prefixes, then load laxly (missing/extra keys
tolerated). This lets the reference's shipped teacher weights
(``model_weights/dino_mc/vit_mc_checkpoint300.pth``) seed segmentation /
eval parity runs in this framework.

torch is used only on the host for deserialization; everything returned is
numpy, ready for ``jnp.asarray``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def load_torch_state_dict(
    path: str, checkpoint_key: Optional[str] = "teacher"
) -> Dict[str, np.ndarray]:
    """Read a .pth file -> flat {name: np.ndarray} with prefixes stripped."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and checkpoint_key and checkpoint_key in ckpt:
        ckpt = ckpt[checkpoint_key]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    out = {}
    for k, v in ckpt.items():
        k = k.replace("module.", "").replace("backbone.", "")
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _stack(arrs):
    return np.stack(arrs, axis=0).astype(np.float32)


def vit_params_from_torch(
    sd: Dict[str, np.ndarray], depth: int = 12
) -> Dict[str, Any]:
    """Map a timm/DINO ViT state dict to our stacked-block param tree.

    Layout notes:
      * torch conv PatchEmbed weight (D, C, p, p) -> our patchify-matmul
        kernel (p*p*C, D) with (ph, pw, c) inner order;
      * torch Linear weight (out, in) -> our (in, out) kernels;
      * per-block tensors are stacked along a leading layer axis for the
        lax.scan forward (models/vit.py).
    """
    w = sd["patch_embed.proj.weight"]  # (D, C, p, p)
    D = w.shape[0]
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, D)  # (p*p*C, D)

    def lin_k(name, i):
        return sd[f"blocks.{i}.{name}.weight"].T  # (in, out)

    def lin_b(name, i):
        return sd[f"blocks.{i}.{name}.bias"]

    blocks = {
        "norm1": {
            "scale": _stack([sd[f"blocks.{i}.norm1.weight"] for i in range(depth)]),
            "bias": _stack([sd[f"blocks.{i}.norm1.bias"] for i in range(depth)]),
        },
        "attn": {
            "qkv": {
                "kernel": _stack([lin_k("attn.qkv", i) for i in range(depth)]),
                "bias": _stack([lin_b("attn.qkv", i) for i in range(depth)]),
            },
            "proj": {
                "kernel": _stack([lin_k("attn.proj", i) for i in range(depth)]),
                "bias": _stack([lin_b("attn.proj", i) for i in range(depth)]),
            },
        },
        "norm2": {
            "scale": _stack([sd[f"blocks.{i}.norm2.weight"] for i in range(depth)]),
            "bias": _stack([sd[f"blocks.{i}.norm2.bias"] for i in range(depth)]),
        },
        "mlp": {
            "fc1": {
                "kernel": _stack([lin_k("mlp.fc1", i) for i in range(depth)]),
                "bias": _stack([lin_b("mlp.fc1", i) for i in range(depth)]),
            },
            "fc2": {
                "kernel": _stack([lin_k("mlp.fc2", i) for i in range(depth)]),
                "bias": _stack([lin_b("mlp.fc2", i) for i in range(depth)]),
            },
        },
    }
    return {
        "patch_embed": {
            "kernel": kernel.astype(np.float32),
            "bias": sd["patch_embed.proj.bias"].astype(np.float32),
        },
        "cls_token": sd["cls_token"].astype(np.float32),
        "pos_embed": sd["pos_embed"].astype(np.float32),
        "blocks": blocks,
        "norm": {
            "scale": sd["norm.weight"].astype(np.float32),
            "bias": sd["norm.bias"].astype(np.float32),
        },
    }


def dino_head_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map the reference DINOHead state dict (``head.`` prefix already
    stripped if loading a full MultiCropWrapper dict) to our head tree.

    torch weight_norm stores ``last_layer.weight_g`` (out, 1) and
    ``last_layer.weight_v`` (out, in); ours is v (in, out), g (out,).
    """
    keys = [k for k in sd if k.startswith("mlp.") and k.endswith(".weight")]
    layer_ids = sorted({int(k.split(".")[1]) for k in keys})
    params: Dict[str, Any] = {}
    # torch Sequential indices include GELU modules; renumber densely.
    for new_i, i in enumerate(layer_ids):
        layer = {
            "kernel": sd[f"mlp.{i}.weight"].T.astype(np.float32),
            "bias": sd[f"mlp.{i}.bias"].astype(np.float32),
        }
        params[f"mlp_{new_i}"] = layer
    params["last_layer"] = {
        "v": sd["last_layer.weight_v"].T.astype(np.float32),
        "g": sd["last_layer.weight_g"].reshape(-1).astype(np.float32),
    }
    return params


def _conv_bn_from_torch(sd, conv_key: str, bn_key: str):
    """(params, state) for one conv+BN pair: torch OIHW -> HWIO kernel, BN
    weight/bias -> scale/bias, running stats -> state."""
    p = {
        "conv": {"kernel": sd[f"{conv_key}.weight"].transpose(2, 3, 1, 0).astype(np.float32)},
        "bn": {
            "scale": sd[f"{bn_key}.weight"].astype(np.float32),
            "bias": sd[f"{bn_key}.bias"].astype(np.float32),
        },
    }
    s = {
        "bn": {
            "mean": sd[f"{bn_key}.running_mean"].astype(np.float32),
            "var": sd[f"{bn_key}.running_var"].astype(np.float32),
        }
    }
    return p, s


def resnet_params_from_torch(
    sd: Dict[str, np.ndarray], stage_sizes=(3, 4, 6, 3)
) -> tuple:
    """Map a torchvision-format ResNet-50 / WRN-50-2 state dict (as saved by
    the reference's convnet DINO runs, ``main_dino_mc.py:223-229``) to our
    functional tree. Returns ``(params, state)`` — state carries the BN
    running stats. ``fc`` is included when present (MultiCropWrapper nulls
    it, ``utils/utils.py:623``)."""
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    params["stem"], state["stem"] = _conv_bn_from_torch(sd, "conv1", "bn1")
    for stage, blocks in enumerate(stage_sizes):
        sp, ss = [], []
        for b in range(blocks):
            pre = f"layer{stage + 1}.{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"], bs[f"conv{i}"] = _conv_bn_from_torch(
                    sd, f"{pre}.conv{i}", f"{pre}.bn{i}"
                )
            if f"{pre}.downsample.0.weight" in sd:
                bp["down"], bs["down"] = _conv_bn_from_torch(
                    sd, f"{pre}.downsample.0", f"{pre}.downsample.1"
                )
            sp.append(bp)
            ss.append(bs)
        params[f"layer{stage + 1}"] = sp
        state[f"layer{stage + 1}"] = ss
    if "fc.weight" in sd:
        params["fc"] = {
            "kernel": sd["fc.weight"].T.astype(np.float32),
            "bias": sd["fc.bias"].astype(np.float32),
        }
    return params, state


def _ln_from_torch(sd, key):
    return {
        "scale": sd[f"{key}.weight"].astype(np.float32),
        "bias": sd[f"{key}.bias"].astype(np.float32),
    }


def _lin_from_torch(sd, key):
    return {
        "kernel": sd[f"{key}.weight"].T.astype(np.float32),
        "bias": sd[f"{key}.bias"].astype(np.float32),
    }


def swin_params_from_torch(
    sd: Dict[str, np.ndarray], depths=(2, 2, 6, 2)
) -> Dict[str, Any]:
    """Map a torchvision-format ``swin_t`` state dict (the reference's Swin
    DINO encoder, ``main_dino_mc.py:226-229``) to our functional tree
    (models/swin.py). torchvision layout: ``features.0`` = patch conv+LN,
    ``features.{2s+1}`` = stage-s blocks, ``features.{2s+2}`` = patch merge;
    block MLP linears at ``mlp.0`` / ``mlp.3``. The relative-position index
    tables are recomputed on our side (identical formula), so only the bias
    table imports."""
    w = sd["features.0.0.weight"]  # (D, 3, p, p)
    D = w.shape[0]
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": w.transpose(2, 3, 1, 0).reshape(-1, D).astype(np.float32),
            "bias": sd["features.0.0.bias"].astype(np.float32),
            "norm": _ln_from_torch(sd, "features.0.2"),
        },
        "stages": [],
    }
    for s, depth in enumerate(depths):
        blocks = []
        for b in range(depth):
            pre = f"features.{2 * s + 1}.{b}"
            blocks.append(
                {
                    "norm1": _ln_from_torch(sd, f"{pre}.norm1"),
                    "qkv": _lin_from_torch(sd, f"{pre}.attn.qkv"),
                    "proj": _lin_from_torch(sd, f"{pre}.attn.proj"),
                    "rel_bias": sd[
                        f"{pre}.attn.relative_position_bias_table"
                    ].astype(np.float32),
                    "norm2": _ln_from_torch(sd, f"{pre}.norm2"),
                    "fc1": _lin_from_torch(sd, f"{pre}.mlp.0"),
                    "fc2": _lin_from_torch(sd, f"{pre}.mlp.3"),
                }
            )
        stage: Dict[str, Any] = {"blocks": blocks}
        if s < len(depths) - 1:
            mpre = f"features.{2 * s + 2}"
            stage["merge"] = {
                "norm": _ln_from_torch(sd, f"{mpre}.norm"),
                "reduce": {
                    "kernel": sd[f"{mpre}.reduction.weight"].T.astype(np.float32)
                },
            }
        params["stages"].append(stage)
    params["norm"] = _ln_from_torch(sd, "norm")
    return params


def load_convnet_backbone(
    path: str, checkpoint_key: Optional[str] = "teacher"
) -> tuple:
    """One-call import: .pth -> (ResNet/WRN param tree, BN-state tree)."""
    sd = load_torch_state_dict(path, checkpoint_key)
    return resnet_params_from_torch(sd)


def load_backbone_for_arch(
    path: str, arch: str, checkpoint_key: Optional[str] = "teacher"
) -> tuple:
    """Arch-dispatching import (the reference's ``load_pretrained_weights``
    is arch-agnostic via ``load_state_dict(strict=False)``; our functional
    trees need explicit mappings). Returns ``(params, bn_state_or_None)``."""
    if arch.startswith("vit") or arch.startswith("deit"):
        return load_dino_backbone(path, checkpoint_key), None
    if arch in ("resnet50", "wide_resnet50_2"):
        return load_convnet_backbone(path, checkpoint_key)
    if arch in ("swin_t", "swin_tiny"):
        sd = load_torch_state_dict(path, checkpoint_key)
        return swin_params_from_torch(sd), None
    raise ValueError(
        f"no torch importer for arch '{arch}' (supported: vit*/deit*, "
        "resnet50, wide_resnet50_2, swin_t); train from our own orbax "
        "checkpoints instead"
    )


def load_linear_probe_weights(path: str):
    """Import a torch linear-classifier checkpoint as ``(w, b)`` numpy arrays
    in this framework's probe convention (``logits = feats @ w + b``).

    Parity target: ``load_pretrained_linear_weights``
    (``utils/utils.py:125-142``) — reads ``ckpt['state_dict']``, strips
    ``module.`` prefixes, and loads the single ``nn.Linear``. torch stores
    the weight as (out, in); transposed here for ``eval/linear_probe``.
    """
    sd = load_torch_state_dict(path, checkpoint_key="state_dict")
    wk = next(k for k in sd if k.endswith("weight"))
    bk = next(k for k in sd if k.endswith("bias"))
    return sd[wk].T.astype(np.float32), sd[bk].astype(np.float32)


def cls_params_from_torch(sd: Dict[str, np.ndarray], arch: str) -> tuple:
    """Map a reference fine-tuned classification state dict (full model:
    backbone + classifier, ``main_eurosat.py:144-154`` /
    ``main_bigearthnet.py:183-202``) to our cls trees.

    The classifier lives at ``head`` on ViT/Swin/XCiT
    (``vision_transformer.py:159``) and ``fc`` on torchvision convnets.
    Returns ``(params {'backbone', 'fc'}, bn_state)``.
    """
    if arch in ("resnet50", "wide_resnet50_2"):
        bp, bs = resnet_params_from_torch(sd)
        fc = bp.pop("fc")
        return {"backbone": bp, "fc": fc}, bs
    if arch.startswith("vit") or arch.startswith("deit"):
        depth = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
        backbone = vit_params_from_torch(sd, depth)
    elif arch in ("swin_t", "swin_tiny"):
        backbone = swin_params_from_torch(sd)
    else:
        raise ValueError(f"no cls importer for arch '{arch}'")
    fc = {
        "kernel": sd["head.weight"].T.astype(np.float32),
        "bias": sd["head.bias"].astype(np.float32),
    }
    return {"backbone": backbone, "fc": fc}, {}


def load_cls_checkpoint(path: str, arch: str) -> tuple:
    """Read a reference fine-tuned classification checkpoint file
    (``{'state_dict': full model, 'epoch', 'best_acc', ...}``) ->
    ``(params, bn_state)`` for ``train/cls_trainer``."""
    sd = load_torch_state_dict(path, checkpoint_key="state_dict")
    return cls_params_from_torch(sd, arch)


def upernet_params_from_torch(sd: Dict[str, np.ndarray]) -> tuple:
    """Map a reference seg checkpoint (mmseg ``UPerNetDinoMC`` /
    ``UPerNetDinoDeiT`` state dict, ``models/networks.py:244-317``) to our
    native UPerNet trees (``models/upernet.init_upernet`` layout).

    mmseg naming (ConvModule = bias-free conv + BN):
      * ``backbone.vit.*``                    -> ``backbone`` (ViT tree)
      * ``decode_head.psp_modules.{i}.1``     -> ``psp[i]`` (``.0`` is the pool)
      * ``decode_head.bottleneck``            -> ``psp_bottleneck``
      * ``decode_head.lateral_convs.{i}``     -> ``lateral[i]``
      * ``decode_head.fpn_convs.{i}``         -> ``fpn[i]``
      * ``decode_head.fpn_bottleneck``        -> ``fusion``
      * ``decode_head.conv_seg``              -> ``classifier``
      * ``auxiliary_head.convs.0`` / ``conv_seg`` -> ``aux.conv`` / ``aux.classifier``
      * optional ``neck.{lateral,fpn}_convs.{i}.conv`` -> ``neck[i].{lateral,out}``

    Returns ``(params, bn_state)``.
    """
    vit_sd = {k[len("backbone.vit."):]: v for k, v in sd.items()
              if k.startswith("backbone.vit.")}
    depth = 1 + max(
        int(k.split(".")[1]) for k in vit_sd if k.startswith("blocks.")
    )
    params: Dict[str, Any] = {"backbone": vit_params_from_torch(vit_sd, depth)}
    state: Dict[str, Any] = {}

    def cbr(prefix):
        return _conv_bn_from_torch(sd, prefix + ".conv", prefix + ".bn")

    def conv(prefix):
        p = {"kernel": sd[prefix + ".weight"].transpose(2, 3, 1, 0).astype(np.float32)}
        if prefix + ".bias" in sd:
            p["bias"] = sd[prefix + ".bias"].astype(np.float32)
        return p

    if any(k.startswith("neck.") for k in sd):
        n = 1 + max(int(k.split(".")[2]) for k in sd
                    if k.startswith("neck.lateral_convs."))
        params["neck"] = [
            {"lateral": conv(f"neck.lateral_convs.{i}.conv"),
             "out": conv(f"neck.fpn_convs.{i}.conv")}
            for i in range(n)
        ]
        state["neck"] = [{} for _ in range(n)]

    n_psp = len({k.split(".")[2] for k in sd
                 if k.startswith("decode_head.psp_modules.")})
    pairs = [cbr(f"decode_head.psp_modules.{i}.1") for i in range(n_psp)]
    params["psp"] = [p for p, _ in pairs]
    state["psp"] = [s for _, s in pairs]
    params["psp_bottleneck"], state["psp_bottleneck"] = cbr("decode_head.bottleneck")

    n_lat = len({k.split(".")[2] for k in sd
                 if k.startswith("decode_head.lateral_convs.")})
    pairs = [cbr(f"decode_head.lateral_convs.{i}") for i in range(n_lat)]
    params["lateral"] = [p for p, _ in pairs]
    state["lateral"] = [s for _, s in pairs]
    pairs = [cbr(f"decode_head.fpn_convs.{i}") for i in range(n_lat)]
    params["fpn"] = [p for p, _ in pairs]
    state["fpn"] = [s for _, s in pairs]

    params["fusion"], state["fusion"] = cbr("decode_head.fpn_bottleneck")
    params["classifier"] = conv("decode_head.conv_seg")

    aux_p, aux_s = cbr("auxiliary_head.convs.0")
    params["aux"] = {"conv": aux_p, "classifier": conv("auxiliary_head.conv_seg")}
    state["aux"] = {"conv": aux_s}
    return params, state


def load_upernet_checkpoint(path: str) -> tuple:
    """Read a reference seg checkpoint file -> (params, bn_state).

    Accepts the seg trainers' ``{'model_state_dict': ...}`` dicts
    (``train_dino_mc_seg.py:190-197``) as well as bare state dicts.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("model_state_dict", "state_dict"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    sd = {
        k.replace("module.", ""): (
            v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        )
        for k, v in ckpt.items()
    }
    return upernet_params_from_torch(sd)


def load_dino_backbone(
    path: str,
    checkpoint_key: Optional[str] = "teacher",
    depth: int = 12,
) -> Dict[str, Any]:
    """One-call import: .pth -> ViT backbone param tree (teacher weights).

    Handles both MultiCropWrapper checkpoints (keys like
    ``backbone.blocks...`` + ``head...``) and bare ViT state dicts.
    """
    sd = load_torch_state_dict(path, checkpoint_key)
    return vit_params_from_torch(sd, depth=depth)
