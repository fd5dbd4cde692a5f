"""Export JAX param trees as reference-format PyTorch checkpoints.

The exact inverse of ``ckpt/torch_import.py``: checkpoints pretrained in
this framework become ``.pth`` files that the reference's
``load_pretrained_weights`` (``utils/utils.py:75-119``) and its downstream
scripts (``models/networks.py:196-203``, ``main_eurosat.py:81``) consume
unchanged — train on TPU, evaluate/visualize with the PyTorch repo.

``export_dino_checkpoint`` reproduces the reference pretrain layout
(``main_dino_mc.py:333-343``): ``student`` under DDP's ``module.`` prefix,
``teacher`` as a bare MultiCropWrapper (``backbone.`` / ``head.`` keys),
plus ``epoch`` and the DINO-loss ``center`` buffer. The optimizer state is
deliberately NOT exported — Adam moments over torch's (out, in) layout
would not map onto the reference's param ordering, and the reference only
needs weights for every published protocol.

torch is used only for serialization on the host; inputs are JAX/numpy
trees.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def vit_state_dict(params: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    """Our stacked-block ViT tree -> timm/DINO flat state dict.

    Inverse of ``torch_import.vit_params_from_torch``: the patchify-matmul
    kernel (p*p*3, D) in (ph, pw, c) inner order becomes the conv weight
    (D, 3, p, p); our (in, out) linear kernels transpose to torch's
    (out, in); the leading lax.scan layer axis unstacks into
    ``blocks.{i}.*`` entries.
    """
    sd: Dict[str, np.ndarray] = {}
    kernel = _np(params["patch_embed"]["kernel"])  # (p*p*3, D)
    d = kernel.shape[1]
    p = int(round((kernel.shape[0] // 3) ** 0.5))
    assert p * p * 3 == kernel.shape[0], f"non-RGB patch kernel {kernel.shape}"
    sd[prefix + "patch_embed.proj.weight"] = (
        kernel.reshape(p, p, 3, d).transpose(3, 2, 0, 1).copy()
    )
    sd[prefix + "patch_embed.proj.bias"] = _np(params["patch_embed"]["bias"])
    sd[prefix + "cls_token"] = _np(params["cls_token"])
    sd[prefix + "pos_embed"] = _np(params["pos_embed"])

    blocks = params["blocks"]
    depth = _np(blocks["norm1"]["scale"]).shape[0]
    for i in range(depth):
        pre = f"{prefix}blocks.{i}."
        for ln in ("norm1", "norm2"):
            sd[pre + ln + ".weight"] = _np(blocks[ln]["scale"][i])
            sd[pre + ln + ".bias"] = _np(blocks[ln]["bias"][i])
        for ours, theirs in (
            (blocks["attn"]["qkv"], "attn.qkv"),
            (blocks["attn"]["proj"], "attn.proj"),
            (blocks["mlp"]["fc1"], "mlp.fc1"),
            (blocks["mlp"]["fc2"], "mlp.fc2"),
        ):
            sd[pre + theirs + ".weight"] = _np(ours["kernel"][i]).T.copy()
            sd[pre + theirs + ".bias"] = _np(ours["bias"][i])
    sd[prefix + "norm.weight"] = _np(params["norm"]["scale"])
    sd[prefix + "norm.bias"] = _np(params["norm"]["bias"])
    return sd


def dino_head_state_dict(
    params: Dict[str, Any], prefix: str = ""
) -> Dict[str, np.ndarray]:
    """Our DINOHead tree -> reference ``DINOHead`` state dict.

    The reference's no-BN MLP is ``nn.Sequential(Linear, GELU, Linear,
    GELU, Linear)`` (``vision_transformer.py:266-276``), so dense layer j
    sits at Sequential index 2*j; weight-norm splits into ``weight_g``
    (out, 1) / ``weight_v`` (out, in).
    """
    sd: Dict[str, np.ndarray] = {}
    n = sum(1 for k in params if k.startswith("mlp_"))
    assert not any("bn_scale" in params[f"mlp_{j}"] for j in range(n)), (
        "BN-in-head exports are not supported: torch Sequential indices "
        "shift with BatchNorm modules (use_bn_in_head=False, the reference "
        "default, for exportable runs)"
    )
    for j in range(n):
        layer = params[f"mlp_{j}"]
        sd[f"{prefix}mlp.{2 * j}.weight"] = _np(layer["kernel"]).T.copy()
        sd[f"{prefix}mlp.{2 * j}.bias"] = _np(layer["bias"])
    sd[prefix + "last_layer.weight_g"] = _np(
        params["last_layer"]["g"]
    ).reshape(-1, 1)
    sd[prefix + "last_layer.weight_v"] = _np(params["last_layer"]["v"]).T.copy()
    return sd


def _conv_bn_to_torch(sd, p, s, conv_key: str, bn_key: str) -> None:
    sd[conv_key + ".weight"] = _np(p["conv"]["kernel"]).transpose(3, 2, 0, 1).copy()
    sd[bn_key + ".weight"] = _np(p["bn"]["scale"])
    sd[bn_key + ".bias"] = _np(p["bn"]["bias"])
    sd[bn_key + ".running_mean"] = _np(s["bn"]["mean"])
    sd[bn_key + ".running_var"] = _np(s["bn"]["var"])
    sd[bn_key + ".num_batches_tracked"] = np.zeros((), np.int64)


def resnet_state_dict(
    params: Dict[str, Any], state: Dict[str, Any], prefix: str = ""
) -> Dict[str, np.ndarray]:
    """Our functional ResNet-50/WRN (params, BN-state) -> torchvision keys."""
    sd: Dict[str, np.ndarray] = {}
    _conv_bn_to_torch(sd, params["stem"], state["stem"],
                      prefix + "conv1", prefix + "bn1")
    for stage in range(1, 5):
        name = f"layer{stage}"
        for b, (bp, bs) in enumerate(zip(params[name], state[name])):
            pre = f"{prefix}{name}.{b}"
            for i in (1, 2, 3):
                _conv_bn_to_torch(sd, bp[f"conv{i}"], bs[f"conv{i}"],
                                  f"{pre}.conv{i}", f"{pre}.bn{i}")
            if "down" in bp:
                _conv_bn_to_torch(sd, bp["down"], bs["down"],
                                  f"{pre}.downsample.0", f"{pre}.downsample.1")
    if "fc" in params:
        sd[prefix + "fc.weight"] = _np(params["fc"]["kernel"]).T.copy()
        sd[prefix + "fc.bias"] = _np(params["fc"]["bias"])
    return sd


def _ln_to_torch(sd, p, key: str) -> None:
    sd[key + ".weight"] = _np(p["scale"])
    sd[key + ".bias"] = _np(p["bias"])


def _lin_to_torch(sd, p, key: str) -> None:
    sd[key + ".weight"] = _np(p["kernel"]).T.copy()
    if "bias" in p:
        sd[key + ".bias"] = _np(p["bias"])


def swin_state_dict(params: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    """Our Swin-T tree -> torchvision ``swin_t`` keys (inverse of
    ``swin_params_from_torch``; the ``relative_position_index`` buffers are
    derived tensors torchvision recomputes, and the reference loads with
    ``strict=False``, so they are not emitted)."""
    sd: Dict[str, np.ndarray] = {}
    pe = params["patch_embed"]
    kernel = _np(pe["kernel"])  # (p*p*3, D)
    d = kernel.shape[1]
    p = int(round((kernel.shape[0] // 3) ** 0.5))
    sd[prefix + "features.0.0.weight"] = (
        kernel.reshape(p, p, 3, d).transpose(3, 2, 0, 1).copy()
    )
    sd[prefix + "features.0.0.bias"] = _np(pe["bias"])
    _ln_to_torch(sd, pe["norm"], prefix + "features.0.2")
    for s, stage in enumerate(params["stages"]):
        for b, blk in enumerate(stage["blocks"]):
            pre = f"{prefix}features.{2 * s + 1}.{b}"
            _ln_to_torch(sd, blk["norm1"], pre + ".norm1")
            _lin_to_torch(sd, blk["qkv"], pre + ".attn.qkv")
            _lin_to_torch(sd, blk["proj"], pre + ".attn.proj")
            sd[pre + ".attn.relative_position_bias_table"] = _np(blk["rel_bias"])
            _ln_to_torch(sd, blk["norm2"], pre + ".norm2")
            _lin_to_torch(sd, blk["fc1"], pre + ".mlp.0")
            _lin_to_torch(sd, blk["fc2"], pre + ".mlp.3")
        if "merge" in stage:
            mpre = f"{prefix}features.{2 * s + 2}"
            _ln_to_torch(sd, stage["merge"]["norm"], mpre + ".norm")
            _lin_to_torch(sd, stage["merge"]["reduce"], mpre + ".reduction")
    _ln_to_torch(sd, params["norm"], prefix + "norm")
    return sd


def cls_state_dict(
    arch: str,
    params: Dict[str, Any],
    bn_state: Optional[Dict[str, Any]] = None,
) -> Dict[str, np.ndarray]:
    """Our cls trees (``{'backbone', 'fc'}``) -> reference full-model state
    dict (classifier at ``head`` for ViT/Swin, ``fc`` for convnets)."""
    sd = backbone_state_dict_for_arch(arch, params["backbone"], bn_state)
    name = "fc" if arch in ("resnet50", "wide_resnet50_2") else "head"
    sd[name + ".weight"] = _np(params["fc"]["kernel"]).T.copy()
    sd[name + ".bias"] = _np(params["fc"]["bias"])
    return sd


def export_cls_checkpoint(
    path: str,
    arch: str,
    params: Dict[str, Any],
    bn_state: Optional[Dict[str, Any]] = None,
    epoch: int = 0,
    best_acc: Optional[float] = None,
) -> str:
    """Write a reference-format classification checkpoint
    (``main_eurosat.py:144-154`` layout minus torch optimizer/scheduler
    state): ``{'epoch', 'state_dict', 'best_acc'}``."""
    import torch

    save: Dict[str, Any] = {
        "epoch": int(epoch),
        "state_dict": _to_torch(cls_state_dict(arch, params, bn_state)),
    }
    if best_acc is not None:
        save["best_acc"] = float(best_acc)
    torch.save(save, path)
    return path


def upernet_state_dict(
    params: Dict[str, Any], state: Dict[str, Any]
) -> Dict[str, np.ndarray]:
    """Our native UPerNet (params, bn_state) -> mmseg ``UPerNetDinoMC``
    state-dict keys (inverse of ``torch_import.upernet_params_from_torch``;
    see that docstring for the key map)."""
    sd: Dict[str, np.ndarray] = {}
    sd.update(vit_state_dict(params["backbone"], "backbone.vit."))

    def cbr(prefix, p, s):
        _conv_bn_to_torch(sd, p, s, prefix + ".conv", prefix + ".bn")

    def conv(prefix, p):
        sd[prefix + ".weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1).copy()
        if "bias" in p:
            sd[prefix + ".bias"] = _np(p["bias"])

    if "neck" in params:
        for i, p in enumerate(params["neck"]):
            conv(f"neck.lateral_convs.{i}.conv", p["lateral"])
            conv(f"neck.fpn_convs.{i}.conv", p["out"])
    for i, (p, s) in enumerate(zip(params["psp"], state["psp"])):
        cbr(f"decode_head.psp_modules.{i}.1", p, s)
    cbr("decode_head.bottleneck", params["psp_bottleneck"], state["psp_bottleneck"])
    for i, (p, s) in enumerate(zip(params["lateral"], state["lateral"])):
        cbr(f"decode_head.lateral_convs.{i}", p, s)
    for i, (p, s) in enumerate(zip(params["fpn"], state["fpn"])):
        cbr(f"decode_head.fpn_convs.{i}", p, s)
    cbr("decode_head.fpn_bottleneck", params["fusion"], state["fusion"])
    conv("decode_head.conv_seg", params["classifier"])
    cbr("auxiliary_head.convs.0", params["aux"]["conv"], state["aux"]["conv"])
    conv("auxiliary_head.conv_seg", params["aux"]["classifier"])
    return sd


def export_seg_checkpoint(
    path: str,
    params: Dict[str, Any],
    state: Dict[str, Any],
    epoch: int = 0,
    best_miou: Optional[float] = None,
) -> str:
    """Write a reference-format seg checkpoint
    (``train_dino_mc_seg.py:190-197`` layout, minus the torch optimizer
    state, which cannot map across param layouts and which no reference
    eval path reads)."""
    import torch

    save: Dict[str, Any] = {
        "epoch": int(epoch),
        "model_state_dict": _to_torch(upernet_state_dict(params, state)),
    }
    if best_miou is not None:
        save["best_miou"] = float(best_miou)
    torch.save(save, path)
    return path


def backbone_state_dict_for_arch(
    arch: str,
    params: Dict[str, Any],
    bn_state: Optional[Dict[str, Any]] = None,
    prefix: str = "",
) -> Dict[str, np.ndarray]:
    """Arch dispatch, mirroring ``torch_import.load_backbone_for_arch``."""
    if arch.startswith("vit") or arch.startswith("deit"):
        return vit_state_dict(params, prefix)
    if arch in ("resnet50", "wide_resnet50_2"):
        assert bn_state is not None, "convnet export needs the BN-state tree"
        return resnet_state_dict(params, bn_state, prefix)
    if arch in ("swin_t", "swin_tiny"):
        return swin_state_dict(params, prefix)
    raise ValueError(
        f"no torch exporter for arch '{arch}' (supported: vit*/deit*, "
        "resnet50, wide_resnet50_2, swin_t)"
    )


def _to_torch(sd: Dict[str, np.ndarray]):
    import torch

    # copy=True: jax-backed arrays are non-writable, which torch rejects
    return {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}


def export_dino_checkpoint(
    path: str,
    arch: str,
    student: Dict[str, Any],
    teacher: Dict[str, Any],
    student_state: Optional[Dict[str, Any]] = None,
    teacher_state: Optional[Dict[str, Any]] = None,
    epoch: int = 0,
    center: Optional[Any] = None,
) -> str:
    """Write a reference-format DINO pretrain checkpoint.

    ``student``/``teacher`` are this framework's ``{'backbone', 'head'}``
    trees (``train/dino_trainer.DinoTrainState``); BN-state trees apply to
    convnet archs only. Layout parity: ``main_dino_mc.py:333-343`` —
    student saved through DDP (``module.`` prefix), teacher bare.
    """
    import torch

    def wrapper_sd(tree, bn, prefix):
        sd = backbone_state_dict_for_arch(
            arch, tree["backbone"], bn, prefix + "backbone."
        )
        sd.update(dino_head_state_dict(tree["head"], prefix + "head."))
        return sd

    save: Dict[str, Any] = {
        "student": _to_torch(wrapper_sd(student, student_state, "module.")),
        "teacher": _to_torch(wrapper_sd(teacher, teacher_state, "")),
        "epoch": int(epoch),
    }
    if center is not None:
        save["dino_loss"] = {"center": _to_torch({"center": _np(center).reshape(1, -1)})["center"]}
    torch.save(save, path)
    return path


def export_backbone(
    path: str,
    arch: str,
    params: Dict[str, Any],
    bn_state: Optional[Dict[str, Any]] = None,
    checkpoint_key: str = "teacher",
) -> str:
    """Write a minimal ``{checkpoint_key: {backbone state dict}}`` .pth —
    the shape every reference loader accepts (``utils/utils.py:96-104``)."""
    import torch

    sd = backbone_state_dict_for_arch(arch, params, bn_state)
    torch.save({checkpoint_key: _to_torch(sd)} if checkpoint_key else _to_torch(sd), path)
    return path
