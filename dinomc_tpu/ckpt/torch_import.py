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
