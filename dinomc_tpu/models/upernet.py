"""Native UPerNet segmentation model on DINO ViT features.

Replaces the reference's mmseg-based stack (``models/networks.py:17-317``):
  * ``DinoSegBackbone`` — ViT token taps at ``out_indices=(3,5,7,11)``, CLS
    stripped, reshaped to (B, Hf, Wf, D), then a pseudo-pyramid
    [2·Hf, Hf, Hf/2, Hf/4] built by bilinear resize (reference
    ``DinoMCBackbone.forward``, ``networks.py:208-241``). Serves both the
    DINO-MC-checkpoint and Facebook-DINO(DeiT)-checkpoint variants (the two
    reference wrappers differ only in checkpoint loading, handled by
    ckpt/torch_import.py).
  * ``UPerHead`` — PSP module (pool scales (1,2,3,6), 512 channels) +
    FPN top-down fusion + final fuse conv + 1x1 classifier — native
    re-derivation of mmseg UPerHead with the reference's hyperparameters
    (``networks.py:275-285``).
  * ``FCNHead`` auxiliary — 1 conv (256ch) on pyramid level 2
    (``networks.py:297-308``).
  * Optional FPN neck (``networks.py:287-295``).
  * ``upernet_forward`` — EncoderDecoder 'whole' mode: decode at feature
    resolution, bilinear upsample to input size.

All BN layers use functional batch stats (see layers.py) — sharded-batch
training gives SyncBN semantics for free under SPMD.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dinomc_tpu.models import layers
from dinomc_tpu.models.vit import (
    ViTConfig,
    VIT_FACTORIES,
    init_vit,
    vit_intermediate_layers,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UPerNetConfig:
    num_classes: int = 8
    arch: str = "vit_small"
    patch_size: int = 8
    out_indices: Tuple[int, ...] = (3, 5, 7, 11)
    channels: int = 512
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    aux_channels: int = 256
    aux_in_index: int = 2
    dropout_rate: float = 0.1
    use_fpn_neck: bool = False
    aux_loss_weight: float = 0.4  # mmseg default for auxiliary FCNHead
    # Decoder compute dtype. The FLOP-heavy 512-channel PSP/FPN/fusion convs
    # run in this dtype (params stay f32; BN statistics and the final logits
    # are always f32). bf16 is MXU-native; set f32 for strict torch parity.
    compute_dtype: Any = jnp.bfloat16

    @property
    def embed_dim(self) -> int:
        return {
            "vit_tiny": 192, "vit_small": 384, "vit_base": 768, "vit_test": 32,
        }[self.arch]

    def vit_config(self, img_size: int = 224) -> ViTConfig:
        cfg = VIT_FACTORIES[self.arch](patch_size=self.patch_size, img_size=img_size)
        return dataclasses.replace(cfg, compute_dtype=self.compute_dtype)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_upernet(key: jax.Array, cfg: UPerNetConfig) -> Tuple[Params, Params]:
    """Returns (params, bn_state) including the ViT backbone."""
    n_levels = len(cfg.out_indices)
    D, C = cfg.embed_dim, cfg.channels
    keys = iter(jax.random.split(key, 64))

    params: Params = {"backbone": init_vit(next(keys), cfg.vit_config())}
    state: Params = {}

    # optional FPN neck: 1x1 lateral + 3x3 out conv per level, D -> D
    if cfg.use_fpn_neck:
        neck_p, neck_s = [], []
        for _ in range(n_levels):
            lat = layers.conv_init(next(keys), 1, D, D)
            out = layers.conv_init(next(keys), 3, D, D)
            neck_p.append({"lateral": lat, "out": out})
            neck_s.append({})
        params["neck"] = neck_p
        state["neck"] = neck_s

    # PSP over the coarsest level
    psp_p, psp_s = [], []
    for _ in cfg.pool_scales:
        p, s = layers.conv_bn_relu_init(next(keys), 1, D, C)
        psp_p.append(p)
        psp_s.append(s)
    params["psp"] = psp_p
    state["psp"] = psp_s
    params["psp_bottleneck"], state["psp_bottleneck"] = layers.conv_bn_relu_init(
        next(keys), 3, D + len(cfg.pool_scales) * C, C
    )

    # FPN laterals for levels 0..n-2 (last level comes from PSP bottleneck)
    lat_p, lat_s, fpn_p, fpn_s = [], [], [], []
    for _ in range(n_levels - 1):
        p, s = layers.conv_bn_relu_init(next(keys), 1, D, C)
        lat_p.append(p)
        lat_s.append(s)
        p, s = layers.conv_bn_relu_init(next(keys), 3, C, C)
        fpn_p.append(p)
        fpn_s.append(s)
    params["lateral"] = lat_p
    state["lateral"] = lat_s
    params["fpn"] = fpn_p
    state["fpn"] = fpn_s

    params["fusion"], state["fusion"] = layers.conv_bn_relu_init(
        next(keys), 3, n_levels * C, C
    )
    params["classifier"] = layers.conv_init(next(keys), 1, C, cfg.num_classes)

    # auxiliary FCNHead
    aux_conv_p, aux_conv_s = layers.conv_bn_relu_init(next(keys), 3, D, cfg.aux_channels)
    params["aux"] = {
        "conv": aux_conv_p,
        "classifier": layers.conv_init(next(keys), 1, cfg.aux_channels, cfg.num_classes),
    }
    state["aux"] = {"conv": aux_conv_s}
    return params, state


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def dino_pyramid(
    backbone_params: Params,
    x: jnp.ndarray,  # (B, H, W, 3)
    cfg: UPerNetConfig,
    mesh=None,
) -> Tuple[jnp.ndarray, ...]:
    """Token taps -> CLS-stripped feature maps -> strides {4,8,16,32} pyramid
    (reference ``DinoMCBackbone.forward``, ``networks.py:208-241``).

    ``mesh``: a ``core/mesh`` mesh whose ``seq`` axis is > 1 runs the
    backbone sequence-parallel (``models/vit.vit_forward_sp`` — ring
    attention over token shards; the idiomatic way to spread the 4097-token
    512 px input over chips)."""
    B, H, W, _ = x.shape
    vcfg = cfg.vit_config(img_size=H)
    # apply_norm=False: the reference backbone taps raw block outputs, NOT
    # final-LN'd (DinoMCBackbone runs blocks manually, networks.py:216-229 —
    # unlike get_intermediate_layers which norms each tap).
    if mesh is not None and mesh.shape.get("seq", 1) > 1:
        from dinomc_tpu.models.vit import vit_forward_sp

        # Also spread the batch over the data axis when it divides — without
        # this the data-axis chips would replicate the whole backbone.
        n_data = mesh.shape.get("data", 1)
        batch_axis = "data" if (n_data > 1 and B % n_data == 0) else None
        taps = vit_forward_sp(
            backbone_params, x, vcfg, mesh,
            out_indices=cfg.out_indices, apply_norm=False,
            batch_axis=batch_axis,
        )
    else:
        taps = vit_intermediate_layers(
            backbone_params, x, vcfg, out_indices=cfg.out_indices, apply_norm=False
        )  # (L, B, N+1, D)
    Hf, Wf = H // cfg.patch_size, W // cfg.patch_size
    # Taps come back f32; drop to the decoder compute dtype HERE so the
    # pyramid resizes and every decoder conv run MXU-native (bf16 halves
    # both the matmul cost and the HBM traffic of the 512-ch decoder).
    feats = [
        t[:, 1:, :].astype(cfg.compute_dtype).reshape(B, Hf, Wf, cfg.embed_dim)
        for t in taps
    ]
    sizes = [(2 * Hf, 2 * Wf), (Hf, Wf), (Hf // 2, Wf // 2), (Hf // 4, Wf // 4)]
    pyramid = []
    for f, hw in zip(feats, sizes):
        if f.shape[1:3] != hw:
            f = layers.resize_bilinear(f, hw)
        pyramid.append(f)
    return tuple(pyramid)


def _psp_forward(params, state, x, cfg: UPerNetConfig, train: bool):
    """PSP: adaptive pools at pool_scales + input, concat, 3x3 bottleneck."""
    hw = x.shape[1:3]
    outs = [x]
    new_psp_s = []
    for p, s, scale in zip(params["psp"], state["psp"], cfg.pool_scales):
        y = layers.adaptive_avg_pool(x, scale)
        y, ns = layers.conv_bn_relu_apply(p, s, y, train)
        outs.append(layers.resize_bilinear(y, hw))
        new_psp_s.append(ns)
    y = jnp.concatenate(outs, axis=-1)
    y, nbs = layers.conv_bn_relu_apply(
        params["psp_bottleneck"], state["psp_bottleneck"], y, train
    )
    return y, new_psp_s, nbs


def upernet_forward(
    params: Params,
    state: Params,
    x: jnp.ndarray,  # (B, H, W, 3)
    cfg: UPerNetConfig,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    with_aux: bool = False,
    mesh=None,
    stop_backbone_grad: bool = False,
):
    """'whole'-mode forward. Returns (logits (B, H, W, num_classes),
    new_bn_state[, aux_logits]). ``mesh`` with a ``seq`` axis > 1 runs the
    ViT backbone sequence-parallel (see ``dino_pyramid``).

    ``stop_backbone_grad``: cut the gradient at the pyramid features so the
    backward skips the entire ViT (decoder-only fine-tune — the reference's
    ``train_backbone=False`` run mode, ``train_dino_mc_seg.py:271``; the
    reference gets the same skip from ``requires_grad=False``). Measured on
    v5e at 224px/B=32 this takes the train step 162 -> ~100 ms."""
    B, H, W, _ = x.shape
    pyramid = dino_pyramid(params["backbone"], x, cfg, mesh=mesh)
    if stop_backbone_grad:
        pyramid = jax.tree_util.tree_map(jax.lax.stop_gradient, pyramid)
    new_state: Params = {}

    if cfg.use_fpn_neck:
        necked = []
        new_state["neck"] = []
        for f, p in zip(pyramid, params["neck"]):
            y = layers.conv_apply(p["lateral"], f)
            y = layers.conv_apply(p["out"], y)
            necked.append(y)
            new_state["neck"].append({})
        pyramid = tuple(necked)

    # PSP on the coarsest level
    psp_out, new_state["psp"], new_state["psp_bottleneck"] = _psp_forward(
        params, state, pyramid[-1], cfg, train
    )

    # laterals + top-down pathway
    laterals = []
    new_state["lateral"] = []
    for f, p, s in zip(pyramid[:-1], params["lateral"], state["lateral"]):
        y, ns = layers.conv_bn_relu_apply(p, s, f, train)
        laterals.append(y)
        new_state["lateral"].append(ns)
    laterals.append(psp_out)

    for i in range(len(laterals) - 1, 0, -1):
        up = layers.resize_bilinear(laterals[i], laterals[i - 1].shape[1:3])
        laterals[i - 1] = laterals[i - 1] + up

    # per-level fpn convs (top level passes through, mmseg semantics)
    fpn_outs = []
    new_state["fpn"] = []
    for i, (p, s) in enumerate(zip(params["fpn"], state["fpn"])):
        y, ns = layers.conv_bn_relu_apply(p, s, laterals[i], train)
        fpn_outs.append(y)
        new_state["fpn"].append(ns)
    fpn_outs.append(laterals[-1])

    # upsample all to the finest level, concat, fuse
    hw0 = fpn_outs[0].shape[1:3]
    fpn_outs = [fpn_outs[0]] + [layers.resize_bilinear(f, hw0) for f in fpn_outs[1:]]
    y = jnp.concatenate(fpn_outs, axis=-1)
    y, new_state["fusion"] = layers.conv_bn_relu_apply(
        params["fusion"], state["fusion"], y, train
    )
    if rng is not None:
        rng, rd = jax.random.split(rng)
        y = layers.dropout(rd, y, cfg.dropout_rate, train)
    logits = layers.conv_apply(params["classifier"], y)
    logits = layers.resize_bilinear(logits.astype(jnp.float32), (H, W))

    if not with_aux:
        new_state["aux"] = state["aux"]
        return logits, new_state

    # auxiliary FCNHead on pyramid level aux_in_index
    aux_f = pyramid[cfg.aux_in_index]
    ay, aux_conv_s = layers.conv_bn_relu_apply(
        params["aux"]["conv"], state["aux"]["conv"], aux_f, train
    )
    if rng is not None:
        rng, ra = jax.random.split(rng)
        ay = layers.dropout(ra, ay, cfg.dropout_rate, train)
    aux_logits = layers.conv_apply(params["aux"]["classifier"], ay)
    aux_logits = layers.resize_bilinear(aux_logits.astype(jnp.float32), (H, W))
    new_state["aux"] = {"conv": aux_conv_s}
    return logits, new_state, aux_logits
