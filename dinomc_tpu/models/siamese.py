"""Siamese change-detection model (OSCD).

Parity target: the reference's ``SiamSegment`` (``main_oscd.py:28-104``)
wrapping the missing-upstream ``models.segmentation.get_segmentation_model``
(SeCo semantics reconstructed per SURVEY.md §2.7): a shared (frozen)
ResNet/WRN encoder runs both timestamps; per-level feature differences
|f_t1 - f_t2| at ``feature_indices=(0,4,5,6,7)`` with channels
``(64, 256, 512, 1024, 2048)`` (``main_oscd.py:167-168``) feed an FPN-style
decoder that fuses top-down to a 1-channel change logit map at input
resolution.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from dinomc_tpu.models import layers
from dinomc_tpu.models import resnet as rn

Params = Any

FEATURE_CHANNELS = (64, 256, 512, 1024, 2048)


@dataclasses.dataclass(frozen=True)
class SiameseConfig:
    arch: str = "resnet50"  # resnet50 | wide_resnet50_2
    decoder_channels: int = 128
    freeze_encoder: bool = True  # reference trains decoder only (:100-104)

    def rn_cfg(self) -> rn.ResNetConfig:
        return rn.RESNET_FACTORIES[self.arch]()


def init_siamese(key: jax.Array, cfg: SiameseConfig) -> Tuple[Params, Params]:
    keys = iter(jax.random.split(key, 32))
    enc_p, enc_s = rn.init_resnet(next(keys), cfg.rn_cfg())
    C = cfg.decoder_channels
    laterals = [
        layers.conv_init(next(keys), 1, c, C) for c in FEATURE_CHANNELS
    ]
    params = {
        "encoder": enc_p,
        "lateral": laterals,
        "smooth": layers.conv_init(next(keys), 3, C, C),
        "classifier": layers.conv_init(next(keys), 3, C, 1),
    }
    return params, {"encoder": enc_s}


def siamese_forward(
    params: Params,
    state: Params,
    x1: jnp.ndarray,  # (B, H, W, 3) timestamp 1
    x2: jnp.ndarray,  # (B, H, W, 3) timestamp 2
    cfg: SiameseConfig,
    train: bool = False,
) -> Tuple[jnp.ndarray, Params]:
    """Change logits (B, H, W) float32 + new BN state.

    The encoder runs in eval mode when frozen (running BN stats), matching
    the reference's frozen-encoder training.
    """
    B, H, W, _ = x1.shape
    enc_train = train and not cfg.freeze_encoder
    f1, _, s1 = rn.resnet_features(params["encoder"], state["encoder"], x1, cfg.rn_cfg(), enc_train)
    f2, _, s2 = rn.resnet_features(params["encoder"], s1, x2, cfg.rn_cfg(), enc_train)
    if cfg.freeze_encoder:
        # cut the grad at the features: backward skips BOTH encoder passes
        # (the reference gets the same skip from requires_grad=False on
        # encoder params, main_oscd.py:100-104)
        f1, f2 = jax.lax.stop_gradient((f1, f2))
    diffs = [jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)) for a, b in zip(f1, f2)]

    # FPN top-down over |diff| levels; y ends at the finest level (stride 2)
    lat = [layers.conv_apply(p, d) for p, d in zip(params["lateral"], diffs)]
    y = lat[-1]
    for i in range(len(lat) - 2, -1, -1):
        y = lat[i] + layers.resize_bilinear(y, lat[i].shape[1:3])
    y = jax.nn.relu(layers.conv_apply(params["smooth"], y))
    y = layers.resize_bilinear(y, (H, W))
    logits = layers.conv_apply(params["classifier"], y)[..., 0]
    new_state = {"encoder": s2 if enc_train else state["encoder"]}
    return logits.astype(jnp.float32), new_state
