"""ResNet-50 / Wide-ResNet-50-2 backbones (functional, NHWC).

The reference instantiates these from torchvision by name for convnet DINO
runs, EuroSAT/BigEarthNet fine-tunes, and the OSCD siamese encoder
(``main_dino_mc.py:223-229``, ``main_eurosat.py:40-48``,
``main_oscd.py:145-157``); embed_dim is sniffed from the fc weight. Here
they are native jnp modules with functional BatchNorm — training with a
batch-sharded input gives SyncBN semantics (the reference's
``convert_sync_batchnorm``, ``main_dino_mc.py:250-252``) with no extra code.

``resnet_features`` exposes the 5-level feature taps
(channels 64/256/512/1024/2048 at strides 2/4/8/16/32) that the OSCD
siamese decoder consumes (``main_oscd.py:167-168``: feature_indices
(0,4,5,6,7)).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from dinomc_tpu.models import layers

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)  # ResNet-50
    width_per_group: int = 64  # 128 => wide_resnet50_2
    num_classes: int = 0  # 0 = no classifier head (backbone mode)
    compute_dtype: Any = jnp.bfloat16

    @property
    def out_dim(self) -> int:
        return 2048


def resnet50(**kw) -> ResNetConfig:
    return ResNetConfig(**kw)


def wide_resnet50_2(**kw) -> ResNetConfig:
    return ResNetConfig(width_per_group=128, **kw)


def resnet_test(**kw) -> ResNetConfig:
    """Micro ResNet (1 bottleneck per stage) for cross-framework parity
    tests (tests/test_step_oracle.py) — exercises the full BN/SyncBN path."""
    return ResNetConfig(stage_sizes=(1, 1, 1, 1), **kw)


RESNET_FACTORIES = {
    "resnet50": resnet50,
    "wide_resnet50_2": wide_resnet50_2,
    "resnet_test": resnet_test,
}


def _conv_bn_init(key, k, c_in, c_out):
    bn_p, bn_s = layers.bn_init(c_out)
    return (
        {"conv": layers.conv_init(key, k, c_in, c_out, use_bias=False), "bn": bn_p},
        {"bn": bn_s},
    )


def init_resnet(key: jax.Array, cfg: ResNetConfig) -> Tuple[Params, Params]:
    keys = iter(jax.random.split(key, 256))
    params: Params = {}
    state: Params = {}
    params["stem"], state["stem"] = _conv_bn_init(next(keys), 7, 3, 64)

    c_in = 64
    for stage, blocks in enumerate(cfg.stage_sizes):
        planes = 64 * (2**stage)
        width = planes * cfg.width_per_group // 64
        c_out = planes * 4
        stage_p: List[Params] = []
        stage_s: List[Params] = []
        for b in range(blocks):
            bp: Params = {}
            bs: Params = {}
            bp["conv1"], bs["conv1"] = _conv_bn_init(next(keys), 1, c_in, width)
            bp["conv2"], bs["conv2"] = _conv_bn_init(next(keys), 3, width, width)
            bp["conv3"], bs["conv3"] = _conv_bn_init(next(keys), 1, width, c_out)
            # zero-init the last BN scale of each block (torchvision
            # zero_init_residual is off by default; keep ones for parity)
            if b == 0:
                bp["down"], bs["down"] = _conv_bn_init(next(keys), 1, c_in, c_out)
            stage_p.append(bp)
            stage_s.append(bs)
            c_in = c_out
        params[f"layer{stage + 1}"] = stage_p
        state[f"layer{stage + 1}"] = stage_s

    if cfg.num_classes > 0:
        k = next(keys)
        params["fc"] = {
            "kernel": 0.01 * jax.random.normal(k, (2048, cfg.num_classes), jnp.float32),
            "bias": jnp.zeros((cfg.num_classes,), jnp.float32),
        }
    return params, state


def _conv_bn(p, s, x, train, stride=1, relu=True, padding="SAME"):
    # torch-style int padding where it differs from SAME (stride-2 convs) so
    # torchvision-format weights (resnet_params_from_torch) align exactly
    y = layers.conv_apply(p["conv"], x, stride=stride, padding=padding)
    y, bn_s = layers.bn_apply(p["bn"], s["bn"], y, train)
    if relu:
        y = jax.nn.relu(y)
    return y, {"bn": bn_s}


def _bottleneck(p, s, x, train, stride):
    ns: Params = {}
    y, ns["conv1"] = _conv_bn(p["conv1"], s["conv1"], x, train)
    y, ns["conv2"] = _conv_bn(
        p["conv2"], s["conv2"], y, train, stride=stride, padding=1
    )
    y, ns["conv3"] = _conv_bn(p["conv3"], s["conv3"], y, train, relu=False)
    if "down" in p:
        sc, ns["down"] = _conv_bn(p["down"], s["down"], x, train, stride=stride, relu=False)
    else:
        sc = x
    return jax.nn.relu(y + sc), ns


def _max_pool_3x3_s2(x):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def resnet_features(
    params: Params,
    state: Params,
    x: jnp.ndarray,  # (B, H, W, 3)
    cfg: ResNetConfig,
    train: bool = False,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray, Params]:
    """Returns (5 feature maps c=64/256/512/1024/2048, pooled (B,2048), state)."""
    x = x.astype(cfg.compute_dtype)
    new_state: Params = {}
    y, new_state["stem"] = _conv_bn(
        params["stem"], state["stem"], x, train, stride=2, padding=3
    )
    feats = [y]  # 64ch, stride 2
    y = _max_pool_3x3_s2(y)
    for stage in range(4):
        name = f"layer{stage + 1}"
        stage_ns = []
        for b, (bp, bs) in enumerate(zip(params[name], state[name])):
            stride = 2 if (b == 0 and stage > 0) else 1
            y, ns = _bottleneck(bp, bs, y, train, stride)
            stage_ns.append(ns)
        new_state[name] = stage_ns
        feats.append(y)
    pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    return tuple(feats), pooled, new_state


def resnet_forward(
    params: Params,
    state: Params,
    x: jnp.ndarray,
    cfg: ResNetConfig,
    train: bool = False,
) -> Tuple[jnp.ndarray, Params]:
    """Backbone embedding (B, 2048) or logits (B, num_classes) if fc."""
    _, pooled, new_state = resnet_features(params, state, x, cfg, train)
    if cfg.num_classes > 0 and "fc" in params:
        pooled = pooled @ params["fc"]["kernel"] + params["fc"]["bias"]
    return pooled, new_state
