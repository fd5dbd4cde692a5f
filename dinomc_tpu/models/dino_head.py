"""DINO projection head.

Parity target: reference ``DINOHead`` (``utils/vision_transformer.py:260-294``):
3-layer MLP in_dim -> 2048 -> 2048 -> 256 (bottleneck) with GELU, optional BN,
L2-normalization of the bottleneck, then a **weight-normalized** linear layer
256 -> out_dim (65536) whose per-row scale ``g`` is frozen at 1 when
``norm_last_layer=True`` (``vision_transformer.py:279-282``).

Weight norm is stored as (direction ``v``, scale ``g``) with the effective
weight ``W = g * v / ||v||_row``; freezing ``g`` is done by an optimizer mask
(see train/optim.py), not by tensor surgery.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DINOHeadConfig:
    in_dim: int = 384
    out_dim: int = 65536
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    nlayers: int = 3
    use_bn: bool = False  # reference default for ViT runs
    norm_last_layer: bool = True
    compute_dtype: Any = jnp.bfloat16


def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def init_dino_head(key: jax.Array, cfg: DINOHeadConfig) -> Params:
    nlayers = max(cfg.nlayers, 1)
    keys = jax.random.split(key, nlayers + 1)
    layers = []
    dims_in = [cfg.in_dim] + [cfg.hidden_dim] * (nlayers - 1)
    dims_out = [cfg.hidden_dim] * (nlayers - 1) + [cfg.bottleneck_dim]
    if nlayers == 1:
        dims_in, dims_out = [cfg.in_dim], [cfg.bottleneck_dim]
    for i, (di, do) in enumerate(zip(dims_in, dims_out)):
        layer = {
            "kernel": _trunc_normal(keys[i], (di, do)),
            "bias": jnp.zeros((do,), jnp.float32),
        }
        if cfg.use_bn and i < nlayers - 1:
            layer["bn_scale"] = jnp.ones((do,), jnp.float32)
            layer["bn_bias"] = jnp.zeros((do,), jnp.float32)
        layers.append(layer)
    params: Params = {f"mlp_{i}": l for i, l in enumerate(layers)}
    # Weight-normed last layer: v is the direction, g the per-output scale.
    params["last_layer"] = {
        "v": _trunc_normal(keys[-1], (cfg.bottleneck_dim, cfg.out_dim)),
        "g": jnp.ones((cfg.out_dim,), jnp.float32),
    }
    return params


def dino_head_forward(
    params: Params,
    x: jnp.ndarray,
    cfg: DINOHeadConfig,
    batch_stats: bool = False,
) -> jnp.ndarray:
    """x: (B, in_dim) float32 -> logits (B, out_dim) float32."""
    dt = cfg.compute_dtype
    nlayers = max(cfg.nlayers, 1)
    y = x.astype(dt)
    for i in range(nlayers):
        layer = params[f"mlp_{i}"]
        y = y @ layer["kernel"].astype(dt) + layer["bias"].astype(dt)
        if i < nlayers - 1:
            if cfg.use_bn:
                y32 = y.astype(jnp.float32)
                mean = jnp.mean(y32, axis=0, keepdims=True)
                var = jnp.var(y32, axis=0, keepdims=True)
                y32 = (y32 - mean) * jax.lax.rsqrt(var + 1e-5)
                y = (y32 * layer["bn_scale"] + layer["bn_bias"]).astype(dt)
            y = jax.nn.gelu(y, approximate=False)
    # L2 normalize the bottleneck (float32 for stability).
    y = y.astype(jnp.float32)
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
    # Weight-normalized last layer.
    v = params["last_layer"]["v"]
    g = params["last_layer"]["g"]
    v_norm = v / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-12)
    w = v_norm * g[None, :]
    return (y.astype(dt) @ w.astype(dt)).astype(jnp.float32)
