"""Functional conv / norm building blocks (NHWC, HWIO weights).

These replace the torch.nn / mmcv ``ConvModule`` layers the reference's
segmentation heads rely on (mmseg UPerHead/FCNHead internals; SURVEY.md
§2.4 notes mmseg is external and must be implemented natively).

BatchNorm is functional: ``(params, state, x, train)`` -> ``(y, new_state)``.
Under jit with a batch-sharded input, the batch-statistic means reduce
globally (XLA SPMD inserts the cross-replica collective), which IS SyncBN —
the TPU-native equivalent of ``nn.SyncBatchNorm.convert_sync_batchnorm``
(reference ``main_dino_mc.py:250-252``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _fan_in_init(key, shape, dtype=jnp.float32):
    """He (Kaiming) normal init for HWIO conv kernels."""
    fan_in = shape[0] * shape[1] * shape[2]
    std = (2.0 / fan_in) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


def conv_init(
    key, k: int, c_in: int, c_out: int, use_bias: bool = True
) -> Params:
    p = {"kernel": _fan_in_init(key, (k, k, c_in, c_out))}
    if use_bias:
        p["bias"] = jnp.zeros((c_out,), jnp.float32)
    return p


def conv_apply(
    p: Params,
    x: jnp.ndarray,
    stride: int = 1,
    dilation: int = 1,
    padding: Any = "SAME",
) -> jnp.ndarray:
    """2-D conv, NHWC x HWIO -> NHWC. ``padding`` is "SAME"/"VALID" or an
    int for torch-style symmetric padding — identical to SAME at stride 1
    with odd kernels, but NOT at stride 2 (SAME pads (lo, lo+1) where torch
    pads (p, p)); torch-weight-importing backbones must pass the int."""
    dt = x.dtype
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(dt),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(dt)
    return y


def bn_init(c: int) -> Tuple[Params, Params]:
    params = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    state = {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}
    return params, state


def bn_apply(
    p: Params,
    s: Params,
    x: jnp.ndarray,
    train: bool,
    momentum: float = 0.9,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, Params]:
    """BatchNorm over all but the channel axis. torch momentum convention:
    running = (1 - torch_mom) * running + torch_mom * batch with
    torch_mom = 1 - momentum here (momentum=0.9 ≡ torch momentum 0.1).

    Bandwidth-lean form (r5, after the RN50 dissection booked train-BN at
    ~30% of the conv step): both moments come from ONE fused read of x
    (E[x], E[x^2] — f32 accumulation), and the normalize is folded to
    y = x*a + b with per-channel a, b precomputed in f32, so the
    elementwise pass runs in the compute dtype (one bf16 read + write
    instead of an f32 materialization + two-pass variance). Measured:
    RN50 DINO step 392.6 -> see docs/performance.md r5."""
    if train:
        axes = tuple(range(x.ndim - 1))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=axes)
        mean2 = jnp.mean(jnp.square(x32), axis=axes)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        n = x.size // x.shape[-1]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": momentum * s["mean"] + (1 - momentum) * mean,
            "var": momentum * s["var"] + (1 - momentum) * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_state = s
    inv = jax.lax.rsqrt(var + eps)
    a = p["scale"] * inv
    b = p["bias"] - mean * a
    y = x * a.astype(x.dtype) + b.astype(x.dtype)
    return y, new_state


def conv_bn_relu_init(key, k: int, c_in: int, c_out: int) -> Tuple[Params, Params]:
    bn_p, bn_s = bn_init(c_out)
    return {"conv": conv_init(key, k, c_in, c_out, use_bias=False), "bn": bn_p}, {
        "bn": bn_s
    }


def conv_bn_relu_apply(
    p: Params, s: Params, x: jnp.ndarray, train: bool
) -> Tuple[jnp.ndarray, Params]:
    y = conv_apply(p["conv"], x)
    y, bn_s = bn_apply(p["bn"], s["bn"], y, train)
    return jax.nn.relu(y), {"bn": bn_s}


def resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear NHWC resize (mmcv-style align_corners=False semantics)."""
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, hw[0], hw[1], C), method="bilinear").astype(x.dtype)


def adaptive_avg_pool(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d(out) for NHWC: partition H/W into `out` bins
    with torch's floor/ceil bin edges."""
    B, H, W, C = x.shape
    # torch bins: start = floor(i*H/out), end = ceil((i+1)*H/out)
    def pool_axis(arr, size, axis):
        segments = []
        for i in range(out):
            lo = (i * size) // out
            hi = -(-((i + 1) * size) // out)
            segments.append(
                jnp.mean(
                    jax.lax.slice_in_dim(arr, lo, hi, axis=axis), axis=axis, keepdims=True
                )
            )
        return jnp.concatenate(segments, axis=axis)

    return pool_axis(pool_axis(x, H, 1), W, 2)


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float, train: bool):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
