"""XCiT (Cross-Covariance Image Transformer) backbone, functional NHWC.

The reference offers XCiT encoders via ``torch.hub.load('facebookresearch/
xcit:main', ...)`` (``main_dino_mc.py:217-220``); this is a native
implementation of the architecture (XCiT-S12 defaults): conv patch stem,
fixed Fourier positional encoding with a learned projection, XCA blocks
(channel-wise attention with per-head learned temperature + Local Patch
Interaction depthwise convs + MLP, each with LayerScale), then two
class-attention layers that write into the CLS token, final LN, CLS out.

Like the ViT, blocks are stacked on a leading layer axis and scanned;
LPI BatchNorm states thread through the scan as per-layer ys. Channel
attention is (d_h x d_h) — tiny — so no flash kernel is needed; XCiT is
linear in token count by construction, which also suits the multi-crop
sizes without padding.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class XCiTConfig:
    patch_size: int = 16  # 16 => 4-conv stem, 8 => 3-conv stem
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 8
    mlp_ratio: float = 4.0
    cls_attn_layers: int = 2
    layer_scale_init: float = 1.0
    layernorm_eps: float = 1e-6
    pos_hidden: int = 32
    compute_dtype: Any = jnp.bfloat16
    # Rematerialize each block in backward. Without it the layer scan saves
    # every (B, N, 3D) qkv for the backward pass, which OOMs a v5e-16GB at
    # patch 8 (784 tokens/global-crop) in the multi-crop DINO step — the
    # r3 "p8 compiler crash" bisected to this OOM (scripts/xcit_p8_bisect.py)
    # once the relay's compiler stopped dying on the report.
    remat: bool = True
    # Saved-activation policy under remat (r5, after the p8 dissection put
    # the MLP at 50% and XCA+LPI at 42% of the student step):
    #   'full'     — save only the carry; backward recomputes qkv/XCA/LPI/
    #                fc1+GELU. DEFAULT: measured fastest.
    #   'branches' — additionally save the XCA and LPI branch outputs
    #                (2 x (B, N, D) bf16 per layer), skipping the qkv GEMM,
    #                XCA core and LPI conv recompute in backward. Measured
    #                WORSE on chip (bench_archs, 2026-08-21): p8 69.5 vs
    #                72.2 img/s, p16 182.8 vs 185.4 — the saved branches'
    #                HBM round trips cost more than the recompute they
    #                avoid, the same trade ViT's 'attn+mlp' policy lost.
    #                Kept for larger-HBM parts.
    remat_policy: str = "full"
    # True = tanh GELU (TPU default — the p8 dissection put the MLPs at
    # 50.3% of the student step, and erf GELU runs on the VPU's slow
    # transcendental path; the ViT progression measured the tanh switch,
    # docs/performance.md). False = exact erf for torch-hub parity.
    gelu_approx: bool = True
    # Stochastic depth, CONSTANT rate per layer (official XCiT uses
    # dpr = [rate] * depth, unlike ViT's linear ramp), applied per sample
    # to each residual branch (XCA / LPI / MLP, and both cls-attn
    # branches). The reference's hub student trains with
    # drop_path_rate=args.drop_path_rate (main_dino_mc.py:219-220).
    drop_path_rate: float = 0.0


def xcit_small_12(patch_size: int = 16, **kw) -> XCiTConfig:
    return XCiTConfig(patch_size=patch_size, embed_dim=384, depth=12, num_heads=8, **kw)


def xcit_medium_24(patch_size: int = 16, **kw) -> XCiTConfig:
    return XCiTConfig(patch_size=patch_size, embed_dim=512, depth=24, num_heads=8, **kw)


XCIT_FACTORIES = {"xcit_small_12": xcit_small_12, "xcit_medium_24": xcit_medium_24}


def _trunc(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def _ln_init(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _ln(x, p, eps):
    x32 = x.astype(jnp.float32)
    m = x32.mean(-1, keepdims=True)
    v = x32.var(-1, keepdims=True)
    return ((x32 - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _lin_init(key, di, do):
    return {"kernel": _trunc(key, (di, do)), "bias": jnp.zeros((do,), jnp.float32)}


def _lin(x, p):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _conv_init(key, k, ci, co):
    fan = k * k * ci
    return {
        "kernel": ((2.0 / fan) ** 0.5) * jax.random.normal(key, (k, k, ci, co)),
        "bias": jnp.zeros((co,), jnp.float32),
    }


def _conv(x, p, stride=1, groups=1):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=groups,
    )
    return y + p["bias"].astype(x.dtype)


def init_xcit(key: jax.Array, cfg: XCiTConfig) -> Params:
    keys = iter(jax.random.split(key, 8 * cfg.depth + 32))
    D, L, h = cfg.embed_dim, cfg.depth, cfg.num_heads

    # conv stem: p16 => 4 stride-2 convs, p8 => 3
    n_convs = 4 if cfg.patch_size == 16 else 3
    widths = [D // (2 ** (n_convs - 1 - i)) for i in range(n_convs)]
    stem = []
    c_in = 3
    for w in widths:
        stem.append(_conv_init(next(keys), 3, c_in, w))
        c_in = w

    # stacked XCA blocks
    blocks = {
        "norm1": {"scale": jnp.ones((L, D)), "bias": jnp.zeros((L, D))},
        "qkv": {
            "kernel": jnp.stack([_trunc(next(keys), (D, 3 * D)) for _ in range(L)]),
            "bias": jnp.zeros((L, 3 * D)),
        },
        "temp": jnp.ones((L, h), jnp.float32),
        "proj": {
            "kernel": jnp.stack([_trunc(next(keys), (D, D)) for _ in range(L)]),
            "bias": jnp.zeros((L, D)),
        },
        "gamma1": jnp.full((L, D), cfg.layer_scale_init, jnp.float32),
        "norm3": {"scale": jnp.ones((L, D)), "bias": jnp.zeros((L, D))},
        "lpi_conv1": {
            "kernel": jnp.stack(
                [_conv_init(next(keys), 3, 1, D)["kernel"] for _ in range(L)]
            ),
            "bias": jnp.zeros((L, D)),
        },
        "lpi_bn": {"scale": jnp.ones((L, D)), "bias": jnp.zeros((L, D))},
        "lpi_conv2": {
            "kernel": jnp.stack(
                [_conv_init(next(keys), 3, 1, D)["kernel"] for _ in range(L)]
            ),
            "bias": jnp.zeros((L, D)),
        },
        "gamma3": jnp.full((L, D), cfg.layer_scale_init, jnp.float32),
        "norm2": {"scale": jnp.ones((L, D)), "bias": jnp.zeros((L, D))},
        "fc1": {
            "kernel": jnp.stack(
                [_trunc(next(keys), (D, int(D * cfg.mlp_ratio))) for _ in range(L)]
            ),
            "bias": jnp.zeros((L, int(D * cfg.mlp_ratio))),
        },
        "fc2": {
            "kernel": jnp.stack(
                [_trunc(next(keys), (int(D * cfg.mlp_ratio), D)) for _ in range(L)]
            ),
            "bias": jnp.zeros((L, D)),
        },
        "gamma2": jnp.full((L, D), cfg.layer_scale_init, jnp.float32),
    }

    cls_blocks = []
    for _ in range(cfg.cls_attn_layers):
        cls_blocks.append(
            {
                "norm1": _ln_init(D),
                "qkv": _lin_init(next(keys), D, 3 * D),
                "proj": _lin_init(next(keys), D, D),
                "gamma1": jnp.full((D,), cfg.layer_scale_init, jnp.float32),
                "norm2": _ln_init(D),
                "fc1": _lin_init(next(keys), D, int(D * cfg.mlp_ratio)),
                "fc2": _lin_init(next(keys), int(D * cfg.mlp_ratio), D),
                "gamma2": jnp.full((D,), cfg.layer_scale_init, jnp.float32),
            }
        )

    return {
        "stem": stem,
        # sin/cos halves per axis: 2 axes x hidden features
        "pos_proj": _lin_init(next(keys), 2 * cfg.pos_hidden, D),
        "cls_token": _trunc(next(keys), (1, 1, D)),
        "blocks": blocks,
        "cls_blocks": cls_blocks,
        "norm": _ln_init(D),
    }


def _fourier_pos(gh: int, gw: int, hidden: int) -> jnp.ndarray:
    """Fixed 2-D sine/cosine features (XCiT PositionalEncodingFourier):
    hidden//2 sin + hidden//2 cos per axis -> (gh*gw, 2*hidden)."""
    scale = 2 * math.pi
    eps = 1e-6
    y = (jnp.arange(gh, dtype=jnp.float32) + 1.0)[:, None].repeat(gw, 1) / (gh + eps) * scale
    x = (jnp.arange(gw, dtype=jnp.float32) + 1.0)[None, :].repeat(gh, 0) / (gw + eps) * scale
    dim_t = 10000 ** (2 * (jnp.arange(hidden) // 2) / hidden)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    feats = jnp.concatenate(
        [jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2]),
         jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])], axis=-1,
    )
    return feats.reshape(gh * gw, 2 * hidden)


def _xca(tokens, bp, h, dtype):
    """Cross-covariance attention over channels: (B, N, D)."""
    B, N, D = tokens.shape
    dh = D // h
    qkv = tokens @ bp["qkv"]["kernel"].astype(dtype) + bp["qkv"]["bias"].astype(dtype)
    qkv = qkv.reshape(B, N, 3, h, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, h, dh)
    # normalize along tokens
    qn = q / jnp.maximum(
        jnp.linalg.norm(q.astype(jnp.float32), axis=1, keepdims=True), 1e-12
    ).astype(dtype)
    kn = k / jnp.maximum(
        jnp.linalg.norm(k.astype(jnp.float32), axis=1, keepdims=True), 1e-12
    ).astype(dtype)
    attn = jnp.einsum("bnhd,bnhe->bhde", qn, kn).astype(jnp.float32)  # (B, h, dh, dh)
    attn = attn * bp["temp"][None, :, None, None]
    attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
    out = jnp.einsum("bhde,bnhe->bnhd", attn, v).reshape(B, N, D)
    return out @ bp["proj"]["kernel"].astype(dtype) + bp["proj"]["bias"].astype(dtype)


def _lpi(tokens, bp, gh, gw, eps, dtype, gelu_approx=True):
    """Local patch interaction: dwconv3x3 -> GELU -> BN(batch stats) ->
    dwconv3x3, on the (gh, gw) token grid.

    BN uses the bandwidth-lean one-pass form (models/layers.bn_apply,
    r5): both moments from one fused f32-accumulated read, normalize
    folded to x*a + b so the elementwise pass stays in the compute dtype
    instead of materializing an f32 copy + two-pass variance."""
    B, N, D = tokens.shape
    x = tokens.reshape(B, gh, gw, D)
    x = _conv(x, {"kernel": bp["lpi_conv1"]["kernel"], "bias": bp["lpi_conv1"]["bias"]},
              groups=D)
    x = jax.nn.gelu(x, approximate=gelu_approx)
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(0, 1, 2))
    mean2 = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    a = bp["lpi_bn"]["scale"] * inv
    b = bp["lpi_bn"]["bias"] - mean * a
    x = x * a.astype(dtype) + b.astype(dtype)
    x = _conv(x, {"kernel": bp["lpi_conv2"]["kernel"], "bias": bp["lpi_conv2"]["bias"]},
              groups=D)
    return x.reshape(B, N, D)


def xcit_forward(
    params: Params,
    x: jnp.ndarray,  # (B, H, W, 3)
    cfg: XCiTConfig,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """CLS embedding (B, D) float32."""
    dt = cfg.compute_dtype
    B = x.shape[0]
    L = cfg.depth
    use_dp = (not deterministic) and rng is not None and cfg.drop_path_rate > 0
    keep_p = 1.0 - cfg.drop_path_rate
    if use_dp:
        rb, rc = jax.random.split(rng)
        # (L, 3, B) for the scanned blocks' three residual branches and
        # (cls_layers, 2, B) for the class-attention blocks
        blk_masks = jax.random.bernoulli(rb, keep_p, (L, 3, B))
        cls_masks = jax.random.bernoulli(
            rc, keep_p, (cfg.cls_attn_layers, 2, B)
        )
    else:
        # all-keep placeholders keep the scan xs structure static
        blk_masks = jnp.ones((L, 3, B), jnp.bool_)
        cls_masks = jnp.ones((cfg.cls_attn_layers, 2, B), jnp.bool_)

    def drop(y, mask):
        if not use_dp:
            return y
        m = mask.reshape((B,) + (1,) * (y.ndim - 1))
        return jnp.where(m, y * jnp.asarray(1.0 / keep_p, y.dtype),
                         jnp.zeros_like(y))
    y = x.astype(dt)
    for i, conv_p in enumerate(params["stem"]):
        y = _conv(y, conv_p, stride=2)
        if i < len(params["stem"]) - 1:
            y = jax.nn.gelu(y, approximate=cfg.gelu_approx)
    gh, gw = y.shape[1], y.shape[2]
    tokens = y.reshape(B, gh * gw, cfg.embed_dim)
    pos = _fourier_pos(gh, gw, cfg.pos_hidden)
    tokens = tokens + _lin(pos.astype(dt), params["pos_proj"])[None]

    eps = cfg.layernorm_eps

    def block(t, bp, masks):
        from jax.ad_checkpoint import checkpoint_name

        y1 = _ln(t, bp["norm1"], eps)
        xca_out = checkpoint_name(
            bp["gamma1"].astype(dt) * _xca(y1, bp, cfg.num_heads, dt),
            "xca_out",
        )
        t = t + drop(xca_out, masks[0])
        y3 = _ln(t, bp["norm3"], eps)
        lpi_out = checkpoint_name(
            bp["gamma3"].astype(dt) * _lpi(y3, bp, gh, gw, eps, dt,
                                           cfg.gelu_approx),
            "lpi_out",
        )
        t = t + drop(lpi_out, masks[1])
        y2 = _ln(t, bp["norm2"], eps)
        m = _lin(y2, {"kernel": bp["fc1"]["kernel"], "bias": bp["fc1"]["bias"]})
        m = jax.nn.gelu(m, approximate=cfg.gelu_approx)
        m = _lin(m, {"kernel": bp["fc2"]["kernel"], "bias": bp["fc2"]["bias"]})
        t = t + drop(bp["gamma2"].astype(dt) * m, masks[2])
        return t

    if cfg.remat:
        if cfg.remat_policy == "branches":
            block = jax.checkpoint(
                block,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "xca_out", "lpi_out"
                ),
            )
        else:
            block = jax.checkpoint(block)

    def body(t, xs):
        bp, masks = xs
        return block(t, bp, masks), None

    tokens, _ = jax.lax.scan(body, tokens, (params["blocks"], blk_masks))

    # class attention layers
    cls = jnp.broadcast_to(params["cls_token"].astype(dt), (B, 1, cfg.embed_dim))
    h = cfg.num_heads
    dh = cfg.embed_dim // h
    for i, bp in enumerate(params["cls_blocks"]):
        full = jnp.concatenate([cls, tokens], axis=1)
        y1 = _ln(full, bp["norm1"], eps)
        qkv = _lin(y1, bp["qkv"]).reshape(B, -1, 3, h, dh)
        q = qkv[:, :1, 0]  # cls query only
        k, v = qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) / math.sqrt(dh)
        attn = jax.nn.softmax(logits, axis=-1).astype(dt)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, 1, cfg.embed_dim)
        out = _lin(out, bp["proj"])
        cls = cls + drop(bp["gamma1"].astype(dt) * out, cls_masks[i, 0])
        y2 = _ln(cls, bp["norm2"], eps)
        m = _lin(jax.nn.gelu(_lin(y2, bp["fc1"]), approximate=cfg.gelu_approx),
                 bp["fc2"])
        cls = cls + drop(bp["gamma2"].astype(dt) * m, cls_masks[i, 1])

    cls = _ln(cls, params["norm"], eps)
    return cls[:, 0].astype(jnp.float32)
