"""Swin-Tiny backbone (functional, NHWC).

The reference uses torchvision ``swin_t`` as a DINO-MC encoder
(``main_dino_mc.py:226-229``; README Swin-t rows). This is a native jnp
implementation of the Swin-T architecture: 4x4 patch embed (dim 96), stages
of depth (2, 2, 6, 2) with heads (3, 6, 12, 24), 7x7 window attention with
relative position bias, shifted windows on odd blocks, patch merging
between stages, final LayerNorm + global average pool -> 768-d embedding.

Non-window-divisible feature maps (e.g. the 104 px multi-crop -> 26x26 at
stride 4) are handled by bottom/right padding with attention masking of the
padded tokens — torchvision semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    layernorm_eps: float = 1e-5
    compute_dtype: Any = jnp.bfloat16
    # Stochastic depth, linear ramp over all blocks (torchvision swin_t
    # hard-codes stochastic_depth_prob=0.2 — the reference's swin student
    # trains with it implicitly, main_dino_mc.py:224-227; here it follows
    # the same --drop_path_rate flag as every other arch; set 0.2 to
    # replicate torchvision exactly)
    drop_path_rate: float = 0.0
    # Window-attention dispatch: None = Pallas packed-window kernel on TPU,
    # XLA einsum path elsewhere; True/False force. The kernel packs G
    # windows per MXU program (ops/pallas/window_attention.py) — built for
    # the ~2x lever named in docs/performance.md's r4 Swin dissection and
    # measured at 1.3x/1.1x on the stage-1/2 cores (the 2x bound was
    # stub-out-inflated; see docs/performance.md r5).
    window_kernel: Optional[bool] = None
    # Per-stage gate: the kernel wins only where windows are many and
    # heads few (chained core micro, scripts/swin_kernel_micro.py:
    # stage1 1.32x, stage2 1.13x, stage3 0.86x) — stages with more heads
    # than this use the XLA einsum path.
    window_kernel_max_heads: int = 6
    # True = tanh GELU (TPU default — erf GELU runs on the VPU's slow
    # transcendental path; the ViT progression measured it doubling MLP
    # time, docs/performance.md). False = exact erf for torch parity
    # (torchvision swin_t uses nn.GELU).
    gelu_approx: bool = True

    @property
    def out_dim(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


def swin_t(**kw) -> SwinConfig:
    return SwinConfig(**kw)


def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def _ln(x, p, eps):
    x32 = x.astype(jnp.float32)
    m = x32.mean(-1, keepdims=True)
    v = x32.var(-1, keepdims=True)
    return ((x32 - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _ln_init(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _lin_init(key, di, do):
    return {"kernel": _trunc_normal(key, (di, do)), "bias": jnp.zeros((do,), jnp.float32)}


def _lin(x, p):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def init_swin(key: jax.Array, cfg: SwinConfig) -> Params:
    keys = iter(jax.random.split(key, 512))
    w = cfg.window
    params: Params = {
        "patch_embed": {
            "kernel": _trunc_normal(
                next(keys), (cfg.patch_size * cfg.patch_size * 3, cfg.embed_dim)
            ),
            "bias": jnp.zeros((cfg.embed_dim,), jnp.float32),
            "norm": _ln_init(cfg.embed_dim),
        },
        "stages": [],
    }
    dim = cfg.embed_dim
    for s, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        blocks = []
        for _ in range(depth):
            blocks.append(
                {
                    "norm1": _ln_init(dim),
                    "qkv": _lin_init(next(keys), dim, 3 * dim),
                    "proj": _lin_init(next(keys), dim, dim),
                    "rel_bias": _trunc_normal(next(keys), ((2 * w - 1) ** 2, heads)),
                    "norm2": _ln_init(dim),
                    "fc1": _lin_init(next(keys), dim, int(dim * cfg.mlp_ratio)),
                    "fc2": _lin_init(next(keys), int(dim * cfg.mlp_ratio), dim),
                }
            )
        stage: Params = {"blocks": blocks}
        if s < len(cfg.depths) - 1:
            stage["merge"] = {
                "norm": _ln_init(4 * dim),
                "reduce": {"kernel": _trunc_normal(next(keys), (4 * dim, 2 * dim))},
            }
            dim *= 2
        params["stages"].append(stage)
    params["norm"] = _ln_init(dim)
    return params


def _rel_index(w: int) -> np.ndarray:
    """(w*w, w*w) indices into the (2w-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, ww, ww)
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return rel[..., 0] * (2 * w - 1) + rel[..., 1]


def _window_partition(x, w):
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _window_reverse(win, w, B, H, W):
    C = win.shape[-1]
    x = win.reshape(B, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _shift_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """(nW, ww, ww) additive mask (−100 on cross-region pairs) for shifted
    windows, computed statically per feature size."""
    img = np.zeros((H, W), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(H // w, w, W // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _pad_mask(H: int, W: int, Hp: int, Wp: int, w: int) -> Optional[np.ndarray]:
    """Additive mask hiding bottom/right padding tokens, or None."""
    if (H, W) == (Hp, Wp):
        return None
    valid = np.zeros((Hp, Wp), np.float32)
    valid[H:, :] = 1.0
    valid[:, W:] = 1.0
    win = valid.reshape(Hp // w, w, Wp // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    return (win[:, None, :] * -100.0).astype(np.float32)  # mask keys only


def _use_window_kernel(cfg: "SwinConfig", heads: int) -> bool:
    on = (cfg.window_kernel if cfg.window_kernel is not None
          else jax.default_backend() == "tpu")
    return on and heads <= cfg.window_kernel_max_heads


def _window_attention(x, bp, heads, w, mask, n_windows=None, use_kernel=False):
    """x: (nB, ww, C); mask: static np (nW, ww, ww) or None."""
    nB, ww, C = x.shape
    hd = C // heads
    qkv = _lin(x, {"kernel": bp["qkv"]["kernel"], "bias": bp["qkv"]["bias"]})
    if use_kernel:
        from dinomc_tpu.ops.pallas.window_attention import (
            packed_window_attention,
        )

        idx = jnp.asarray(_rel_index(w))
        bias = bp["rel_bias"][idx].transpose(2, 0, 1)  # (heads, ww, ww) f32
        out = packed_window_attention(
            qkv[..., :C], qkv[..., C : 2 * C], qkv[..., 2 * C :],
            bias, mask, heads, n_windows,
        )
    else:
        qkv = qkv.reshape(nB, ww, 3, heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) / (hd**0.5)
        idx = jnp.asarray(_rel_index(w))
        bias = bp["rel_bias"][idx]  # (ww, ww, heads)
        logits = logits + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            mask_arr = jnp.asarray(mask)
            nW = mask.shape[0]
            logits = logits.reshape(nB // nW, nW, heads, ww, ww) + mask_arr[:, None, :, :]
            logits = logits.reshape(nB, heads, ww, ww)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(nB, ww, C)
    return _lin(out, {"kernel": bp["proj"]["kernel"], "bias": bp["proj"]["bias"]})


def _drop_path(y, keep_p, mask):
    """Per-sample stochastic depth on one residual branch. ``mask``: (B,)
    bool keep-decisions; 1/keep_p scaling preserves the expectation."""
    m = mask.reshape((y.shape[0],) + (1,) * (y.ndim - 1))
    return jnp.where(m, y * (1.0 / keep_p).astype(y.dtype), jnp.zeros_like(y))


def _swin_block(x, bp, heads, w, shift, eps, dp=None, use_kernel=False,
                gelu_approx=True):
    """dp: None, or (keep_prob scalar, (2, B) bool masks) for the two
    residual branches (independent draws, torchvision StochasticDepth)."""
    B, H, W, C = x.shape
    y = _ln(x, bp["norm1"], eps)
    # pad to window multiples (bottom/right)
    Hp = -(-H // w) * w
    Wp = -(-W // w) * w
    pad_m = _pad_mask(H, W, Hp, Wp, w)
    if (Hp, Wp) != (H, W):
        y = jnp.pad(y, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    if shift > 0:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        mask = _shift_mask(Hp, Wp, w, shift)
        if pad_m is not None:
            mask = mask + pad_m
    else:
        mask = pad_m
    n_windows = (Hp // w) * (Wp // w)
    win = _window_partition(y, w)
    win = _window_attention(win, bp, heads, w, mask, n_windows, use_kernel)
    y = _window_reverse(win, w, B, Hp, Wp)
    if shift > 0:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    y = y[:, :H, :W, :]
    if dp is not None:
        y = _drop_path(y, dp[0], dp[1][0])
    x = x + y
    y = _ln(x, bp["norm2"], eps)
    y = _lin(jax.nn.gelu(_lin(y, bp["fc1"]), approximate=gelu_approx), bp["fc2"])
    if dp is not None:
        y = _drop_path(y, dp[0], dp[1][1])
    return x + y


def _patch_merge(x, mp, eps):
    B, H, W, C = x.shape
    # pad odd dims
    if H % 2 or W % 2:
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        H, W = x.shape[1], x.shape[2]
    x = jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
        axis=-1,
    )
    x = _ln(x, mp["norm"], eps)
    return x @ mp["reduce"]["kernel"].astype(x.dtype)


def swin_forward(
    params: Params,
    x: jnp.ndarray,  # (B, H, W, 3)
    cfg: SwinConfig,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Global-pooled embedding (B, out_dim) float32."""
    B, H, W, _ = x.shape
    p = cfg.patch_size
    dt = cfg.compute_dtype
    gh, gw = H // p, W // p
    t = x[:, : gh * p, : gw * p, :].astype(dt)
    t = t.reshape(B, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(B, gh, gw, -1)
    t = t @ params["patch_embed"]["kernel"].astype(dt) + params["patch_embed"][
        "bias"
    ].astype(dt)
    t = _ln(t, params["patch_embed"]["norm"], cfg.layernorm_eps)

    # Stochastic depth: linear ramp 0 -> drop_path_rate over all blocks
    # (torchvision StochasticDepth schedule), independent per-sample masks
    # per residual branch, drawn once up front.
    T_blocks = sum(cfg.depths)
    use_dp = (not deterministic) and rng is not None and cfg.drop_path_rate > 0
    if use_dp:
        rates = jnp.linspace(0.0, cfg.drop_path_rate, T_blocks)
        keeps = 1.0 - rates
        dp_masks = jax.random.bernoulli(
            rng, keeps[:, None, None], (T_blocks, 2, B)
        )

    blk = 0
    for s, stage in enumerate(params["stages"]):
        heads = cfg.num_heads[s]
        for b, bp in enumerate(stage["blocks"]):
            shift = 0 if b % 2 == 0 else cfg.window // 2
            # shift only makes sense when the map is larger than one window
            if min(t.shape[1], t.shape[2]) <= cfg.window:
                shift = 0
            dp = (keeps[blk], dp_masks[blk]) if use_dp else None
            t = _swin_block(
                t, bp, heads, cfg.window, shift, cfg.layernorm_eps, dp,
                use_kernel=_use_window_kernel(cfg, heads),
                gelu_approx=cfg.gelu_approx,
            )
            blk += 1
        if "merge" in stage:
            t = _patch_merge(t, stage["merge"], cfg.layernorm_eps)

    t = _ln(t, params["norm"], cfg.layernorm_eps)
    return jnp.mean(t.astype(jnp.float32), axis=(1, 2))
