"""TPU-native Vision Transformer (DINO flavor).

Capability parity with the reference's timm-derived ViT
(``utils/vision_transformer.py:27-256``):
  * PatchEmbed with stride == patch size — implemented as a reshape-based
    patchify + one big matmul (MXU-friendly; no conv needed when
    stride == kernel).
  * CLS token + learned positional embeddings with **bicubic interpolation**
    for arbitrary input sizes (reference ``interpolate_pos_encoding``,
    ``vision_transformer.py:174-194``) — this is what lets one weight set
    serve 84–224 px multi-crops and 512 px segmentation inputs.
  * Pre-norm blocks, qkv bias, GELU MLP (ratio 4), LayerNorm eps 1e-6,
    per-sample DropPath stochastic depth (``vision_transformer.py:27-46``).
  * ``get_intermediate_layers`` / attention taps
    (``vision_transformer.py:218-235``) for UPerNet feature pyramids and
    attention visualization.
  * Factories tiny/small/base (``vision_transformer.py:238-256``).

TPU-first design choices (not a translation):
  * Block parameters are **stacked along a leading layer axis** and the
    forward is a single ``lax.scan`` over layers: one compiled block body
    regardless of how many distinct crop resolutions the multi-crop step
    uses (the reference runs 7 sequential Python-level forwards).
  * Activations run in bfloat16 (MXU native); LayerNorm statistics and the
    attention softmax accumulate in float32.
  * NHWC image layout.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    img_size: int = 224
    in_chans: int = 3
    drop_path_rate: float = 0.0
    layernorm_eps: float = 1e-6
    compute_dtype: Any = jnp.bfloat16
    # Rematerialize each block in backward (trade FLOPs for HBM): without
    # this, backward through the layer scan stores every attention
    # probability tensor and OOMs a v5e-16GB at DINO batch sizes.
    remat: bool = True
    # 'auto' = Pallas flash attention on TPU (no N^2 materialization),
    # dense softmax elsewhere; 'dense' forces the reference formulation;
    # 'ring' = sequence-parallel ring attention (only valid inside the
    # shard_map of vit_forward_sp, which sets it itself).
    attn_impl: str = "auto"
    # 'dense' = two einsums with the (B*N, 4D) hidden in HBM; 'fused' = the
    # Pallas one-VMEM-pass fc1+GELU+fc2 kernel (ops/pallas/fused_mlp.py).
    # MEASURED SLOWER on v5e at ViT-S shapes (teacher fwd 30.7 -> 34.4 ms,
    # bench 103.2 -> 98.0 img/s): per-row-block the two small dots + VPU
    # GELU serialize and idle the MXU, while XLA's unfused form runs
    # full-size matmuls and overlaps the hidden's HBM traffic behind them.
    # Kept as an explored variant; default stays unfused.
    mlp_impl: str = "dense"
    # Real (unpadded) global token count when running sequence-parallel —
    # set by vit_forward_sp so ring attention masks padded tail keys.
    attn_n_valid: Optional[int] = None
    # Mesh axis the ring rotates over (set by vit_forward_sp from its
    # seq_axis argument; only meaningful when attn_impl == 'ring').
    attn_axis: str = "seq"
    # Static crop-packing split: if nonzero, the token sequence holds TWO
    # independent crops — [0, attn_boundary) and [attn_boundary, N) — and
    # attention is block-diagonal between them. LayerNorm/MLP are
    # token-pointwise, so the packed forward is exactly equivalent to two
    # separate forwards while halving kernel launches (multi-crop DINO).
    attn_boundary: int = 0
    # tanh-approximate GELU (True) vs exact erf (False). The reference uses
    # exact erf (torch nn.GELU default), but on TPU the erf transcendental
    # DOUBLES the MLP wall time (measured: 20.4 vs 10.0 ms per 12-layer MLP
    # pass at B=64/N=785 on v5e) for a max activation difference of ~1e-3 —
    # far below training noise. Default tanh for the training path; strict
    # torch-checkpoint forward-parity paths set False.
    gelu_approx: bool = True
    # Remat policy under `remat=True`: 'full' recomputes the whole block in
    # backward (minimum memory); 'dots' saves matmul outputs and recomputes
    # only elementwise ops; 'dots+attn' additionally saves the fused
    # attention output; 'attn' saves ONLY the attention output; 'qkv+attn'
    # saves qkv + attention output (backward skips the qkv matmul and the
    # attention forward, recomputing just layernorms + MLP); 'qkv+attn+mlp'
    # additionally saves the GELU'd MLP hidden — backward recomputes only
    # the layernorms, the maximum-save point short of disabling remat.
    # Measured on v5e, DINO-MC bench shapes (img/s/chip):
    #   full:         98.2 @B24, 87.6 @B32   (min memory)
    #   dots:         ~92 @B32 — saved-tensor HBM writes eat the saved FLOPs
    #   attn:         99.0 @B10, 108.6 @B12, 109.6 @B14, 103.0 @B24  <- default
    #   qkv+attn:     103.4 @B16, 101.2 @B24, 95.8 @B32
    #   qkv+attn+mlp: 110.2 @B10 (3-run mean), 109.1 @B12, 106.8 @B14
    # 'attn' is the default: the fused-attention forward is the most
    # expensive single recompute, and its output is only D/token/layer of
    # HBM — the matmul-heavy recomputes (qkv/MLP) are nearly free in wall
    # time because they pipeline onto the idle MXU during the VPU-bound
    # parts of the backward. 'qkv+attn+mlp' edges it out only at small
    # per-chip batches (B≈10) where HBM pressure is low; bench.py uses it.
    remat_policy: str = "attn"

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


def vit_tiny(patch_size: int = 16, **kw) -> "ViTConfig":
    return ViTConfig(patch_size=patch_size, embed_dim=192, depth=12, num_heads=3, **kw)


def vit_small(patch_size: int = 16, **kw) -> "ViTConfig":
    return ViTConfig(patch_size=patch_size, embed_dim=384, depth=12, num_heads=6, **kw)


def vit_base(patch_size: int = 16, **kw) -> "ViTConfig":
    return ViTConfig(patch_size=patch_size, embed_dim=768, depth=12, num_heads=12, **kw)


def vit_test(patch_size: int = 4, **kw) -> "ViTConfig":
    """Micro ViT for cross-framework parity tests (tests/test_step_oracle.py):
    small enough that a torch oracle runs the full DINO step in seconds."""
    kw.setdefault("img_size", 16)
    return ViTConfig(patch_size=patch_size, embed_dim=32, depth=3, num_heads=2, **kw)


VIT_FACTORIES = {
    "vit_tiny": vit_tiny,
    "vit_small": vit_small,
    "vit_base": vit_base,
    "vit_test": vit_test,
}


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    """Truncated normal init (±2σ), matching reference trunc_normal_
    (``utils/utils.py:529-567``) semantics."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def init_vit(key: jax.Array, cfg: ViTConfig) -> Params:
    kpe, kcls, kpos, kqkv, kproj, kfc1, kfc2 = jax.random.split(key, 7)
    D, L = cfg.embed_dim, cfg.depth
    patch_dim = cfg.patch_size * cfg.patch_size * cfg.in_chans

    def zeros(shape):
        return jnp.zeros(shape, jnp.float32)

    def ones(shape):
        return jnp.ones(shape, jnp.float32)

    params: Params = {
        "patch_embed": {
            # (p*p*C, D): patchify-matmul form of the stride-p conv.
            "kernel": _trunc_normal(kpe, (patch_dim, D)),
            "bias": zeros((D,)),
        },
        "cls_token": _trunc_normal(kcls, (1, 1, D)),
        "pos_embed": _trunc_normal(kpos, (1, cfg.num_patches + 1, D)),
        "blocks": {
            "norm1": {"scale": ones((L, D)), "bias": zeros((L, D))},
            "attn": {
                "qkv": {
                    "kernel": _trunc_normal(kqkv, (L, D, 3 * D)),
                    "bias": zeros((L, 3 * D)),
                },
                "proj": {
                    "kernel": _trunc_normal(kproj, (L, D, D)),
                    "bias": zeros((L, D)),
                },
            },
            "norm2": {"scale": ones((L, D)), "bias": zeros((L, D))},
            "mlp": {
                "fc1": {
                    "kernel": _trunc_normal(kfc1, (L, D, cfg.mlp_dim)),
                    "bias": zeros((L, cfg.mlp_dim)),
                },
                "fc2": {
                    "kernel": _trunc_normal(kfc2, (L, cfg.mlp_dim, D)),
                    "bias": zeros((L, D)),
                },
            },
        },
        "norm": {"scale": ones((D,)), "bias": zeros((D,))},
    }
    return params


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------


def layer_norm(x, scale, bias, eps):
    """LayerNorm with float32 statistics."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale + bias
    return y.astype(x.dtype)


def patchify(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H//p * W//p, p*p*C) with (ph, pw, c) inner order.

    Non-divisible H/W are truncated to the grid — same semantics as the
    reference's stride-p conv PatchEmbed, which drops remainder pixels
    (needed for the 164/124/84 px multi-crop sizes at patch 8)."""
    B, H, W, C = x.shape
    gh, gw = H // patch, W // patch
    x = x[:, : gh * patch, : gw * patch, :]
    x = x.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, gh, gw, ph, pw, C
    return x.reshape(B, gh * gw, patch * patch * C)


def _torch_bicubic_matrix(in_size: int, out_size: int, scale: float):
    """1-D resize weight matrix (out_size, in_size) reproducing torch
    ``F.interpolate(mode='bicubic', align_corners=False)`` with a
    user-provided ``scale_factor`` (ATen upsample_bicubic2d): source
    coordinate ``x = (i + 0.5)/scale - 0.5``, cubic-convolution kernel with
    A = -0.75, taps edge-clamped, no weight renormalization, no antialias.

    Built with numpy at trace time (static shapes) so the resize itself is
    two dense matmuls — no gather, MXU-friendly.
    """
    import numpy as np

    a = -0.75
    xs = (np.arange(out_size, dtype=np.float64) + 0.5) / scale - 0.5
    i0 = np.floor(xs)
    t = xs - i0

    def k_inner(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def k_outer(x):  # 1 < |x| < 2
        return (((x - 5.0) * x + 8.0) * x - 4.0) * a

    taps = np.stack(
        [k_outer(t + 1.0), k_inner(t), k_inner(1.0 - t), k_outer(2.0 - t)], 0
    )  # (4, out)
    W = np.zeros((out_size, in_size), np.float64)
    rows = np.arange(out_size)
    for j in range(4):
        idx = np.clip(i0.astype(np.int64) - 1 + j, 0, in_size - 1)
        np.add.at(W, (rows, idx), taps[j])
    return W.astype(np.float32)


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, grid_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Bicubic-resize the patch position embeddings to a new grid.

    Parity with reference ``interpolate_pos_encoding``
    (``vision_transformer.py:174-194``): CLS pos kept as-is, patch pos
    embeddings treated as a (g, g, D) image and resized with the exact
    torch bicubic semantics the reference uses — including its
    ``scale_factor=(g_new + 0.1)/g_old`` fudge — via
    :func:`_torch_bicubic_matrix` (verified against ``F.interpolate`` in
    tests/test_vit.py::test_pos_embed_interpolation_matches_torch).
    """
    gh, gw = grid_hw
    _, n_plus_1, dim = pos_embed.shape
    n = n_plus_1 - 1
    g0 = int(math.sqrt(n))
    if (gh, gw) == (g0, g0):
        return pos_embed
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:].reshape(g0, g0, dim).astype(jnp.float32)
    wh = jnp.asarray(_torch_bicubic_matrix(g0, gh, (gh + 0.1) / g0))
    ww = jnp.asarray(_torch_bicubic_matrix(g0, gw, (gw + 0.1) / g0))
    patch_pos = jnp.einsum("hi,ijd->hjd", wh, patch_pos)
    patch_pos = jnp.einsum("wj,hjd->hwd", ww, patch_pos)
    patch_pos = patch_pos.reshape(1, gh * gw, dim)
    return jnp.concatenate([cls_pos, patch_pos.astype(pos_embed.dtype)], axis=1)


def _attention(
    x, p_attn, num_heads, return_attn=False, impl="auto", n_valid=None,
    axis_name="seq", boundary=0,
):
    """MHSA. x: (B, N, D) in compute dtype. Flash attention on TPU unless
    attention probabilities are requested (visualization path)."""
    from dinomc_tpu.ops.attention import dense_attention, mha

    B, N, D = x.shape
    h = num_heads
    hd = D // h
    qkv = jnp.einsum("bnd,de->bne", x, p_attn["qkv"]["kernel"].astype(x.dtype))
    qkv = qkv + p_attn["qkv"]["bias"].astype(x.dtype)
    from jax.ad_checkpoint import checkpoint_name

    # named so remat_policy='qkv+attn' can save it (identity otherwise)
    qkv = checkpoint_name(qkv, "qkv")
    qkv = qkv.reshape(B, N, 3, h, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, h, hd)
    scale = 1.0 / math.sqrt(hd)
    if return_attn:
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * scale
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(x.dtype), v)
    else:
        attn = None
        out = mha(
            q, k, v, scale, impl=impl, axis_name=axis_name, n_valid=n_valid,
            boundary=boundary,
        )
        out = checkpoint_name(out, "attn_out")
    out = out.reshape(B, N, D)
    out = jnp.einsum("bnd,de->bne", out, p_attn["proj"]["kernel"].astype(x.dtype))
    out = out + p_attn["proj"]["bias"].astype(x.dtype)
    if return_attn:
        return out, attn
    return out, None


def _mlp(x, p_mlp, gelu_approx=True, impl="dense"):
    if impl == "fused":
        # One VMEM pass for fc1+GELU+fc2 — skips the (B*N, 4D) hidden
        # activation's HBM round trip (ops/pallas/fused_mlp.py).
        from dinomc_tpu.ops.pallas.fused_mlp import fused_mlp

        B, N, D = x.shape
        y = fused_mlp(
            x.reshape(B * N, D),
            p_mlp["fc1"]["kernel"].astype(x.dtype),
            p_mlp["fc1"]["bias"].astype(x.dtype),
            p_mlp["fc2"]["kernel"].astype(x.dtype),
            p_mlp["fc2"]["bias"].astype(x.dtype),
            approx=gelu_approx,
        )
        return y.reshape(B, N, D)
    from jax.ad_checkpoint import checkpoint_name

    y = jnp.einsum("bnd,df->bnf", x, p_mlp["fc1"]["kernel"].astype(x.dtype))
    y = y + p_mlp["fc1"]["bias"].astype(x.dtype)
    y = jax.nn.gelu(y, approximate=gelu_approx)
    # named so remat_policy='attn+mlp' can save it (identity otherwise)
    y = checkpoint_name(y, "mlp_h")
    y = jnp.einsum("bnf,fd->bnd", y, p_mlp["fc2"]["kernel"].astype(x.dtype))
    y = y + p_mlp["fc2"]["bias"].astype(x.dtype)
    return y


def _drop_path(x, keep, mask, boundary=0):
    """Per-sample stochastic depth (reference ``vision_transformer.py:27-46``).
    ``mask`` is a precomputed (B,) keep-decision; scaling by 1/keep preserves
    the expectation.

    Crop packing: when ``boundary`` is nonzero ``mask`` is (B, 2) — one
    independent keep-decision per packed segment, so the two crops sharing
    a sequence are regularized exactly as if run in separate forwards."""
    if boundary:
        tok = jnp.arange(x.shape[1])[None, :]  # (1, N)
        m = jnp.where(tok < boundary, mask[:, :1], mask[:, 1:])[..., None]
    else:
        m = mask.reshape((x.shape[0],) + (1,) * (x.ndim - 1))
    scale = (1.0 / keep).astype(x.dtype)
    return jnp.where(m, x * scale, jnp.zeros_like(x))


def _block(x, bp, cfg: ViTConfig, dp_keep, dp_masks, deterministic):
    """One pre-norm transformer block. bp leaves have NO layer axis here.
    dp_masks: (2, B) bool keep-decisions for the two residual branches."""
    eps = cfg.layernorm_eps
    y = layer_norm(x, bp["norm1"]["scale"], bp["norm1"]["bias"], eps)
    y, _ = _attention(
        y, bp["attn"], cfg.num_heads, impl=cfg.attn_impl,
        n_valid=cfg.attn_n_valid, axis_name=cfg.attn_axis,
        boundary=cfg.attn_boundary,
    )
    if not deterministic:
        y = _drop_path(y, dp_keep, dp_masks[0], cfg.attn_boundary)
    x = x + y
    y = layer_norm(x, bp["norm2"]["scale"], bp["norm2"]["bias"], eps)
    y = _mlp(y, bp["mlp"], cfg.gelu_approx, cfg.mlp_impl)
    if not deterministic:
        y = _drop_path(y, dp_keep, dp_masks[1], cfg.attn_boundary)
    x = x + y
    return x


def prepare_tokens(params: Params, x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """Patchify + project + cls + interpolated pos embed. x: (B, H, W, C)."""
    B, H, W, _ = x.shape
    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    dt = cfg.compute_dtype
    tokens = patchify(x.astype(dt), cfg.patch_size)
    tokens = jnp.einsum(
        "bnp,pd->bnd", tokens, params["patch_embed"]["kernel"].astype(dt)
    )
    tokens = tokens + params["patch_embed"]["bias"].astype(dt)
    cls = jnp.broadcast_to(params["cls_token"].astype(dt), (B, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    pos = interpolate_pos_embed(params["pos_embed"], (gh, gw))
    return tokens + pos.astype(dt)


def _remat_block(block_fn, policy: str):
    """Wrap a block function in ``jax.checkpoint`` under the named
    saved-activation policy (measured trade-offs in ViTConfig.remat_policy).
    Shared by the per-bucket scan and the merged-bucket scan."""
    if policy == "dots":
        return jax.checkpoint(
            block_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    if policy == "dots+attn":
        # additionally save the attention kernel's output — without it
        # the backward re-runs the whole fused attention forward just to
        # rebuild the proj matmul's input
        return jax.checkpoint(
            block_fn,
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names("attn_out"),
            ),
        )
    if policy == "attn":
        # save ONLY the attention kernel output: backward still redoes
        # the qkv/mlp matmuls but skips the fused-attention forward
        # (the most expensive single recompute); tiny HBM cost (D/token)
        return jax.checkpoint(
            block_fn,
            policy=jax.checkpoint_policies.save_only_these_names("attn_out"),
        )
    if policy == "attn+mlp":
        # save the attention output AND the GELU'd MLP hidden: backward
        # additionally skips the fc1 matmul + GELU recompute (the
        # largest single linear recompute, 4D^2/token) at 4D/token/layer
        # of HBM — the throughput/memory point between 'attn' and 'dots'
        return jax.checkpoint(
            block_fn,
            policy=jax.checkpoint_policies.save_only_these_names(
                "attn_out", "mlp_h"
            ),
        )
    if policy == "qkv+attn":
        # save qkv + attention output: backward skips the qkv matmul AND
        # the fused-attention forward (its VJP residuals q,k,v reshape
        # straight out of the saved qkv); recomputes only layernorms and
        # the MLP. 4D/token/layer of HBM — the middle ground between
        # 'full' (min memory) and 'dots' (saves every matmul)
        return jax.checkpoint(
            block_fn,
            policy=jax.checkpoint_policies.save_only_these_names(
                "qkv", "attn_out"
            ),
        )
    if policy == "qkv+attn+mlp":
        # save qkv + attention output + GELU'd MLP hidden: backward
        # recomputes only the layernorms. 8D/token/layer of HBM — viable
        # at the small bench-optimal batches where HBM pressure is low.
        return jax.checkpoint(
            block_fn,
            policy=jax.checkpoint_policies.save_only_these_names(
                "qkv", "attn_out", "mlp_h"
            ),
        )
    return jax.checkpoint(block_fn)


def _cast_blocks(params: Params, dt) -> Params:
    """Cast the stacked matmul weights to the compute dtype ONCE, outside
    the layer scan: the astype inside the body converts a fresh f32 slice
    from HBM every layer (~7 MB f32/layer for ViT-S), on every forward AND
    every remat recompute; converting the whole stacked tree up front
    halves that weight traffic. LayerNorm params stay f32 (their math is
    f32); elementwise-identical to the per-slice cast."""
    blocks = dict(params["blocks"])
    blocks["attn"] = jax.tree_util.tree_map(lambda a: a.astype(dt), blocks["attn"])
    blocks["mlp"] = jax.tree_util.tree_map(lambda a: a.astype(dt), blocks["mlp"])
    return blocks


def _scan_blocks(
    params: Params,
    tokens: jnp.ndarray,
    cfg: ViTConfig,
    rng: Optional[jax.Array],
    deterministic: bool,
    collect_intermediates: bool,
):
    """Run all blocks via lax.scan over the stacked layer axis."""
    L = cfg.depth
    dp_rates = jnp.linspace(0.0, cfg.drop_path_rate, L)
    dp_keeps = 1.0 - dp_rates
    # With crop packing each sample carries TWO independent keep-decisions
    # (one per packed segment) so regularization matches separate forwards.
    mshape = (L, 2, tokens.shape[0]) + ((2,) if cfg.attn_boundary else ())
    if rng is None or deterministic:
        # no stochastic depth without randomness: all-keep masks AND unit
        # keep-probabilities (else the 1/keep scale would inflate outputs)
        dp_masks = jnp.ones(mshape, jnp.bool_)
        dp_keeps = jnp.ones((L,), jnp.float32)
    else:
        # ONE bernoulli for every (layer, branch, sample) decision — doing
        # this inside the scan body cost 2 threefry calls per layer per crop.
        keep_p = dp_keeps.reshape((L, 1, 1) + ((1,) if cfg.attn_boundary else ()))
        dp_masks = jax.random.bernoulli(rng, keep_p, mshape)

    def block_fn(x, bp, keep, masks):
        return _block(x, bp, cfg, keep, masks, deterministic)

    if cfg.remat:
        block_fn = _remat_block(block_fn, cfg.remat_policy)

    def body(x, per_layer):
        bp, keep, masks = per_layer
        y = block_fn(x, bp, keep, masks)
        return y, (y if collect_intermediates else None)

    blocks = _cast_blocks(params, cfg.compute_dtype)
    out, inter = jax.lax.scan(body, tokens, (blocks, dp_keeps, dp_masks))
    return out, inter


def vit_forward(
    params: Params,
    x: jnp.ndarray,
    cfg: ViTConfig,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Full forward; returns the final-LN CLS token (B, D), float32.

    Parity: reference ``VisionTransformer.forward`` (``:209-216``).
    """
    tokens = prepare_tokens(params, x, cfg)
    out, _ = _scan_blocks(params, tokens, cfg, rng, deterministic, False)
    out = layer_norm(out, params["norm"]["scale"], params["norm"]["bias"], cfg.layernorm_eps)
    return out[:, 0].astype(jnp.float32)


def vit_forward_packed(
    params: Params,
    xa: jnp.ndarray,
    xb: jnp.ndarray,
    cfg: ViTConfig,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward TWO crop batches packed into one token sequence.

    Exactly equivalent to ``vit_forward(xa)`` + ``vit_forward(xb)``:
    attention is block-diagonal at the segment boundary (the kernel's
    static ``attn_boundary`` mask) and DropPath draws independent
    keep-decisions per segment. LayerNorm/MLP are token-pointwise, so
    packing is lossless while halving scan traversals and attention
    launches — measured −8.4% on the 6-local-crop fwd+bwd (v5e, B=24,
    pairs large+small to bound the masked cross-block waste).

    Returns (cls_a, cls_b), each (B, D) float32.
    """
    ta = prepare_tokens(params, xa, cfg)
    tb = prepare_tokens(params, xb, cfg)
    boundary = ta.shape[1]
    tokens = jnp.concatenate([ta, tb], axis=1)
    cfg_p = dataclasses.replace(cfg, attn_boundary=boundary)
    out, _ = _scan_blocks(params, tokens, cfg_p, rng, deterministic, False)
    out = layer_norm(out, params["norm"]["scale"], params["norm"]["bias"], cfg.layernorm_eps)
    return out[:, 0].astype(jnp.float32), out[:, boundary].astype(jnp.float32)


def _block_merged(x, bp, cfg: ViTConfig, segs, dp_keep, dp_masks,
                  deterministic):
    """One pre-norm block over the MERGED token stream x: (M, D).

    All dense matmuls (qkv / proj / fc1 / fc2) and LayerNorms run on the
    full (M, D) stream — ONE large-M GEMM each instead of one per crop
    bucket; attention alone is per bucket (static row slices of the merged
    qkv). ``segs``: static list of (offset, B_i, N_i). ``dp_masks``:
    (2, M) bool keep-decisions, already broadcast per token.
    """
    from jax.ad_checkpoint import checkpoint_name

    from dinomc_tpu.ops.attention import mha

    eps = cfg.layernorm_eps
    D = x.shape[-1]
    h = cfg.num_heads
    hd = D // h
    scale = 1.0 / math.sqrt(hd)

    def drop(y, mask):
        if deterministic:
            return y
        s = (1.0 / dp_keep).astype(y.dtype)
        return jnp.where(mask[:, None], y * s, jnp.zeros_like(y))

    y = layer_norm(x, bp["norm1"]["scale"], bp["norm1"]["bias"], eps)
    qkv = y @ bp["attn"]["qkv"]["kernel"] + bp["attn"]["qkv"]["bias"]
    qkv = checkpoint_name(qkv, "qkv")  # (M, 3D)
    outs = []
    for off, bi, ni in segs:
        s = jax.lax.slice_in_dim(qkv, off, off + bi * ni, axis=0)
        s = s.reshape(bi, ni, 3, h, hd)
        o = mha(s[:, :, 0], s[:, :, 1], s[:, :, 2], scale, impl=cfg.attn_impl)
        outs.append(o.reshape(bi * ni, D))
    a = jnp.concatenate(outs, axis=0)
    a = checkpoint_name(a, "attn_out")
    a = a @ bp["attn"]["proj"]["kernel"] + bp["attn"]["proj"]["bias"]
    x = x + drop(a, dp_masks[0])

    y = layer_norm(x, bp["norm2"]["scale"], bp["norm2"]["bias"], eps)
    hdn = y @ bp["mlp"]["fc1"]["kernel"] + bp["mlp"]["fc1"]["bias"]
    hdn = jax.nn.gelu(hdn, approximate=cfg.gelu_approx)
    hdn = checkpoint_name(hdn, "mlp_h")
    y = hdn @ bp["mlp"]["fc2"]["kernel"] + bp["mlp"]["fc2"]["bias"]
    return x + drop(y, dp_masks[1])


def vit_forward_multi(
    params: Params,
    xs: Sequence[jnp.ndarray],
    cfg: ViTConfig,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Tuple[jnp.ndarray, ...]:
    """Forward ANY number of crop batches with all dense GEMMs merged.

    The multi-crop student step runs 7-8 crop programs whose per-bucket
    GEMMs sit at M = B·N ≈ 2-16k rows, where v5e bf16 GEMM efficiency is
    ~half its M ≥ 28k level (measured: 6.3 → 35.6 TF/s going M 7.9k → 56k,
    docs/performance.md). Here every bucket's tokens are flattened into one
    (M, D) stream so qkv / proj / fc1 / fc2 each run as a single merged
    GEMM per layer inside one ``lax.scan``; only the O(N²) attention is
    sliced back per bucket (static row slices — no gather).

    Exactly equivalent to ``vit_forward`` per bucket: every dense op is
    token-pointwise or row-independent, attention sees exactly its own
    bucket's rows, and DropPath draws independent per-(bucket, sample)
    decisions. Returns one (B_i, D) float32 CLS embedding per input.

    Parity: reference ``MultiCropWrapper`` (``utils/utils.py:611-646``)
    semantics — which runs one forward per resolution — re-designed so the
    MXU sees one large GEMM instead of many small ones.
    """
    assert xs, "need at least one crop batch"
    D = cfg.embed_dim
    dt = cfg.compute_dtype
    L = cfg.depth

    toks, segs, off = [], [], 0
    for x in xs:
        t = prepare_tokens(params, x, cfg)  # (B_i, N_i, D)
        bi, ni = t.shape[0], t.shape[1]
        toks.append(t.reshape(bi * ni, D))
        segs.append((off, bi, ni))
        off += bi * ni
    merged = jnp.concatenate(toks, axis=0)  # (M, D)
    M = off
    segs = tuple(segs)

    dp_rates = jnp.linspace(0.0, cfg.drop_path_rate, L)
    dp_keeps = 1.0 - dp_rates
    if rng is None or deterministic:
        dp_masks = jnp.ones((L, 2, M), jnp.bool_)
        dp_keeps = jnp.ones((L,), jnp.float32)
    else:
        # one bernoulli per (layer, branch, bucket, sample), broadcast over
        # that sample's N_i tokens — identical regularization to separate
        # per-bucket forwards
        parts = []
        for i, (_, bi, ni) in enumerate(segs):
            m = jax.random.bernoulli(
                jax.random.fold_in(rng, i),
                dp_keeps.reshape(L, 1, 1),
                (L, 2, bi),
            )
            parts.append(jnp.repeat(m, ni, axis=2))
        dp_masks = jnp.concatenate(parts, axis=2)  # (L, 2, M)

    def block_fn(x, bp, keep, masks):
        return _block_merged(x, bp, cfg, segs, keep, masks, deterministic)

    if cfg.remat:
        block_fn = _remat_block(block_fn, cfg.remat_policy)

    def body(x, per_layer):
        bp, keep, masks = per_layer
        return block_fn(x, bp, keep, masks), None

    blocks = _cast_blocks(params, dt)
    out, _ = jax.lax.scan(body, merged, (blocks, dp_keeps, dp_masks))
    out = layer_norm(
        out, params["norm"]["scale"], params["norm"]["bias"], cfg.layernorm_eps
    )
    return tuple(
        jax.lax.slice_in_dim(out, off, off + bi * ni, axis=0)
        .reshape(bi, ni, D)[:, 0]
        .astype(jnp.float32)
        for off, bi, ni in segs
    )


def vit_intermediate_layers(
    params: Params,
    x: jnp.ndarray,
    cfg: ViTConfig,
    out_indices: Sequence[int] = (3, 5, 7, 11),
    apply_norm: bool = True,
) -> jnp.ndarray:
    """Token maps from selected blocks, final-LN applied.

    Returns (len(out_indices), B, N+1, D) float32. Parity:
    ``get_intermediate_layers`` (``vision_transformer.py:227-235``) as used
    by ``DinoMCBackbone`` (``models/networks.py:208-241``).
    """
    tokens = prepare_tokens(params, x, cfg)
    _, inter = _scan_blocks(params, tokens, cfg, None, True, True)
    taps = inter[jnp.asarray(out_indices)]
    if apply_norm:
        taps = layer_norm(
            taps, params["norm"]["scale"], params["norm"]["bias"], cfg.layernorm_eps
        )
    return taps.astype(jnp.float32)


def vit_forward_sp(
    params: Params,
    x: jnp.ndarray,
    cfg: ViTConfig,
    mesh,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    out_indices: Optional[Sequence[int]] = None,
    apply_norm: bool = True,
    seq_axis: str = "seq",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Sequence-parallel ViT forward: tokens sharded over the ``seq`` mesh
    axis, attention via ring attention (``ops/ring_attention.py``).

    This is the context-parallel path the survey reserved the ``seq`` axis
    for (SURVEY.md §5.7): the 512 px / patch-8 segmentation input is 4097
    tokens, and with n_seq chips each holds ~4097/n tokens while K/V blocks
    rotate over ICI. Inside the blocks, LayerNorm/MLP are token-pointwise
    and need no communication; only attention crosses shards. Patchify +
    patch projection + pos-embed (``prepare_tokens``) run replicated BEFORE
    the token scatter — they are ~4% of total FLOPs (1 matmul vs 12 blocks
    of 6), and keeping them outside ``shard_map`` avoids special-casing the
    CLS token across shard boundaries; shard them too if profiling a much
    deeper model says otherwise.

    ``out_indices=None`` returns the final-LN CLS token (B, D) f32 — same
    contract as ``vit_forward``. Otherwise returns
    (len(out_indices), B, N+1, D) f32 — same contract as
    ``vit_intermediate_layers`` (the UPerNet feature source).

    ``batch_axis`` optionally also shards the batch dim (compose dp x sp);
    params and rng are replicated, so per-sample DropPath decisions agree
    across token shards by construction.
    """
    from jax.sharding import PartitionSpec as P

    n_seq = mesh.shape[seq_axis]
    tokens = prepare_tokens(params, x, cfg)  # (B, N+1, D)
    N1 = tokens.shape[1]
    Np = -(-N1 // n_seq) * n_seq
    if Np != N1:
        tokens = jnp.pad(tokens, ((0, 0), (0, Np - N1), (0, 0)))
    cfg_sp = dataclasses.replace(
        cfg, attn_impl="ring", attn_n_valid=N1 if Np != N1 else None,
        attn_axis=seq_axis,
    )
    collect = out_indices is not None

    tok_spec = P(batch_axis, seq_axis, None)
    # None can't travel through shard_map in_specs; fold the no-rng case
    # into a dummy key + deterministic=True (same no-stochastic-depth path).
    deterministic = deterministic or rng is None
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def body(blocks_params, norm_params, tok_local, body_rng):
        if batch_axis is not None:
            # decorrelate DropPath across batch shards; constant over the
            # seq axis so token shards of one sample still agree
            body_rng = jax.random.fold_in(body_rng, jax.lax.axis_index(batch_axis))
        out, inter = _scan_blocks(
            {"blocks": blocks_params}, tok_local, cfg_sp, body_rng, deterministic,
            collect,
        )
        if collect:
            taps = inter[jnp.asarray(out_indices)]
            if apply_norm:
                taps = layer_norm(
                    taps, norm_params["scale"], norm_params["bias"], cfg.layernorm_eps
                )
            return taps.astype(jnp.float32)
        out = layer_norm(
            out, norm_params["scale"], norm_params["bias"], cfg.layernorm_eps
        )
        return out.astype(jnp.float32)

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), tok_spec, P()),
        out_specs=(P(None, batch_axis, seq_axis, None) if collect else tok_spec),
        check_vma=False,
    )
    out = sharded(params["blocks"], params["norm"], tokens, rng)
    if collect:
        return out[:, :, :N1]
    return out[:, 0]


def vit_last_selfattention(
    params: Params, x: jnp.ndarray, cfg: ViTConfig
) -> jnp.ndarray:
    """Attention map of the last block: (B, heads, N+1, N+1) float32.

    Parity: ``get_last_selfattention`` (``vision_transformer.py:218-225``),
    used by the attention-video generator.
    """
    tokens = prepare_tokens(params, x, cfg)
    L = cfg.depth
    # Run first L-1 blocks via scan, then the last block capturing attention.
    first = jax.tree_util.tree_map(lambda a: a[: L - 1], params["blocks"])
    last = jax.tree_util.tree_map(lambda a: a[L - 1], params["blocks"])
    sub_cfg = dataclasses.replace(cfg, depth=L - 1, drop_path_rate=0.0)
    out, _ = _scan_blocks({"blocks": first}, tokens, sub_cfg, None, True, False)
    y = layer_norm(out, last["norm1"]["scale"], last["norm1"]["bias"], cfg.layernorm_eps)
    _, attn = _attention(y, last["attn"], cfg.num_heads, return_attn=True)
    return attn.astype(jnp.float32)
