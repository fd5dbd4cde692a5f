"""Multi-head attention dispatch: Pallas flash attention on TPU, dense
fallback elsewhere.

Why: the reference's dense ``softmax(QK^T)V`` (``vision_transformer.py:80-92``)
materializes an (N, N) probability tensor per head — at ViT-S/8 global
crops that is 785x785 in f32 per (batch, head, layer), ~1 GB of HBM
traffic per layer, which measured out at ~7% MFU for the plain forward.
Flash attention streams K/V blocks through VMEM with an online softmax and
never materializes N^2, which also unlocks the 4097-token 512px
segmentation inputs (SURVEY.md §5.7).

Sequence lengths are padded to the kernel's 128-token block size and
masked via SegmentIds (padding tokens get segment 0, real tokens 1), so
arbitrary token counts (111..4097 across the multi-crop sizes) are exact.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

_BLOCK = 128
# Above this padded length the chunked-query kernel's VMEM working set
# (resident K/V feature block + f32 dK/dV accumulators + score chunk) stops
# fitting; dispatch to the streaming flash kernel instead.
MAX_LONG_LEN = 5120


def _pad_len(n: int) -> int:
    return -(-n // _BLOCK) * _BLOCK


def dense_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    boundary: int = 0,
) -> jnp.ndarray:
    """(B, N, h, d) reference attention; f32 softmax.

    ``boundary`` (static): two-segment crop packing — tokens [0, boundary)
    and [boundary, N) are independent crops; attention is block-diagonal.
    """
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * scale
    if boundary:
        n = q.shape[1]
        same = (jnp.arange(n)[:, None] < boundary) == (jnp.arange(n)[None, :] < boundary)
        logits = jnp.where(same, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", probs.astype(q.dtype), v)


def flash_mha(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    boundary: int = 0,
) -> jnp.ndarray:
    """(B, N, h, d) -> (B, N, h, d) via the TPU flash-attention kernel.
    ``boundary``: static two-segment packing split (0 = one segment)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    B, N, h, d = q.shape
    Np = _pad_len(N)

    def to_bhnd(x):
        x = jnp.swapaxes(x, 1, 2)  # (B, h, N, d)
        if Np != N:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, Np - N), (0, 0)))
        return x

    qf, kf, vf = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    if Np != N or boundary:
        pos = jnp.arange(Np)
        seg = jnp.where(pos < N, 1, 0)
        if boundary:
            seg = jnp.where((pos >= boundary) & (pos < N), 2, seg)
        seg = seg.astype(jnp.int32)[None].repeat(B, 0)
        seg_ids = SegmentIds(q=seg, kv=seg)
    else:
        seg_ids = None
    out = flash_attention(qf, kf, vf, segment_ids=seg_ids, sm_scale=scale)
    out = jnp.swapaxes(out, 1, 2)[:, :N]
    return out.astype(q.dtype)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    impl: str = "auto",
    axis_name: str = "seq",
    n_valid: Optional[int] = None,
    boundary: int = 0,
) -> jnp.ndarray:
    """Multi-head attention over (B, N, heads, head_dim) tensors.

    impl: 'auto' (flash on TPU, dense elsewhere) | 'flash' | 'dense' |
    'ring' (sequence-parallel: q/k/v are per-shard slices inside a
    ``shard_map`` over ``axis_name``; ``n_valid`` masks padded tail keys).

    ``boundary`` (static): crop packing — the sequence holds two independent
    crops split at ``boundary`` and attention is block-diagonal (supported
    by fused/flash/dense; not ring).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if impl == "ring":
        if boundary:
            raise ValueError("crop packing (boundary) not supported with ring attention")
        from dinomc_tpu.ops.ring_attention import ring_attention

        return ring_attention(q, k, v, scale, axis_name, n_valid)
    if n_valid is not None:
        raise ValueError(
            f"n_valid(={n_valid}) masking is only implemented for impl='ring' "
            f"(got impl={impl!r}); fused/flash/dense would silently attend to "
            "padded-tail keys"
        )
    if impl == "auto":
        if jax.default_backend() == "tpu":
            from dinomc_tpu.ops.pallas.attention import MAX_FUSED_LEN, _pad_len

            np_ = _pad_len(q.shape[1])
            if np_ <= MAX_FUSED_LEN:
                impl = "fused"
            elif np_ <= MAX_LONG_LEN and not boundary:
                impl = "fused_long"
            else:
                impl = "flash"
        else:
            impl = "dense"
    if impl == "fused":
        from dinomc_tpu.ops.pallas.attention import fused_mha

        return fused_mha(q, k, v, scale, boundary)
    if impl == "fused_long":
        if boundary:
            raise ValueError("crop packing (boundary) not supported by fused_long")
        from dinomc_tpu.ops.pallas.attention_long import long_mha

        return long_mha(q, k, v, scale)
    if impl == "flash":
        return flash_mha(q, k, v, scale, boundary)
    return dense_attention(q, k, v, scale, boundary)
