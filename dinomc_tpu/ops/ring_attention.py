"""Ring attention: exact attention over a sequence sharded across chips.

The reference has no sequence/context parallelism — its attention is a
dense single-device ``softmax(QK^T)V`` (reference
``utils/vision_transformer.py:80-92``; SURVEY.md §5.7 records the absence).
This module provides the TPU-native capability the survey reserved the
``seq`` mesh axis for: the token axis lives sharded over ``seq``, and
attention is computed exactly with an online softmax while K/V blocks
rotate around the ring via ``jax.lax.ppermute`` — the ICI-native form of
blockwise/flash attention at inter-chip granularity (each chip's resident
block plays the role of one flash-attention tile).

Designed to run inside ``jax.shard_map`` over a mesh with a ``seq`` axis;
``models/vit.vit_forward_sp`` is the model-level entry point.

Memory: each ring step materializes only a (B, h, N_local, N_local) logit
block in f32 — N_global^2 / n_seq^2 per step instead of N_global^2.

Numerics: online softmax in f32 (running max / normalizer), output
accumulated in f32 and cast back to the input dtype — same accumulation
discipline as the single-chip Pallas kernels in ``ops/pallas/attention.py``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention(
    q: jnp.ndarray,  # (B, Nl, h, d) — LOCAL query shard
    k: jnp.ndarray,  # (B, Nl, h, d) — LOCAL key shard
    v: jnp.ndarray,  # (B, Nl, h, d) — LOCAL value shard
    scale: Optional[float] = None,
    axis_name: str = "seq",
    n_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Exact MHA where the token axis is sharded over ``axis_name``.

    Must be called inside ``shard_map`` (or ``vmap``-style SPMD context)
    where ``axis_name`` is bound. K/V blocks travel around the ring once;
    each step contributes its block to the online-softmax accumulators.

    ``n_valid``: number of REAL tokens in the global (unsharded) sequence.
    When the global length was padded up to a multiple of the ring size,
    pass the unpadded count — keys at global positions >= n_valid are
    masked out (queries in the padded tail produce well-defined garbage
    that the caller drops). ``None`` means every position is real.
    """
    B, Nl, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    n_ring = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)

    q32 = q.astype(jnp.float32) * scale

    # Online-softmax state.
    m = jnp.full((B, h, Nl), NEG_INF, jnp.float32)  # running row max
    l = jnp.zeros((B, h, Nl), jnp.float32)  # running normalizer
    o = jnp.zeros((B, Nl, h, d), jnp.float32)  # unnormalized output

    # Rotate K/V one hop per step: after s steps this chip holds the block
    # that started on ring position (my_idx - s) mod n_ring. The perm sends
    # shard i's block to shard i+1 so every chip sees every block exactly
    # once. n_ring is a static mesh dimension, so a Python loop unrolls into
    # a fixed ppermute chain XLA can pipeline against the matmuls.
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]
    for s in range(n_ring):
        src = (my_idx - s) % n_ring
        logits = jnp.einsum("bnhd,bmhd->bhnm", q32, k.astype(jnp.float32))
        if n_valid is not None:
            kpos = src * Nl + jnp.arange(Nl)
            logits = jnp.where(
                (kpos < n_valid)[None, None, None, :], logits, NEG_INF
            )
        blk_max = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m, blk_max)
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        l = l * corr + jnp.sum(p, axis=-1)
        o = o * corr.transpose(0, 2, 1)[..., None] + jnp.einsum(
            "bhnm,bmhd->bnhd", p, v.astype(jnp.float32)
        )
        m = m_new
        if s + 1 < n_ring:
            k = jax.lax.ppermute(k, axis_name, perm)
            v = jax.lax.ppermute(v, axis_name, perm)

    denom = jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
    return (o / denom).astype(q.dtype)
