"""Fused VMEM-resident attention kernel (Pallas, TPU).

Motivation (measured on v5e): the ViT-S/8 global view is N=785 tokens.
Dense attention materializes the (N, N) f32 logits/probs in HBM —
~3.7 GB of traffic per layer at B=64 — and runs at ~7 ms/layer,
bandwidth-bound. The stock long-sequence flash kernel is slower still at
these shapes (13.8 ms fwd). But at N <= ~1024 the ENTIRE per-(batch, head)
attention — Q, K, V, the f32 score matrix, and the output — fits in one
core's 16 MB VMEM. This kernel exploits that: grid over (batch*heads,),
one program computes softmax(QK^T)V wholly on-chip; HBM traffic collapses
to the Q/K/V/O tensors themselves (~0.5 KB/token/head).

The backward pass is a second kernel (custom VJP) that recomputes the
probabilities in VMEM and emits dQ, dK, dV — no residuals beyond the
inputs, which also composes perfectly with the layer-scan remat.

Padding: N is padded to a multiple of 128; padded KEY columns are masked
to -inf before the softmax (exact), padded QUERY rows compute garbage that
the caller slices off. Longer sequences (e.g. 4097-token 512 px
segmentation inputs) dispatch to the stock flash kernel instead
(ops/attention.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# Above this padded length the f32 score matrix no longer fits VMEM
# comfortably alongside the bwd temporaries; callers should use the
# long-sequence flash kernel instead.
MAX_FUSED_LEN = 1024


def _pad_len(n: int) -> int:
    return -(-n // LANE) * LANE


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    q = q_ref[0]  # (Np, d) bf16
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Np, Np) f32, entirely in VMEM
    Np = s.shape[-1]
    if n_valid < Np:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale: float, n_valid: int
):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    # recompute probabilities (flash-style: nothing saved from fwd)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    Np = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    if n_valid < Np:
        s = jnp.where(col < n_valid, s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.float32)

    # padded query rows would inject garbage into dK/dV: zero their probs
    if n_valid < Np:
        row = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
        p = jnp.where(row < n_valid, p, 0.0)

    pb = p.astype(q.dtype)
    dv = jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Np, d)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Np, Np)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale  # (Np, Np) f32
    dsb = ds.astype(q.dtype)
    dq = jax.lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(Np: int, d: int, n: int):
    return [
        pl.BlockSpec((1, Np, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(n)
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_attention(q, k, v, scale: float, n_valid: int):
    """q, k, v: (BH, Np, d) bf16 -> (BH, Np, d)."""
    BH, Np, d = q.shape
    kern = functools.partial(_fwd_kernel, scale=scale, n_valid=n_valid)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(BH,),
        in_specs=_specs(Np, d, 3),
        out_specs=_specs(Np, d, 1)[0],
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Np * Np * d,
            bytes_accessed=4 * BH * Np * d * 2,
            transcendentals=BH * Np * Np,
        ),
    )(q, k, v)


def _fused_fwd(q, k, v, scale, n_valid):
    return _fused_attention(q, k, v, scale, n_valid), (q, k, v)


def _fused_bwd(scale, n_valid, res, do):
    q, k, v = res
    BH, Np, d = q.shape
    kern = functools.partial(_bwd_kernel, scale=scale, n_valid=n_valid)
    dq, dk, dv = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        grid=(BH,),
        in_specs=_specs(Np, d, 4),
        out_specs=_specs(Np, d, 3),
        cost_estimate=pl.CostEstimate(
            flops=10 * BH * Np * Np * d,
            bytes_accessed=7 * BH * Np * d * 2,
            transcendentals=BH * Np * Np,
        ),
    )(q, k, v, do.astype(q.dtype))
    return dq, dk, dv


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


def fused_mha(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """Multi-head attention over (B, N, h, d); N may be arbitrary (padded
    internally). Requires padded N <= MAX_FUSED_LEN."""
    B, N, h, d = q.shape
    Np = _pad_len(N)
    assert Np <= MAX_FUSED_LEN, f"sequence {N} too long for the fused kernel"

    def fold(x):
        x = jnp.swapaxes(x, 1, 2).reshape(B * h, N, d)
        if Np != N:
            x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
        return x

    out = _fused_attention(fold(q), fold(k), fold(v), float(scale), N)
    out = out[:, :N].reshape(B, h, N, d)
    return jnp.swapaxes(out, 1, 2)
