"""Chunked-query attention kernel for mid-length sequences (Pallas, TPU).

Covers the gap between the short-sequence fused kernel
(ops/pallas/attention.py, padded N <= 1024: everything VMEM-resident) and
true long-sequence flash attention: at the segmentation path's 512 px
inputs (4097 tokens -> padded 4224, SURVEY.md §5.7) the full (N, N) score
matrix no longer fits VMEM, but one 128-lane feature block of K and V
(N x 128, ~1 MB each at N=4224) still does.

The stock flash kernel streams K/V blocks through VMEM once per QUERY
block with an online softmax — K/V HBM traffic is multiplied by the
number of query blocks (33x at N=4224). Here the grid is
(batch, feature_block, query_block) with the query block innermost and
K/V block specs independent of it, so Pallas keeps each (N, 128) K/V
block resident across the whole query sweep: K/V are read from HBM once,
and each 128-row query chunk computes its EXACT softmax over the full key
axis in one pass (a 128 x N f32 score tile fits VMEM easily) — no online
rescaling, fewer VPU passes.

The backward is two kernels with the same residency trick (custom VJP,
recompute-based, no saved probabilities — composes with the layer-scan
remat exactly like the short kernel):
  - dQ: grid (B, F, NQ); per query chunk recompute P, dS; K/V resident.
  - dK/dV: same grid; dK/dV are (N, 128) output blocks whose index map is
    independent of the query-chunk axis, so they stay resident in VMEM as
    f32 accumulators across the query sweep (initialized at chunk 0).

Reference behavior replaced: the torch path at these shapes is the dense
``softmax(QK^T)V`` of ``utils/vision_transformer.py:80-92``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
QBLK = 128
# Resident (N, 128) K/V blocks + f32 dK/dV accumulators + f32 score chunks
# exceed Mosaic's default 16 MB scoped-VMEM budget at N~4k; the chip has
# 128 MB, so raise the cap for these kernels (working set <=32 MB at the
# MAX_LONG_LEN dispatch bound).
_VMEM_LIMIT = 64 * 1024 * 1024
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _head_slices(d: int):
    return [slice(j * d, (j + 1) * d) for j in range(LANE // d)]


def _probs_chunk(q, k, scale, n_valid):
    """(QBLK, d) x (N, d) -> (QBLK, N) exact masked softmax, f32."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if n_valid < s.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, d):
    for sl in _head_slices(d):
        p = _probs_chunk(q_ref[0][:, sl], k_ref[0][:, sl], scale, n_valid)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p.astype(q_ref.dtype), v_ref[0][:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, *, scale, n_valid, d):
    for sl in _head_slices(d):
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        p = _probs_chunk(q, k, scale, n_valid)
        dp = jax.lax.dot_general(
            do_ref[0][:, sl], v_ref[0][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq_ref[0, :, sl] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, dk_ref, dv_ref, *, scale, n_valid, d, q_rows
):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    row0 = iq * QBLK
    for sl in _head_slices(d):
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        do = do_ref[0][:, sl]
        p = _probs_chunk(q, k, scale, n_valid)
        # mask padded QUERY rows: they would inject garbage into dK/dV
        row = row0 + jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
        p = jnp.where(row < q_rows, p, 0.0)
        dp = jax.lax.dot_general(
            do, v_ref[0][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dv_ref[0, :, sl] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dk_ref[0, :, sl] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)


def _q_spec(Np: int):
    return pl.BlockSpec(
        (1, QBLK, LANE), lambda b, f, iq: (b, iq, f), memory_space=pltpu.VMEM
    )


def _kv_spec(Np: int):
    # index map independent of iq -> block stays VMEM-resident across the
    # query sweep (Pallas skips the HBM copy when the block index repeats)
    return pl.BlockSpec(
        (1, Np, LANE), lambda b, f, iq: (b, 0, f), memory_space=pltpu.VMEM
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _long_attention(q, k, v, scale: float, n_valid: int, d: int):
    """q, k, v: (B, Np, F) with Np a multiple of QBLK, F a multiple of 128."""
    B, Np, F = q.shape
    kern = functools.partial(_fwd_kernel, scale=scale, n_valid=n_valid, d=d)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, F // LANE, Np // QBLK),
        in_specs=[_q_spec(Np), _kv_spec(Np), _kv_spec(Np)],
        out_specs=_q_spec(Np),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * (F // d) * Np * Np * d,
            bytes_accessed=4 * B * Np * F * 2,
            transcendentals=B * (F // d) * Np * Np,
        ),
        compiler_params=_PARAMS,
    )(q, k, v)


def _long_fwd(q, k, v, scale, n_valid, d):
    return _long_attention(q, k, v, scale, n_valid, d), (q, k, v)


def _long_bwd(scale, n_valid, d, res, do):
    q, k, v = res
    B, Np, F = q.shape
    do = do.astype(q.dtype)
    grid = (B, F // LANE, Np // QBLK)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, n_valid=n_valid, d=d),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[_q_spec(Np), _kv_spec(Np), _kv_spec(Np), _q_spec(Np)],
        out_specs=_q_spec(Np),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * (F // d) * Np * Np * d,
            bytes_accessed=5 * B * Np * F * 2,
            transcendentals=B * (F // d) * Np * Np,
        ),
        compiler_params=_PARAMS,
    )(q, k, v, do)
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, n_valid=n_valid, d=d, q_rows=n_valid
        ),
        out_shape=[jax.ShapeDtypeStruct(q.shape, jnp.float32)] * 2,
        grid=grid,
        in_specs=[_q_spec(Np), _kv_spec(Np), _kv_spec(Np), _q_spec(Np)],
        out_specs=[_kv_spec(Np)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=8 * B * (F // d) * Np * Np * d,
            bytes_accessed=6 * B * Np * F * 2,
            transcendentals=B * (F // d) * Np * Np,
        ),
        compiler_params=_PARAMS,
    )(q, k, v, do)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_long_attention.defvjp(_long_fwd, _long_bwd)


def long_mha(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """Multi-head attention over (B, N, h, d) for mid-length N (~1k-8k).

    Pads N to the 128-row query-chunk grid and h*d to 128 lanes; padded
    keys are masked exactly, padded query rows are sliced off. d must
    divide 128."""
    B, N, h, d = q.shape
    assert LANE % d == 0, f"head_dim {d} must divide {LANE}"
    Np = _pad_to(N, QBLK)
    F = _pad_to(h * d, LANE)

    def prep(x):
        x = x.reshape(B, N, h * d)
        return jnp.pad(x, ((0, 0), (0, Np - N), (0, F - h * d)))

    out = _long_attention(prep(q), prep(k), prep(v), float(scale), N, d)
    return out[:, :N, : h * d].reshape(B, N, h, d)
