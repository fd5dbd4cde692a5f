"""Fused transformer-MLP kernel (Pallas, TPU): x @ W1 + b1 -> GELU -> @ W2 + b2
in one VMEM pass.

VERDICT (measured on v5e, ViT-S shapes): SLOWER than XLA's unfused form —
teacher forward 30.7 -> 34.4 ms, full DINO bench 103.2 -> 98.0 img/s —
so ``ViTConfig.mlp_impl`` defaults to 'dense' and this kernel is an
explored variant, selectable but off. Per 512-row grid program the two
small dots (K=384) and the VPU GELU serialize, idling the MXU; XLA's
unfused form runs full-size matmuls near the matmul roofline and hides
the hidden activation's HBM round trip behind them. The hypothesis that
that round trip (~6 KB/token/layer; 12-layer MLP chain at ~72 TF/s vs a
155 TF/s ceiling) was the bottleneck did not survive contact with the
hardware.

Original motivation: XLA cannot fuse matmul -> matmul, so the unfused MLP
materializes the (B*N, 4D) hidden activation in HBM between fc1 and fc2.
Both weight matrices of a ViT-S MLP total 2.4 MB bf16 — they fit in VMEM
alongside a row-block of activations, so the whole fc1+GELU+fc2 pipeline
can run on-chip: HBM traffic collapses to the (B*N, D) input/output
tensors.

The kernel covers the FORWARD only. The backward (custom VJP) is plain
XLA ops mirroring autodiff of the unfused form — the backward's weight
gradients genuinely need the hidden activation as a matmul operand, so
fusing it buys nothing; recomputing u = x@W1+b1 once in the VJP costs the
same matmul XLA's remat would pay anyway.

Numerics: the hidden activation is accumulated and GELU'd in f32 inside
the kernel (the unfused bf16 path rounds u to bf16 before GELU — the
kernel is slightly MORE accurate, not less). GELU uses the same
tanh/erf choice as the unfused path (``ViTConfig.gelu_approx``).

Replaces (with the rest of the ViT stack) the reference's
``Mlp`` (``utils/vision_transformer.py:95-113``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BM = 512  # row block (tokens per grid program)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, approx):
    x = x_ref[...]  # (BM, D) compute dtype
    u = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    u = u + b1_ref[...].astype(jnp.float32)  # (BM, F) f32
    h = jax.nn.gelu(u, approximate=approx).astype(x.dtype)
    o = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (o + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_mlp(x, w1, b1, w2, b2, approx):
    """x: (M, D) with M a multiple of BM; weights (D, F), (F, D); biases
    (1, F), (1, D). All in the compute dtype."""
    M, D = x.shape
    F = w1.shape[1]
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, approx=approx),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        grid=(M // BM,),
        in_specs=[
            pl.BlockSpec((BM, D), lambda i: (i, 0)),
            const((D, F)),
            const((1, F)),
            const((F, D)),
            const((1, D)),
        ],
        out_specs=pl.BlockSpec((BM, D), lambda i: (i, 0)),
        cost_estimate=pl.CostEstimate(
            flops=4 * M * D * F,
            bytes_accessed=2 * (2 * M * D + 2 * D * F),
            transcendentals=M * F,
        ),
    )(x, w1, b1, w2, b2)


def _fused_fwd(x, w1, b1, w2, b2, approx):
    return _fused_mlp(x, w1, b1, w2, b2, approx), (x, w1, b1, w2)


def _fused_bwd(approx, res, do):
    # Plain-XLA mirror of autodiff through the unfused form; recomputes the
    # hidden activation (composes with the layer-scan remat, which would
    # recompute it anyway).
    x, w1, b1, w2 = res
    u = (jnp.dot(x, w1) + b1).astype(jnp.float32)
    h = jax.nn.gelu(u, approximate=approx)
    _, gelu_vjp = jax.vjp(lambda t: jax.nn.gelu(t, approximate=approx), u)
    dh = jnp.dot(do, w2.T).astype(jnp.float32)
    du = gelu_vjp(dh)[0].astype(x.dtype)
    dx = jnp.dot(du, w1.T)
    dw1 = jnp.dot(x.T, du)
    db1 = jnp.sum(du, axis=0, keepdims=True)
    hb = h.astype(x.dtype)
    dw2 = jnp.dot(hb.T, do)
    db2 = jnp.sum(do, axis=0, keepdims=True)
    return dx, dw1, db1, dw2, db2


_fused_mlp.defvjp(_fused_fwd, _fused_bwd)


def fused_mlp(
    x: jnp.ndarray,  # (M, D)
    w1: jnp.ndarray,  # (D, F)
    b1: jnp.ndarray,  # (F,)
    w2: jnp.ndarray,  # (F, D)
    b2: jnp.ndarray,  # (D,)
    approx: bool = True,
) -> jnp.ndarray:
    """Row-padded wrapper: any M; returns (M, D) in x.dtype."""
    M, D = x.shape
    Mp = -(-M // BM) * BM
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    out = _fused_mlp(x, w1, b1[None, :], w2, b2[None, :], approx)
    return out[:M] if Mp != M else out
