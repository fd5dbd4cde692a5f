"""Packed multi-window attention kernel vs the XLA einsum path.

The kernel (ops/pallas/window_attention.py) must be exactly equivalent —
modulo float roundoff — to per-window softmax(QK^T/sqrt(hd) + rel_bias +
shift/pad mask) V, the torchvision Swin semantics the XLA fallback in
models/swin.py implements. Runs in Pallas interpret mode on the CPU test
platform; f32 inputs for tight tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinomc_tpu.models import swin as sw
from dinomc_tpu.ops.pallas.window_attention import (
    packed_window_attention,
    pick_group,
)

W = 7
WW = W * W


def _xla_core(q, k, v, bias, mask):
    """The einsum window-attention core (no qkv/proj GEMMs)."""
    nB, ww, C = q.shape
    heads = bias.shape[0]
    hd = C // heads
    qh = q.reshape(nB, ww, heads, hd)
    kh = k.reshape(nB, ww, heads, hd)
    vh = v.reshape(nB, ww, heads, hd)
    logits = jnp.einsum("bnhd,bmhd->bhnm", qh, kh).astype(jnp.float32) / (hd**0.5)
    logits = logits + bias[None]
    if mask is not None:
        nW = mask.shape[0]
        m = jnp.asarray(mask)
        logits = logits.reshape(nB // nW, nW, heads, ww, ww) + m[:, None, :, :]
        logits = logits.reshape(nB, heads, ww, ww)
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", p, vh)
    return out.reshape(nB, ww, C)


def _data(key, nB, C, heads, mask_windows=None, shift=0):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (nB, WW, C), jnp.float32)
    k = jax.random.normal(ks[1], (nB, WW, C), jnp.float32)
    v = jax.random.normal(ks[2], (nB, WW, C), jnp.float32)
    bias = 0.1 * jax.random.normal(ks[3], (heads, WW, WW), jnp.float32)
    mask = None
    if mask_windows:
        side = int(round(mask_windows**0.5)) * W
        mask = sw._shift_mask(side, side, W, shift or 3)
        assert mask.shape[0] == mask_windows
    return q, k, v, bias, mask


CASES = [
    # (nB, C, heads, nW_mask, group)  — nW_mask None = unmasked
    (16, 96, 3, None, 4),     # plain, G | nB
    (16, 96, 3, 16, 4),       # masked, G | nW (within-image groups)
    (8, 192, 6, 4, 8),        # masked, nW | G (groups span images)
    (8, 768, 24, None, 8),    # stage-4 head count, head chunking
    (12, 96, 3, None, None),  # auto group pick
]


@pytest.mark.parametrize("variant", ["perhead", "stacked"])
@pytest.mark.parametrize("nB,C,heads,nW,group", CASES)
def test_forward_matches_xla(nB, C, heads, nW, group, variant):
    q, k, v, bias, mask = _data(jax.random.PRNGKey(0), nB, C, heads, nW)
    ref = _xla_core(q, k, v, bias, mask)
    out = packed_window_attention(
        q, k, v, bias, mask, heads, nW or nB, group=group, interpret=True,
        variant=variant,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("variant", ["perhead", "stacked"])
@pytest.mark.parametrize("nB,C,heads,nW,group", CASES[:3])
def test_grads_match_xla(nB, C, heads, nW, group, variant):
    q, k, v, bias, mask = _data(jax.random.PRNGKey(1), nB, C, heads, nW)

    def loss_ref(q, k, v, bias):
        return (_xla_core(q, k, v, bias, mask) ** 2).sum()

    def loss_ker(q, k, v, bias):
        out = packed_window_attention(
            q, k, v, bias, mask, heads, nW or nB, group=group, interpret=True,
            variant=variant,
        )
        return (out**2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(g_ker, g_ref, ["dq", "dk", "dv", "dbias"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


def test_pick_group_constraints():
    for nW in (1, 4, 9, 16, 25, 36, 49, 64):
        for B in (2, 8, 10, 16, 32):
            nB = B * nW
            g = pick_group(nW, nB)
            assert nB % g == 0
            assert nW % g == 0 or g % nW == 0


def test_swin_forward_kernel_path_matches_xla():
    """Full swin forward: kernel dispatch vs XLA dispatch, f32."""
    cfg_x = sw.swin_t(compute_dtype=jnp.float32, window_kernel=False)
    cfg_k = sw.swin_t(compute_dtype=jnp.float32, window_kernel=True)
    params = sw.init_swin(jax.random.PRNGKey(0), cfg_x)
    # 56 px: 14x14 stage-1 map (4 windows, then pad at later stages) —
    # exercises shift masks, pad masks and the nW|G packing regime.
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 56, 56, 3))
    ref = sw.swin_forward(params, x, cfg_x)
    import dinomc_tpu.ops.pallas.window_attention as wa
    orig = wa.packed_window_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    from unittest import mock

    with mock.patch.object(wa, "packed_window_attention", interp):
        out = sw.swin_forward(params, x, cfg_k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)
