"""Fused attention kernel correctness (interpret mode on CPU) and the
dispatch logic in ops/attention.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from dinomc_tpu.ops import attention as att
from dinomc_tpu.ops.pallas import attention as patt


def _qkv(B=2, N=50, h=2, d=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    mk = lambda k: jax.random.normal(k, (B, N, h, d), jnp.float32)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


def test_fused_matches_dense_interpret():
    q, k, v = _qkv()
    scale = 1.0 / np.sqrt(32)
    ref = att.dense_attention(q, k, v, scale)
    with pltpu.force_tpu_interpret_mode():
        out = patt.fused_mha(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_grads_match_dense_interpret():
    q, k, v = _qkv(seed=1)
    scale = 1.0 / np.sqrt(32)

    def loss_dense(q, k, v):
        return jnp.sum(att.dense_attention(q, k, v, scale) ** 2)

    def loss_fused(q, k, v):
        return jnp.sum(patt.fused_mha(q, k, v, scale) ** 2)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gd, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_padding_is_exact():
    """N=50 pads to 128; padded key columns must not leak into the output."""
    q, k, v = _qkv(N=50, seed=2)
    scale = 0.2
    ref = att.dense_attention(q, k, v, scale)
    with pltpu.force_tpu_interpret_mode():
        out = patt.fused_mha(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pad_len():
    assert patt._pad_len(785) == 896
    assert patt._pad_len(128) == 128
    assert patt._pad_len(1) == 128


def test_dispatch_on_cpu_is_dense():
    q, k, v = _qkv()
    out = att.mha(q, k, v)  # auto -> dense on CPU
    ref = att.dense_attention(q, k, v, 1.0 / np.sqrt(32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def _two_segment_ref(q, k, v, scale, boundary):
    """Concatenation of two independent dense attentions — the ground truth
    for crop packing."""
    a = att.dense_attention(q[:, :boundary], k[:, :boundary], v[:, :boundary], scale)
    b = att.dense_attention(q[:, boundary:], k[:, boundary:], v[:, boundary:], scale)
    return jnp.concatenate([a, b], axis=1)


def test_boundary_fused_matches_two_separate():
    q, k, v = _qkv(N=90, seed=4)
    scale = 1.0 / np.sqrt(32)
    ref = _two_segment_ref(q, k, v, scale, 57)
    with pltpu.force_tpu_interpret_mode():
        out = patt.fused_mha(q, k, v, scale, boundary=57)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_boundary_fused_grads_match_two_separate():
    q, k, v = _qkv(N=70, seed=5)
    scale = 1.0 / np.sqrt(32)

    def loss_ref(q, k, v):
        return jnp.sum(_two_segment_ref(q, k, v, scale, 33) ** 2)

    def loss_fused(q, k, v):
        return jnp.sum(patt.fused_mha(q, k, v, scale, boundary=33) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_boundary_dense_matches_two_separate():
    q, k, v = _qkv(N=64, seed=6)
    scale = 0.17
    ref = _two_segment_ref(q, k, v, scale, 40)
    out = att.dense_attention(q, k, v, scale, boundary=40)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_boundary_rejected_for_ring():
    q, k, v = _qkv()
    with pytest.raises(ValueError, match="boundary"):
        att.mha(q, k, v, impl="ring", boundary=3)


def test_dense_softmax_rows_sum_to_one():
    q, k, v = _qkv(seed=3)
    out = att.dense_attention(q, k, jnp.ones_like(v), 0.1)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)
