"""Chunked-query long-sequence attention kernel correctness (interpret
mode on CPU): ops/pallas/attention_long.py vs the dense reference, plus
its dispatch window in ops/attention.mha."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from dinomc_tpu.ops import attention as att
from dinomc_tpu.ops.pallas import attention_long as plong


def _qkv(B=1, N=150, h=2, d=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    mk = lambda k: jax.random.normal(k, (B, N, h, d), jnp.float32)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


def test_long_matches_dense_interpret():
    # N=150 -> padded 256 = two 128-row query chunks; padded keys masked
    q, k, v = _qkv()
    scale = 1.0 / np.sqrt(32)
    ref = att.dense_attention(q, k, v, scale)
    with pltpu.force_tpu_interpret_mode():
        out = plong.long_mha(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_long_grads_match_dense_interpret():
    q, k, v = _qkv(seed=1)
    scale = 1.0 / np.sqrt(32)

    def loss_dense(q, k, v):
        return jnp.sum(att.dense_attention(q, k, v, scale) ** 2)

    def loss_long(q, k, v):
        return jnp.sum(plong.long_mha(q, k, v, scale) ** 2)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        gl = jax.grad(loss_long, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gd, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_long_exact_multiple_no_padding():
    q, k, v = _qkv(N=256, seed=2)
    scale = 0.17
    ref = att.dense_attention(q, k, v, scale)
    with pltpu.force_tpu_interpret_mode():
        out = plong.long_mha(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_dispatch_window():
    # padded <= 1024 -> fused; (1024, MAX_LONG_LEN] -> fused_long; beyond
    # -> flash. Checked via the names mha resolves (no TPU here, so only
    # verify the constants and the boundary guard).
    assert att.MAX_LONG_LEN > 4224  # covers the 512px/4097-token seg path
    q, k, v = _qkv(N=40)
    try:
        att.mha(q, k, v, impl="fused_long", boundary=20)
        raise AssertionError("boundary should be rejected for fused_long")
    except ValueError:
        pass
