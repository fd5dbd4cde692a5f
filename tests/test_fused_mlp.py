"""Fused MLP kernel correctness (interpret mode on CPU) and its wiring
into the ViT block (``models/vit._mlp`` impl dispatch)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from dinomc_tpu.models import vit as vt
from dinomc_tpu.ops.pallas import fused_mlp as fm


def _dense(x, w1, b1, w2, b2, approx):
    y = jax.nn.gelu(x @ w1 + b1, approximate=approx)
    return y @ w2 + b2


def _mats(M=100, D=32, F=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    return (
        jax.random.normal(ks[0], (M, D), jnp.float32),
        jax.random.normal(ks[1], (D, F), jnp.float32) * 0.1,
        jax.random.normal(ks[2], (F,), jnp.float32) * 0.1,
        jax.random.normal(ks[3], (F, D), jnp.float32) * 0.1,
        jax.random.normal(ks[4], (D,), jnp.float32) * 0.1,
    )


def test_fused_mlp_matches_dense_interpret():
    x, w1, b1, w2, b2 = _mats()
    ref = _dense(x, w1, b1, w2, b2, True)
    with pltpu.force_tpu_interpret_mode():
        out = fm.fused_mlp(x, w1, b1, w2, b2, approx=True)
    assert out.shape == x.shape  # row padding (100 -> 512) sliced off
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_mlp_erf_gelu_interpret():
    x, w1, b1, w2, b2 = _mats(seed=1)
    ref = _dense(x, w1, b1, w2, b2, False)
    with pltpu.force_tpu_interpret_mode():
        out = fm.fused_mlp(x, w1, b1, w2, b2, approx=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_mlp_grads_match_dense_interpret():
    x, w1, b1, w2, b2 = _mats(seed=2)

    def loss_ref(*a):
        return jnp.sum(_dense(*a, True) ** 2)

    def loss_fused(*a):
        return jnp.sum(fm.fused_mlp(*a, approx=True) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(
            np.asarray(b).reshape(np.asarray(a).shape),
            np.asarray(a),
            atol=5e-4,
        )


def test_vit_mlp_impl_dispatch():
    """'fused' through the ViT block helper matches the dense einsum path."""
    D, F = 32, 128
    _, w1, b1, w2, b2 = _mats(D=D, F=F, seed=3)
    p = {
        "fc1": {"kernel": w1, "bias": b1},
        "fc2": {"kernel": w2, "bias": b2},
    }
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 50, D), jnp.float32)
    ref = vt._mlp(x, p, True, impl="dense")
    with pltpu.force_tpu_interpret_mode():
        out = vt._mlp(x, p, True, impl="fused")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
