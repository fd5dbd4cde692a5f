"""Sequence/context parallelism: ring attention + sequence-parallel ViT.

The reference has NO sequence parallelism (dense single-device attention,
``utils/vision_transformer.py:80-92``; SURVEY.md §5.7). These tests pin the
TPU-native capability built on the reserved ``seq`` mesh axis: sharded-token
forwards must match the single-program math exactly (modulo online-softmax
reassociation).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ring-attention shard_map forwards + grads
from jax.sharding import PartitionSpec as P

from dinomc_tpu.core.mesh import make_mesh
from dinomc_tpu.models.vit import (
    init_vit,
    vit_forward,
    vit_forward_sp,
    vit_intermediate_layers,
    vit_tiny,
)
from dinomc_tpu.ops.attention import dense_attention
from dinomc_tpu.ops.ring_attention import ring_attention


def _qkv(key, B, N, h, d):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (B, N, h, d), jnp.float32) for k in ks)


@pytest.mark.parametrize("n_valid_frac", [1.0, 0.6])
def test_ring_attention_matches_dense(n_valid_frac):
    mesh = make_mesh(jax.devices(), data=1, seq=8, model=1)
    B, N, h, d = 2, 64, 3, 8
    n_valid = int(N * n_valid_frac)
    q, k, v = _qkv(jax.random.PRNGKey(0), B, N, h, d)

    ring = jax.jit(
        jax.shard_map(
            lambda q, k, v: ring_attention(
                q, k, v, axis_name="seq",
                n_valid=n_valid if n_valid != N else None,
            ),
            mesh=mesh,
            in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
            out_specs=P(None, "seq"),
            check_vma=False,
        )
    )
    out_ring = ring(q, k, v)[:, :n_valid]
    out_dense = dense_attention(
        q[:, :n_valid], k[:, :n_valid], v[:, :n_valid], 1.0 / np.sqrt(d)
    )
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(out_dense), rtol=1e-5, atol=1e-5
    )


def _cfg(**kw):
    return vit_tiny(
        patch_size=16, img_size=64, compute_dtype=jnp.float32,
        drop_path_rate=0.0, **kw
    )


def test_vit_forward_sp_matches_single():
    """17 tokens over 8 shards (padded to 24) — cls output must match."""
    cfg = _cfg()
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    ref = vit_forward(params, x, cfg)
    mesh = make_mesh(jax.devices(), data=1, seq=8, model=1)
    out = vit_forward_sp(params, x, cfg, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_vit_sp_intermediates_match():
    """UPerNet tap contract: (T, B, N+1, D) equals vit_intermediate_layers."""
    cfg = _cfg()
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    taps_ref = vit_intermediate_layers(params, x, cfg, out_indices=(3, 7, 11))
    mesh = make_mesh(jax.devices(), data=1, seq=8, model=1)
    taps = vit_forward_sp(params, x, cfg, mesh, out_indices=(3, 7, 11))
    assert taps.shape == taps_ref.shape
    np.testing.assert_allclose(
        np.asarray(taps), np.asarray(taps_ref), rtol=2e-5, atol=2e-5
    )


def test_vit_sp_composes_with_data_parallel():
    """dp x sp mesh (2, 4, 1): batch AND tokens sharded simultaneously."""
    cfg = _cfg()
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3))
    ref = vit_forward(params, x, cfg)
    mesh = make_mesh(jax.devices(), data=2, seq=4, model=1)
    out = vit_forward_sp(params, x, cfg, mesh, batch_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_upernet_seq_parallel_backbone():
    """Full UPerNet seg forward with the ViT backbone sharded over 'seq'
    matches the single-program forward (bf16 compute => loose tolerance;
    ring accumulates logits in f32 where dense casts post-matmul)."""
    from dinomc_tpu.models.upernet import (
        UPerNetConfig,
        init_upernet,
        upernet_forward,
    )

    cfg = UPerNetConfig(num_classes=6, arch="vit_tiny", patch_size=8)
    params, state = init_upernet(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    ref_logits, _ = upernet_forward(params, state, x, cfg)
    mesh = make_mesh(jax.devices(), data=1, seq=8, model=1)
    sp_logits, _ = upernet_forward(params, state, x, cfg, mesh=mesh)
    assert sp_logits.shape == ref_logits.shape
    np.testing.assert_allclose(
        np.asarray(sp_logits), np.asarray(ref_logits), rtol=0.05, atol=0.05
    )


def test_vit_sp_grads_match():
    """Backward through ppermute ring: grads equal the single-program grads."""
    cfg = _cfg()
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    mesh = make_mesh(jax.devices(), data=1, seq=8, model=1)

    def loss_sp(p):
        return jnp.sum(vit_forward_sp(p, x, cfg, mesh) ** 2)

    def loss_ref(p):
        return jnp.sum(vit_forward(p, x, cfg) ** 2)

    g_sp = jax.grad(loss_sp)(params)
    g_ref = jax.grad(loss_ref)(params)
    qkv_sp = np.asarray(g_sp["blocks"]["attn"]["qkv"]["kernel"])
    qkv_ref = np.asarray(g_ref["blocks"]["attn"]["qkv"]["kernel"])
    np.testing.assert_allclose(qkv_sp, qkv_ref, rtol=5e-4, atol=5e-5)
    pe_sp = np.asarray(g_sp["patch_embed"]["kernel"])
    pe_ref = np.asarray(g_ref["patch_embed"]["kernel"])
    np.testing.assert_allclose(pe_sp, pe_ref, rtol=5e-4, atol=5e-5)
