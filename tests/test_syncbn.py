"""SyncBN semantics under SPMD: BatchNorm batch statistics over a
batch-sharded input must equal the full-batch (global) statistics —
the TPU-native equivalent of nn.SyncBatchNorm (main_dino_mc.py:250-252)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from dinomc_tpu.models import layers

import pytest

pytestmark = pytest.mark.slow  # sharded-vs-replicated BN train steps


def test_bn_batch_stats_are_global_under_sharding(mesh8):
    rng = np.random.RandomState(0)
    # make per-shard distributions differ so local stats != global stats
    x = np.concatenate(
        [rng.randn(2, 4, 4, 3) * (i + 1) + i for i in range(8)], axis=0
    ).astype(np.float32)

    p, s = layers.bn_init(3)

    @jax.jit
    def apply(x):
        return layers.bn_apply(p, s, x, train=True)

    # reference: unsharded computation
    y_ref, s_ref = apply(jnp.asarray(x))

    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh8, P("data")))
    y_sh, s_sh = apply(xs)

    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s_sh["mean"]), np.asarray(s_ref["mean"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_sh["var"]), np.asarray(s_ref["var"]), rtol=1e-4
    )


def test_resnet_train_step_sharded_matches_replicated(mesh8):
    """One conv+BN forward over a sharded batch equals the replicated one."""
    from dinomc_tpu.models import resnet

    cfg = resnet.ResNetConfig(stage_sizes=(1, 1, 1, 1), compute_dtype=jnp.float32)
    params, state = resnet.init_resnet(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 32, 32, 3))

    @jax.jit
    def fwd(x):
        _, pooled, ns = resnet.resnet_features(params, state, x, cfg, train=True)
        return pooled, ns["stem"]["bn"]["mean"]

    p_ref, m_ref = fwd(x)
    xs = jax.device_put(x, NamedSharding(mesh8, P("data")))
    p_sh, m_sh = fwd(xs)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(m_sh), np.asarray(m_ref), atol=1e-5)
