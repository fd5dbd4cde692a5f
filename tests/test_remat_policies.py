"""Every remat policy must be numerically a no-op: same forward and same
gradients as no-remat (remat only changes WHAT is recomputed in backward).
Policies are measured on the real chip in scripts/remat_bench.py; see
docs/performance.md for the numbers behind the 'attn' default."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinomc_tpu.models import vit

# The two production policies (bench.py B=10 winner and the large-batch
# default) stay in the fast suite; the other five are identical machinery
# with a different save-list and run as slow (each costs a full fwd+bwd
# compile pair on XLA:CPU — ~100 s of the fast suite for no extra
# code-path coverage).
POLICIES = ["attn", "qkv+attn+mlp"]
SLOW_POLICIES = ["full", "dots", "dots+attn", "qkv+attn", "attn+mlp"]


def _cfg(**kw):
    return vit.ViTConfig(
        patch_size=8, embed_dim=64, depth=3, num_heads=2, img_size=32,
        compute_dtype=jnp.float32, **kw,
    )


@pytest.mark.parametrize(
    "policy",
    POLICIES + [pytest.param(p, marks=pytest.mark.slow) for p in SLOW_POLICIES],
)
def test_policy_matches_no_remat(policy):
    base = _cfg(remat=False)
    params = vit.init_vit(jax.random.PRNGKey(0), base)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    def loss(p, cfg):
        return jnp.sum(vit.vit_forward(p, x, cfg) ** 2)

    ref_l, ref_g = jax.value_and_grad(loss)(params, base)
    cfg = _cfg(remat=True, remat_policy=policy)
    got_l, got_g = jax.value_and_grad(loss)(params, cfg)
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ref_g), jax.tree_util.tree_leaves(got_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
