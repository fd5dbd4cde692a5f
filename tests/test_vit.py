"""Shape-contract and semantic tests for the ViT backbone (replacing the
reference's __main__ smoke blocks, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinomc_tpu.models import vit


@pytest.fixture(scope="module")
def tiny():
    cfg = vit.ViTConfig(
        patch_size=8, embed_dim=64, depth=4, num_heads=2, img_size=32,
        compute_dtype=jnp.float32,
    )
    params = vit.init_vit(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_forward_shape(tiny):
    cfg, params = tiny
    x = jnp.ones((2, 32, 32, 3))
    out = vit.vit_forward(params, x, cfg)
    assert out.shape == (2, 64)
    assert out.dtype == jnp.float32


def test_arbitrary_resolution_pos_embed(tiny):
    """Pos-embed bicubic interpolation must admit any multiple of patch size
    (parity: vision_transformer.py:174-194)."""
    cfg, params = tiny
    for size in (16, 24, 48, 64):
        x = jnp.ones((1, size, size, 3))
        out = vit.vit_forward(params, x, cfg)
        assert out.shape == (1, 64)


def test_non_divisible_input_truncates(tiny):
    """164px-style inputs (not multiples of patch) must work via conv-like
    truncation (the reference's stride-8 PatchEmbed drops remainder pixels)."""
    cfg, params = tiny
    out = vit.vit_forward(params, jnp.ones((1, 36, 44, 3)), cfg)
    assert out.shape == (1, 64)
    # equals the forward on the truncated image
    out2 = vit.vit_forward(params, jnp.ones((1, 32, 40, 3)), cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_non_square_input(tiny):
    cfg, params = tiny
    out = vit.vit_forward(params, jnp.ones((1, 32, 48, 3)), cfg)
    assert out.shape == (1, 64)


def test_pos_embed_identity_at_native_grid(tiny):
    cfg, params = tiny
    pe = vit.interpolate_pos_embed(params["pos_embed"], (cfg.grid, cfg.grid))
    np.testing.assert_array_equal(np.asarray(pe), np.asarray(params["pos_embed"]))


# g_new == g0 is excluded below: both we and the reference early-exit to the
# stored embedding at the native grid (vision_transformer.py:177-178).
@pytest.mark.parametrize("g_new", [4, 11, 13, 14, 21, 27, 64])
def test_pos_embed_interpolation_matches_torch(g_new):
    """interpolate_pos_embed must reproduce the reference bit-for-bit-ish:
    torch ``nn.functional.interpolate(mode='bicubic')`` with the
    ``scale_factor=(g_new + 0.1)/g_old`` fudge (reference
    ``utils/vision_transformer.py:174-194``), CLS position untouched."""
    torch = pytest.importorskip("torch")
    g0, dim = 28, 16
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((1, g0 * g0 + 1, dim)).astype(np.float32)

    ours = np.asarray(vit.interpolate_pos_embed(jnp.asarray(pos), (g_new, g_new)))

    patch = torch.from_numpy(pos[:, 1:]).reshape(1, g0, g0, dim).permute(0, 3, 1, 2)
    ref = torch.nn.functional.interpolate(
        patch, scale_factor=(g_new + 0.1) / g0, mode="bicubic"
    )
    assert ref.shape[-1] == g_new
    ref = ref.permute(0, 2, 3, 1).reshape(1, g_new * g_new, dim).numpy()

    np.testing.assert_array_equal(ours[:, :1], pos[:, :1])
    # Our resize is two dense f32 matmuls, torch's is a separable
    # gather-conv — same math, different reduction order (worst observed
    # ~1e-5 rel on near-identity 28->27 where outputs mix large taps).
    np.testing.assert_allclose(ours[:, 1:], ref, atol=1e-5, rtol=3e-5)


def test_patchify_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    p = vit.patchify(x, 4)
    assert p.shape == (2, 4, 48)
    # first patch equals the top-left 4x4 block in (ph, pw, c) order
    np.testing.assert_array_equal(
        np.asarray(p[0, 0]), np.asarray(x[0, :4, :4, :]).reshape(-1)
    )


def test_intermediate_layers(tiny):
    cfg, params = tiny
    x = jnp.ones((2, 32, 32, 3))
    taps = vit.vit_intermediate_layers(params, x, cfg, out_indices=(0, 1, 3))
    n_tokens = (32 // 8) ** 2 + 1
    assert taps.shape == (3, 2, n_tokens, 64)
    # last tap with norm must equal the full forward's pre-CLS-extraction output
    out = vit.vit_forward(params, x, cfg)
    np.testing.assert_allclose(np.asarray(taps[-1][:, 0]), np.asarray(out), atol=1e-5)


def test_last_selfattention(tiny):
    cfg, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    attn = vit.vit_last_selfattention(params, x, cfg)
    n = (32 // 8) ** 2 + 1
    assert attn.shape == (2, cfg.num_heads, n, n)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-4)


def test_drop_path_changes_output_and_is_deterministic_off(tiny):
    cfg, params = tiny
    cfg_dp = vit.ViTConfig(
        patch_size=8, embed_dim=64, depth=4, num_heads=2, img_size=32,
        drop_path_rate=0.5, compute_dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3))
    det = vit.vit_forward(params, x, cfg_dp, None, True)
    det2 = vit.vit_forward(params, x, cfg_dp, None, True)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))
    stoch = vit.vit_forward(params, x, cfg_dp, jax.random.PRNGKey(3), False)
    assert not np.allclose(np.asarray(det), np.asarray(stoch))


def test_factories():
    for name, dim, heads in (("vit_tiny", 192, 3), ("vit_small", 384, 6), ("vit_base", 768, 12)):
        cfg = vit.VIT_FACTORIES[name](patch_size=16)
        assert cfg.embed_dim == dim and cfg.num_heads == heads and cfg.depth == 12


def test_packed_forward_matches_separate(tiny):
    """Crop packing (block-diagonal attention) must equal two separate
    forwards exactly — LayerNorm/MLP are token-pointwise."""
    cfg, params = tiny
    ka, kb = jax.random.split(jax.random.PRNGKey(3))
    xa = jax.random.uniform(ka, (2, 32, 32, 3))
    xb = jax.random.uniform(kb, (2, 16, 16, 3))
    fa, fb = vit.vit_forward_packed(params, xa, xb, cfg)
    ra = vit.vit_forward(params, xa, cfg)
    rb = vit.vit_forward(params, xb, cfg)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(ra), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(rb), atol=2e-5)


def test_packed_forward_matches_separate_multiblock(tiny):
    """Packed equivalence at sizes whose packed length spans multiple
    128-token kernel blocks (80px -> 101 + 88px -> 122 tokens = 223): the
    boundary mask must stay exact across block edges."""
    cfg, params = tiny
    ka, kb = jax.random.split(jax.random.PRNGKey(7))
    xa = jax.random.uniform(ka, (2, 80, 80, 3))
    xb = jax.random.uniform(kb, (2, 88, 88, 3))
    fa, fb = vit.vit_forward_packed(params, xa, xb, cfg)
    ra = vit.vit_forward(params, xa, cfg)
    rb = vit.vit_forward(params, xb, cfg)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(ra), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(rb), atol=2e-5)


def test_packed_forward_per_segment_drop_path(tiny):
    """Stochastic depth under packing draws independent decisions per
    segment: with a near-1 drop rate the two segments' outputs must not be
    a shared all-dropped/all-kept pattern across many samples."""
    cfg, params = tiny
    import dataclasses as dc

    cfg_dp = dc.replace(cfg, drop_path_rate=0.5)
    xa = jax.random.uniform(jax.random.PRNGKey(4), (8, 32, 32, 3))
    xb = jax.random.uniform(jax.random.PRNGKey(5), (8, 16, 16, 3))
    rng = jax.random.PRNGKey(6)
    fa, fb = vit.vit_forward_packed(params, xa, xb, cfg_dp, rng, False)
    fa2, fb2 = vit.vit_forward_packed(params, xa, xb, cfg_dp, rng, False)
    # deterministic given rng
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fa2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fb2), atol=1e-6)
    # and differs from the no-dropout forward (dropout is actually applied)
    ga, _ = vit.vit_forward_packed(params, xa, xb, cfg_dp)
    assert not np.allclose(np.asarray(fa), np.asarray(ga), atol=1e-4)


def test_multi_forward_matches_separate(tiny):
    """Merged-bucket forward (all dense GEMMs over one concatenated token
    stream, vit_forward_multi) must equal per-bucket forwards exactly —
    every dense op is row-independent and attention sees only its own
    bucket's rows."""
    cfg, params = tiny
    key = jax.random.PRNGKey(11)
    xs = [
        jax.random.uniform(jax.random.fold_in(key, i), (b, s, s, 3))
        for i, (b, s) in enumerate([(4, 32), (2, 24), (3, 16)])
    ]
    merged = vit.vit_forward_multi(params, xs, cfg)
    for x, m in zip(xs, merged):
        r = vit.vit_forward(params, x, cfg)
        np.testing.assert_allclose(np.asarray(m), np.asarray(r), atol=2e-5)


def test_multi_forward_grads_match_separate(tiny):
    """Gradients through the merged stream must match the per-bucket
    composition (the training path's actual contract)."""
    cfg, params = tiny
    key = jax.random.PRNGKey(12)
    xs = [
        jax.random.uniform(jax.random.fold_in(key, i), (b, s, s, 3))
        for i, (b, s) in enumerate([(2, 32), (2, 16)])
    ]

    def loss_sep(p):
        return sum(vit.vit_forward(p, x, cfg).sum() for x in xs)

    def loss_mer(p):
        return sum(o.sum() for o in vit.vit_forward_multi(p, xs, cfg))

    g1 = jax.grad(loss_sep)(params)
    g2 = jax.grad(loss_mer)(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_multi_forward_drop_path(tiny):
    """Merged DropPath: deterministic given rng, applied (differs from the
    no-drop forward), and per-(bucket, sample) independent."""
    import dataclasses as dc

    cfg, params = tiny
    cfg_dp = dc.replace(cfg, drop_path_rate=0.5)
    key = jax.random.PRNGKey(13)
    xs = [
        jax.random.uniform(jax.random.fold_in(key, i), (8, s, s, 3))
        for i, s in enumerate([32, 16])
    ]
    rng = jax.random.PRNGKey(14)
    a1 = vit.vit_forward_multi(params, xs, cfg_dp, rng, False)
    a2 = vit.vit_forward_multi(params, xs, cfg_dp, rng, False)
    for u, v in zip(a1, a2):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=1e-6)
    b = vit.vit_forward_multi(params, xs, cfg_dp)
    assert not np.allclose(np.asarray(a1[0]), np.asarray(b[0]), atol=1e-4)
