"""Synthetic texture/scene generators (dinomc_tpu/utils/synthetic.py)."""

import numpy as np

from dinomc_tpu.utils.synthetic import (
    NUM_CLASSES,
    colorize,
    make_seg_scene,
    make_texture_dataset,
    texture,
)


def test_texture_families_shapes_and_range():
    rng = np.random.RandomState(0)
    for c in range(NUM_CLASSES):
        t = texture(c, 32, rng)
        assert t.shape == (32, 32)
        assert np.isfinite(t).all()
        assert -0.01 <= t.min() and t.max() <= 1.01


def test_colorize_range():
    rng = np.random.RandomState(1)
    img = colorize(texture(0, 16, rng), rng)
    assert img.shape == (16, 16, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_texture_dataset_balanced_and_deterministic():
    xs, ys = make_texture_dataset(n_per_class=4, size=16, seed=3)
    xs2, ys2 = make_texture_dataset(n_per_class=4, size=16, seed=3)
    np.testing.assert_array_equal(xs, xs2)
    np.testing.assert_array_equal(ys, ys2)
    assert xs.shape == (32, 16, 16, 3)
    assert np.bincount(ys, minlength=NUM_CLASSES).tolist() == [4] * NUM_CLASSES


def test_seg_scene_mask_matches_classes():
    rng = np.random.RandomState(2)
    img, mask = make_seg_scene(64, rng)
    assert img.shape == (64, 64, 3) and mask.shape == (64, 64)
    assert mask.min() >= 0 and mask.max() < NUM_CLASSES
    # every Voronoi cell got painted (no all-zero holes)
    assert img.std() > 0.05


def test_texture_v2_shapes_and_class_coverage():
    """Hardened second-order families: valid range, all 8 classes render,
    deterministic given the rng state."""
    import numpy as np

    from dinomc_tpu.utils.synthetic import texture_v2

    for c in range(8):
        t = texture_v2(c, 48, np.random.RandomState(c))
        assert t.shape == (48, 48)
        assert t.min() >= 0.0 and t.max() <= 1.0
        assert t.std() > 0.05  # actually textured, not constant
    a = texture_v2(3, 32, np.random.RandomState(7))
    b = texture_v2(3, 32, np.random.RandomState(7))
    np.testing.assert_array_equal(a, b)


def test_texture_v2_degrades_random_features():
    """The point of the v2 world (r3 verdict weak #3): a random backbone's
    frozen features must separate v2 classes WORSE than v1 classes, so the
    trained-readout instruments stay discriminative. Checked with a tiny
    random ViT's pooled patch tokens and a 5-NN readout."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dinomc_tpu.eval.knn import knn_accuracy
    from dinomc_tpu.models import vit
    from dinomc_tpu.utils.synthetic import make_texture_dataset

    cfg = vit.vit_test(patch_size=4, img_size=48, compute_dtype=jnp.float32)
    params = vit.init_vit(jax.random.PRNGKey(97), cfg)

    def knn_of(family):
        X, Y = make_texture_dataset(16, 48, 8, seed=5, family=family)
        taps = np.asarray(vit.vit_intermediate_layers(
            params, jnp.asarray(X), cfg, (0, 1, 2), apply_norm=False,
        ))[:, :, 1:, :]
        F = np.concatenate(list(taps), axis=-1).mean(axis=1)
        n_tr = int(len(F) * 0.8)
        return knn_accuracy(
            jnp.asarray(F[:n_tr]), jnp.asarray(Y[:n_tr]),
            jnp.asarray(F[n_tr:]), jnp.asarray(Y[n_tr:]),
            ks=(5,), num_classes=8,
        )[5]

    acc_v1, acc_v2 = knn_of("v1"), knn_of("v2")
    assert acc_v2 < acc_v1, (acc_v1, acc_v2)


def test_make_change_pair_modes():
    """Change-pair world (OSCD learning): mask matches changed cells, and
    the drift modes behave as documented — 'color' keeps unchanged-cell
    structure (gray-level correlation high), 'full' re-renders it."""
    import numpy as np

    from dinomc_tpu.utils.synthetic import make_change_pair

    for drift in ("color", "full"):
        rng = np.random.RandomState(3)
        img1, img2, mask = make_change_pair(
            64, rng, n_seeds=6, n_change=2, drift=drift)
        assert img1.shape == (64, 64, 3) and img2.shape == (64, 64, 3)
        assert mask.shape == (64, 64)
        assert set(np.unique(mask)).issubset({0.0, 1.0})
        assert 0.05 < mask.mean() < 0.8  # some but not all changed
        # changed area differs between acquisitions
        ch = mask.astype(bool)
        assert np.abs(img1[ch] - img2[ch]).mean() > 0.05

    # color drift: unchanged-cell grayscale structure is preserved
    # (correlation of gray levels high despite fresh tint/noise)
    rng = np.random.RandomState(3)
    i1, i2, m = make_change_pair(64, rng, n_seeds=6, n_change=1,
                                 drift="color")
    un = ~m.astype(bool)
    g1, g2 = i1.mean(-1)[un], i2.mean(-1)[un]
    corr_color = np.corrcoef(g1, g2)[0, 1]
    rng = np.random.RandomState(3)
    i1, i2, m = make_change_pair(64, rng, n_seeds=6, n_change=1,
                                 drift="full")
    un = ~m.astype(bool)
    g1, g2 = i1.mean(-1)[un], i2.mean(-1)[un]
    corr_full = np.corrcoef(g1, g2)[0, 1]
    assert corr_color > corr_full + 0.2, (corr_color, corr_full)
