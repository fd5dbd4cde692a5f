"""Fused Pallas photometric chain (ops/pallas/augment.py) vs the unfused
XLA ops (ops/augment.py), given identical keys.

NOTE on interpret mode: jax 0.9.0's pallas interpreters (both the generic
``interpret=True`` and ``pltpu.InterpretParams``) MISEVALUATE the hue
branch of this kernel once the surrounding kernel grows — verified by
dumping in-kernel intermediates: inputs and the first three jitter stages
match a float64 reference to 2e-7, then the hue output is wrong, while the
REAL TPU output of the very same kernel matches the unfused chain exactly
(0.0 for jitter-only samples). The branch-free hue formula itself is
verified against the select-based reference in pure numpy to 1e-15.

Testing strategy therefore:
  * stages the interpreter evaluates faithfully (flip/gray/blur/solarize/
    normalize compositions) -> interpret-mode equivalence tests (CI);
  * the hue math -> pure-function unit test outside pallas;
  * the full chain incl. jitter -> hardware test, skipped off-TPU, run by
    the verify flow on the real chip.

On-hardware precision note: for blurred samples the small residual vs the
unfused path (~1e-2) is the UNFUSED side's error — XLA TPU lowers f32
conv_general_dilated to bfloat16 passes; the fused kernel's f32
slice-accumulate blur matches a float64 reference to 8e-7.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # pallas-interpret augmentation parity

from dinomc_tpu.ops import augment as xaug
from dinomc_tpu.ops.pallas import augment as paug

ON_TPU = jax.default_backend() == "tpu"


def _unfused_chain(x, k, jitter, p_jit, p_gray, p_blur, p_sol):
    x = xaug.random_hflip(k[1], x)
    x = xaug.color_jitter(k[2], x, *jitter, p=p_jit)
    x = xaug.random_grayscale(k[3], x, p=p_gray)
    x = xaug.gaussian_blur(k[4], x, p=p_blur)
    if p_sol > 0:
        x = xaug.random_solarize(k[5], x, p=p_sol)
    return xaug.normalize(x)


def _fused_chain(x, k, jitter, p_jit, p_gray, p_blur, p_sol, interpret):
    params = paug.draw_photometric_params(
        k[1], k[2], k[3], k[4], k[5] if p_sol > 0 else None,
        x.shape[0], jitter, p_jit=p_jit, p_gray=p_gray, p_blur=p_blur,
        p_sol=p_sol,
    )
    xf = xaug.random_hflip(k[1], x)
    y = paug.fused_photometric(
        xf.transpose(0, 3, 1, 2), params, interpret=interpret
    )
    return y.transpose(0, 2, 3, 1)


def _compare(seed, jitter, p_jit, p_gray, p_blur, p_sol, S=40, B=8,
             atol=2e-4, interpret=True):
    k = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.uniform(jax.random.PRNGKey(seed + 100), (B, S, S, 3))
    ref = np.asarray(_unfused_chain(x, k, jitter, p_jit, p_gray, p_blur, p_sol))
    got = np.asarray(
        _fused_chain(x, k, jitter, p_jit, p_gray, p_blur, p_sol, interpret)
    )
    np.testing.assert_allclose(got, ref, atol=atol)


# ---- interpret-mode (CI) tests: stages the interpreter handles faithfully


def test_flip_gray_sol_parity_interpret():
    _compare(0, (0.4, 0.4, 0.2, 0.1), 0.0, 1.0, 0.0, 1.0)


def test_blur_parity_interpret():
    _compare(1, (0.4, 0.4, 0.2, 0.1), 0.0, 0.0, 1.0, 0.0)


def test_gray_blur_sol_flip_parity_interpret():
    _compare(2, (0.8, 0.8, 0.8, 0.2), 0.0, 0.5, 0.5, 0.5)


def test_all_stages_off_is_normalize_only():
    B, S = 4, 32
    x = jax.random.uniform(jax.random.PRNGKey(9), (B, S, S, 3))
    k = jax.random.split(jax.random.PRNGKey(10), 6)
    params = paug.draw_photometric_params(
        k[1], k[2], k[3], k[4], None, B, (0.4, 0.4, 0.2, 0.1),
        p_jit=0.0, p_gray=0.0, p_blur=0.0, p_sol=0.0, p_flip=0.0,
    )
    y = paug.fused_photometric(x.transpose(0, 3, 1, 2), params, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y.transpose(0, 2, 3, 1)),
        np.asarray(xaug.normalize(x)),
        atol=1e-6,
    )


# ---- hue math unit test (outside pallas)


def test_branch_free_hue_matches_select_form():
    """paug._hue_shift (continuous reconstruction) == the select-based
    _rgb_to_hsv/_hsv_to_rgb used by the unfused color_jitter."""
    x = jax.random.uniform(jax.random.PRNGKey(11), (64, 64, 3))
    for fh in (0.0, 0.07, -0.18, 0.5):
        r2, g2, b2 = paug._hue_shift(x[..., 0], x[..., 1], x[..., 2], fh)
        hsv = xaug._rgb_to_hsv(x)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + fh) % 1.0)
        ref = xaug._hsv_to_rgb(hsv)
        got = jnp.stack([r2, g2, b2], axis=-1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_draw_params_matches_unfused_rng():
    """The param rows must reproduce the unfused ops' random decisions
    bit-for-bit (same key-split structure)."""
    B = 16
    k = jax.random.split(jax.random.PRNGKey(12), 6)
    rows = paug.draw_photometric_params(
        k[1], k[2], k[3], k[4], k[5], B, (0.4, 0.4, 0.2, 0.1),
        p_jit=0.8, p_gray=0.2, p_blur=0.5, p_sol=0.2,
    )
    kb, kc, ks, kh, kp = jax.random.split(k[2], 5)
    np.testing.assert_array_equal(
        np.asarray(rows[:, paug.P_FB]),
        np.asarray(jax.random.uniform(kb, (B, 1, 1, 1), minval=0.6, maxval=1.4)).ravel(),
    )
    np.testing.assert_array_equal(
        np.asarray(rows[:, paug.P_FLIP]),
        np.asarray(jax.random.bernoulli(k[1], 0.5, (B, 1, 1, 1))).ravel().astype(np.float32),
    )
    ksig, _ = jax.random.split(k[4])
    sigma = jax.random.uniform(ksig, (B,), minval=0.1, maxval=2.0)
    np.testing.assert_allclose(
        np.asarray(rows[:, paug.P_TAPS : paug.P_TAPS + 13]),
        np.asarray(xaug._gaussian_kernel_1d(sigma, 6)),
        atol=1e-7,
    )


def test_multicrop_fused_flag_off_matches_default_on_cpu():
    """On the CPU test platform 'auto' resolves to unfused; 'off' must be
    identical (dispatch sanity)."""
    cfg_auto = xaug.MultiCropConfig(local_sizes=(24, 16))
    cfg_off = xaug.MultiCropConfig(local_sizes=(24, 16), fused="off")
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    g1, l1 = xaug.multicrop_augment(jax.random.PRNGKey(5), x, cfg_auto)
    g2, l2 = xaug.multicrop_augment(jax.random.PRNGKey(5), x, cfg_off)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---- full-chain hardware tests (run on the real chip by the verify flow)


@pytest.mark.skipif(not ON_TPU, reason="full-chain parity needs real TPU "
                    "(interpret mode misevaluates the hue branch)")
def test_full_chain_parity_on_tpu():
    # jitter-only samples must match EXACTLY; blur samples differ by the
    # unfused conv's bf16 error (~1e-2), so tolerate that.
    _compare(2, (0.8, 0.8, 0.8, 0.2), 0.8, 0.2, 0.5, 0.0,
             atol=5e-2, interpret=False)
    _compare(1, (0.4, 0.4, 0.2, 0.1), 0.8, 0.2, 0.1, 0.2,
             atol=5e-2, interpret=False)


def test_tp_chain_identity_normalize_interpret():
    """DINO-TP pre-crop chain through the fused kernel: identity mean/std
    (TP normalizes after cropping), no solarize, flip applied AFTER in XLA
    (commutes with the pointwise ops and the symmetric edge-padded blur).
    Jitter off — the interpreter misevaluates the hue branch (see module
    docstring); the jitter stages are covered by the hardware test."""
    B, S = 6, 40
    x = jax.random.uniform(jax.random.PRNGKey(21), (B, S, S, 3))
    k = jax.random.split(jax.random.PRNGKey(22), 4)
    params = paug.draw_photometric_params(
        k[3], k[0], k[1], k[2], None, B, (0.4, 0.4, 0.4, 0.1),
        p_jit=0.0, p_gray=0.5, p_blur=0.5, p_sol=0.0,
    )
    y = paug.fused_photometric(
        x.transpose(0, 3, 1, 2), params, interpret=True,
        mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
    ).transpose(0, 2, 3, 1)
    got = xaug.random_hflip(k[3], y)

    ref = xaug.random_grayscale(k[1], x, p=0.5)
    ref = xaug.gaussian_blur(k[2], ref, p=0.5)
    ref = xaug.random_hflip(k[3], ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
