"""Fused photometric augmentation kernel (Pallas, TPU).

The DINO-MC augmentation chain (reference ``dino_augmentation.py:24-52`` +
``utils/utils.py:40-72``) applies, per crop: horizontal flip, ColorJitter
(brightness/contrast/saturation/hue), random grayscale, Gaussian blur,
solarization and ImageNet normalization. As separate XLA ops each stage is
an HBM round-trip over the whole crop batch (~14 passes including the HSV
round-trip and the two blur convolutions). This kernel runs the ENTIRE
chain in one pass: each grid program pulls one image into VMEM, applies
every stage on-chip, and writes the finished crop — the north-star
"fused on-device Pallas augmentation" design (BASELINE.json).

Layout: channel-planar (B, 3, S, S) float32 — photometric ops vectorize
over the W axis in lanes while R/G/B stay separate tiles (grayscale, HSV
and normalize then need no cross-lane shuffles). The NHWC <-> planar
transposes at the boundary are 2 passes vs the ~14 they replace.

Per-sample randomness is drawn OUTSIDE with jax.random (bit-identical to
the unfused path in ops/augment.py — see ``draw_photometric_params``) and
enters the kernel as an SMEM parameter row; the Gaussian taps are
precomputed per sample from its sigma. Gaussian blur is skipped entirely
(``pl.when``) for samples whose Bernoulli draw says no — with blur p=0.5
on local crops that's half the conv work the XLA path always pays.

Semantics parity with ops/augment.py primitives (same formulas, same
op order); equivalence is tested on CPU via interpret mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dinomc_tpu.ops import augment as xaug

KERNEL_RADIUS = 6  # 13 taps, matches ops/augment.gaussian_blur
N_TAPS = 2 * KERNEL_RADIUS + 1
# params row: flip, jit_apply, fb, fc, fs, fh, gray_apply, blur_apply,
#             sol_apply, <pad>, taps[13], <pad> -> 24 floats
P_FLIP, P_JIT, P_FB, P_FC, P_FS, P_FH, P_GRAY, P_BLUR, P_SOL = range(9)
P_TAPS = 10
P_LEN = 24


def _gray(r, g, b):
    """ITU-R 601-2 luma — ops/augment._grayscale parity."""
    return 0.299 * r + 0.587 * g + 0.114 * b


def _hue_shift(r, g, b, fh):
    """RGB -> HSV -> (h + fh) mod 1 -> RGB on planar channels.

    Same transform as ops/augment._rgb_to_hsv/_hsv_to_rgb, but the RGB
    reconstruction uses the branch-free continuous form
    ``f(n) = V - V*S*clip(min(k, 4-k), 0, 1)`` with ``k = (n + 6h) mod 6``
    instead of the sector-select (``i = floor(6h)`` + 6-way select): the
    piecewise select miscompiled inside larger Pallas kernels (sector index
    came out wrong once surrounding ops grew) and the continuous form is
    mathematically identical while being robust and cheaper on the VPU.
    ``%`` is avoided throughout (explicit floor-wraps).
    """
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h0 = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    # h0 in [-1, 5]; normalize to [0, 1) without `%`
    h = h0 * (1.0 / 6.0)
    h = jnp.where(h < 0, h + 1.0, h)
    h = jnp.where(delta > 0, h, 0.0)
    h = h + fh
    h = jnp.where(h < 0, h + 1.0, h)
    h = jnp.where(h >= 1.0, h - 1.0, h)

    h6 = h * 6.0
    vs = v * s

    def chan(n):
        k = h6 + n
        k = k - 6.0 * jnp.floor(k * (1.0 / 6.0))
        return v - vs * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return chan(5.0), chan(3.0), chan(1.0)


def _photometric_kernel(
    pp_ref,  # SMEM (1, P_LEN) per-sample params
    img_ref,  # VMEM (1, 3, S, S)
    out_ref,  # VMEM (1, 3, S, S)
    buf,  # VMEM scratch (3, S, S)
    padh,  # VMEM scratch (3, S + 2r, S)
    padw,  # VMEM scratch (3, S, S + 2r)
    *,
    S: int,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
):
    r6 = KERNEL_RADIUS

    b = pl.program_id(0)
    # NOTE: the horizontal flip stays OUTSIDE the kernel (Mosaic has no
    # lane-reverse primitive); the caller applies it in XLA first. P_FLIP in
    # the param row is informational only.
    buf[...] = img_ref[0]

    # ---- ColorJitter (brightness -> contrast -> saturation -> hue), then
    # per-sample RandomApply select against the unjittered image.
    x = buf[...]
    fb = pp_ref[b, P_FB]
    fc = pp_ref[b, P_FC]
    fs = pp_ref[b, P_FS]
    fh = pp_ref[b, P_FH]
    y = jnp.clip(x * fb, 0.0, 1.0)
    mean_gray = jnp.mean(_gray(y[0], y[1], y[2]))
    y = jnp.clip(fc * y + (1.0 - fc) * mean_gray, 0.0, 1.0)
    g3 = _gray(y[0], y[1], y[2])[None]
    y = jnp.clip(fs * y + (1.0 - fs) * g3, 0.0, 1.0)
    r2, g2, b2 = _hue_shift(y[0], y[1], y[2], fh)
    y = jnp.clip(jnp.stack([r2, g2, b2], axis=0), 0.0, 1.0)
    x = jnp.where(pp_ref[b, P_JIT] > 0.5, y, x)

    # ---- random grayscale
    gr = _gray(x[0], x[1], x[2])[None]
    x = jnp.where(pp_ref[b, P_GRAY] > 0.5, gr, x)
    buf[...] = x

    # ---- Gaussian blur (separable, edge padding) — skipped when not drawn
    @pl.when(pp_ref[b, P_BLUR] > 0.5)
    def _():
        t = buf[...]
        # H pass: replicate-pad rows, accumulate 13 shifted slices
        padh[:, r6 : r6 + S, :] = t
        for i in range(r6):
            padh[:, i, :] = t[:, 0, :]
            padh[:, r6 + S + i, :] = t[:, S - 1, :]
        ph = padh[...]
        acc = pp_ref[b, P_TAPS] * ph[:, 0:S, :]
        for i in range(1, N_TAPS):
            acc += pp_ref[b, P_TAPS + i] * ph[:, i : i + S, :]
        # W pass
        padw[:, :, r6 : r6 + S] = acc
        for i in range(r6):
            padw[:, :, i] = acc[:, :, 0]
            padw[:, :, r6 + S + i] = acc[:, :, S - 1]
        pw = padw[...]
        acc = pp_ref[b, P_TAPS] * pw[:, :, 0:S]
        for i in range(1, N_TAPS):
            acc += pp_ref[b, P_TAPS + i] * pw[:, :, i : i + S]
        buf[...] = acc

    # ---- solarize + normalize
    x = buf[...]
    sol = jnp.where(x >= 128.0 / 255.0, 1.0 - x, x)
    x = jnp.where(pp_ref[b, P_SOL] > 0.5, sol, x)
    # per-channel scalars stay python constants (array constants can't be
    # captured by a pallas kernel)
    for c in range(3):
        out_ref[0, c] = (x[c] - mean[c]) * (1.0 / std[c])


@functools.partial(jax.jit, static_argnames=("interpret", "mean", "std"))
def fused_photometric(
    images: jnp.ndarray,  # (B, 3, S, S) f32 planar, values in [0, 1]
    params: jnp.ndarray,  # (B, P_LEN) f32
    interpret: bool = False,
    mean: Tuple[float, float, float] = tuple(xaug.IMAGENET_MEAN),
    std: Tuple[float, float, float] = tuple(xaug.IMAGENET_STD),
) -> jnp.ndarray:
    """Run the full flip+jitter+gray+blur+solarize+normalize chain fused.

    ``mean=(0,0,0), std=(1,1,1)`` turns the final normalize into identity —
    used by the DINO-TP pre-crop photometric chain, which normalizes later
    (after cropping)."""
    B, C, S, _ = images.shape
    assert C == 3
    kern = functools.partial(
        _photometric_kernel,
        S=S,
        mean=tuple(mean),
        std=tuple(std),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(images.shape, jnp.float32),
        grid=(B,),
        in_specs=[
            # whole (B, P_LEN) table in SMEM; rows indexed by program_id
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, S, S), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, S, S), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((3, S, S), jnp.float32),
            pltpu.VMEM((3, S + 2 * KERNEL_RADIUS, S), jnp.float32),
            pltpu.VMEM((3, S, S + 2 * KERNEL_RADIUS), jnp.float32),
        ],
        interpret=interpret,
    )(params, images)


def draw_photometric_params(
    k_flip: jax.Array,
    k_jit: jax.Array,
    k_gray: jax.Array,
    k_blur: jax.Array,
    k_sol: jax.Array | None,
    B: int,
    jitter: Tuple[float, float, float, float],
    p_jit: float,
    p_gray: float,
    p_blur: float,
    p_sol: float,
    blur_range: Tuple[float, float] = (0.1, 2.0),
    p_flip: float = 0.5,
) -> jnp.ndarray:
    """Draw the per-sample parameter rows with the SAME key-split structure
    and draw shapes as the unfused ops (random_hflip, color_jitter,
    random_grayscale, gaussian_blur, random_solarize in ops/augment.py) so
    fused and unfused paths are bit-identical in their random decisions."""
    br, ct, sat, hue = jitter
    flip = jax.random.bernoulli(k_flip, p_flip, (B, 1, 1, 1)).reshape(B)
    kb, kc, ks, kh, kp = jax.random.split(k_jit, 5)
    fb = jax.random.uniform(kb, (B, 1, 1, 1), minval=1 - br, maxval=1 + br).reshape(B)
    fc = jax.random.uniform(kc, (B, 1, 1, 1), minval=1 - ct, maxval=1 + ct).reshape(B)
    fs = jax.random.uniform(ks, (B, 1, 1, 1), minval=1 - sat, maxval=1 + sat).reshape(B)
    fh = jax.random.uniform(kh, (B, 1, 1), minval=-hue, maxval=hue).reshape(B)
    jit_apply = jax.random.bernoulli(kp, p_jit, (B, 1, 1, 1)).reshape(B)
    gray_apply = jax.random.bernoulli(k_gray, p_gray, (B, 1, 1, 1)).reshape(B)
    ksig, kbp = jax.random.split(k_blur)
    sigma = jax.random.uniform(
        ksig, (B,), minval=blur_range[0], maxval=blur_range[1]
    )
    blur_apply = jax.random.bernoulli(kbp, p_blur, (B, 1, 1, 1)).reshape(B)
    if k_sol is not None and p_sol > 0:
        sol_apply = jax.random.bernoulli(k_sol, p_sol, (B, 1, 1, 1)).reshape(B)
    else:
        sol_apply = jnp.zeros((B,), jnp.bool_)
    taps = xaug._gaussian_kernel_1d(sigma, KERNEL_RADIUS)  # (B, 13)

    rows = jnp.zeros((B, P_LEN), jnp.float32)
    rows = rows.at[:, P_FLIP].set(flip.astype(jnp.float32))
    rows = rows.at[:, P_JIT].set(jit_apply.astype(jnp.float32))
    rows = rows.at[:, P_FB].set(fb)
    rows = rows.at[:, P_FC].set(fc)
    rows = rows.at[:, P_FS].set(fs)
    rows = rows.at[:, P_FH].set(fh)
    rows = rows.at[:, P_GRAY].set(gray_apply.astype(jnp.float32))
    rows = rows.at[:, P_BLUR].set(blur_apply.astype(jnp.float32))
    rows = rows.at[:, P_SOL].set(sol_apply.astype(jnp.float32))
    rows = rows.at[:, P_TAPS : P_TAPS + N_TAPS].set(taps)
    return rows
