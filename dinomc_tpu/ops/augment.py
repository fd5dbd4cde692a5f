"""On-device stochastic image augmentation (batched, jittable).

This replaces the reference's host-side PIL/torchvision pipeline
(``data_process/dino_augmentation.py:7-112``, ``utils/utils.py:40-72``) with
vectorized XLA ops that run on TPU: instead of 10 CPU dataloader workers
doing PIL transforms per image, the whole batch is augmented on device right
before the forward pass — the north-star input-pipeline design
(BASELINE.json).

Parity targets (metric-level; exact PIL bit parity is impossible):
  * RandomResizedCrop, bicubic, per-sample area scale + log-uniform aspect
    (torchvision semantics, without the 10-attempt rejection loop — clamped
    sampling instead);
  * RandomHorizontalFlip p=0.5;
  * ColorJitter(brightness, contrast, saturation, hue) with RandomApply;
  * RandomGrayscale p=0.2; GaussianBlur radius U[0.1, 2.0]; Solarization
    (threshold 128); ImageNet normalize (0.485,0.456,0.406)/(0.229,0.224,0.225).

DINO-MC composition (``dino_augmentation.py:24-52``):
  * global crop 1: rrc(224, global_scale) + flip + jitter(.4,.4,.2,.1)@.8 +
    gray@.2 + blur@1.0;
  * global crop 2: same but blur@.1 + solarize@.2;
  * local crop i (multi-size!): rrc(size_i, local_scale) + flip +
    SimCLR color distortion (jitter(.8,.8,.8,.2)@.8 + gray@.2) + blur@.5.

All probabilistic ops compute both branches and select with a per-sample
mask (`jnp.where`) — the XLA-idiomatic form of RandomApply.

Images are float32 NHWC in [0, 1]. The two batch entry points
(``multicrop_augment`` / ``multicrop_augment_tp``) also accept uint8 NHWC
and convert to f32/255 on device as the first op — the packed-shard loader
(``data/packed.py``) ships uint8 across PCIe for 4x less host->device
traffic.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def random_resized_crop(
    rng: jax.Array,
    images: jnp.ndarray,  # (B, H, W, C)
    out_size: int,
    scale: Tuple[float, float],
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    method: str = "bicubic",
) -> jnp.ndarray:
    """Batched RandomResizedCrop via per-sample scale_and_translate."""
    B, H, W, C = images.shape
    k_area, k_ratio, k_x, k_y = jax.random.split(rng, 4)
    area = H * W
    target_area = jax.random.uniform(k_area, (B,), minval=scale[0], maxval=scale[1]) * area
    log_ratio = jax.random.uniform(
        k_ratio, (B,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    w = jnp.sqrt(target_area * aspect)
    h = jnp.sqrt(target_area / aspect)
    w = jnp.clip(w, 1.0, W)
    h = jnp.clip(h, 1.0, H)
    x0 = jax.random.uniform(k_x, (B,)) * (W - w)
    y0 = jax.random.uniform(k_y, (B,)) * (H - h)

    scale_y = out_size / h
    scale_x = out_size / w

    def crop_one(img, sy, sx, ty, tx):
        return jax.image.scale_and_translate(
            img,
            (out_size, out_size, C),
            (0, 1),
            jnp.stack([sy, sx]),
            jnp.stack([ty, tx]),
            method=method,
        )

    out = jax.vmap(crop_one)(images, scale_y, scale_x, -y0 * scale_y, -x0 * scale_x)
    return jnp.clip(out, 0.0, 1.0)


def random_hflip(rng: jax.Array, images: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    B = images.shape[0]
    flip = jax.random.bernoulli(rng, p, (B, 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def random_vflip(rng: jax.Array, images: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    B = images.shape[0]
    flip = jax.random.bernoulli(rng, p, (B, 1, 1, 1))
    return jnp.where(flip, images[:, ::-1, :, :], images)


def _grayscale(images: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601-2 luma (PIL 'L' mode) broadcast back to 3 channels."""
    gray = (
        0.299 * images[..., 0] + 0.587 * images[..., 1] + 0.114 * images[..., 2]
    )
    return jnp.repeat(gray[..., None], 3, axis=-1)


def random_grayscale(rng: jax.Array, images: jnp.ndarray, p: float = 0.2) -> jnp.ndarray:
    B = images.shape[0]
    apply = jax.random.bernoulli(rng, p, (B, 1, 1, 1))
    return jnp.where(apply, _grayscale(images), images)


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(
    rng: jax.Array,
    images: jnp.ndarray,
    brightness: float,
    contrast: float,
    saturation: float,
    hue: float,
    p: float = 0.8,
) -> jnp.ndarray:
    """torchvision ColorJitter semantics (fixed b,c,s,h order instead of the
    per-sample random order — metric-level parity)."""
    B = images.shape[0]
    kb, kc, ks, kh, kp = jax.random.split(rng, 5)
    shape = (B, 1, 1, 1)
    fb = jax.random.uniform(kb, shape, minval=1 - brightness, maxval=1 + brightness)
    fc = jax.random.uniform(kc, shape, minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(ks, shape, minval=1 - saturation, maxval=1 + saturation)
    fh = jax.random.uniform(kh, (B, 1, 1), minval=-hue, maxval=hue)

    x = images
    # brightness
    x = jnp.clip(x * fb, 0.0, 1.0)
    # contrast: blend with mean of grayscale (torchvision adjust_contrast)
    mean_gray = jnp.mean(_grayscale(x), axis=(1, 2, 3), keepdims=True)
    x = jnp.clip(fc * x + (1 - fc) * mean_gray, 0.0, 1.0)
    # saturation: blend with grayscale
    x = jnp.clip(fs * x + (1 - fs) * _grayscale(x), 0.0, 1.0)
    # hue: shift in HSV space
    if hue > 0:
        hsv = _rgb_to_hsv(x)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + fh) % 1.0)
        x = jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0)

    apply = jax.random.bernoulli(kp, p, (B, 1, 1, 1))
    return jnp.where(apply, x, images)


def _gaussian_kernel_1d(sigma: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(B, 2r+1) normalized Gaussian taps for per-sample traced sigma."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)[None, :]
    k = jnp.exp(-0.5 * (x / sigma[:, None]) ** 2)
    return k / jnp.sum(k, axis=1, keepdims=True)


def gaussian_blur(
    rng: jax.Array,
    images: jnp.ndarray,
    p: float,
    radius_range: Tuple[float, float] = (0.1, 2.0),
    kernel_radius: int = 6,
) -> jnp.ndarray:
    """PIL-style GaussianBlur with per-sample radius U[0.1, 2] (reference
    ``utils/utils.py:40-55``), as a separable depthwise conv."""
    B, H, W, C = images.shape
    ks, kp = jax.random.split(rng)
    sigma = jax.random.uniform(
        ks, (B,), minval=radius_range[0], maxval=radius_range[1]
    )
    taps = _gaussian_kernel_1d(sigma, kernel_radius)  # (B, K)
    K = 2 * kernel_radius + 1
    pad = kernel_radius

    # Separable depthwise conv with PER-SAMPLE kernels: fold the batch into
    # the channel axis (1, H, W, B*C) and use feature_group_count=B*C with
    # each sample's taps repeated across its C channels — one conv instead
    # of K shifted slices (the naive form moved K full copies through HBM).
    per_chan = jnp.repeat(taps, C, axis=0)  # (B*C, K)
    x = images.transpose(1, 2, 0, 3).reshape(1, H, W, B * C)

    def depthwise(x, kern):
        # edge-pad (PIL border semantics), then VALID separable convs
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="edge")
        rhs_h = kern.T.reshape(K, 1, 1, B * C)
        x = jax.lax.conv_general_dilated(
            x, rhs_h.astype(x.dtype), (1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=B * C,
        )
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="edge")
        rhs_w = kern.T.reshape(1, K, 1, B * C)
        x = jax.lax.conv_general_dilated(
            x, rhs_w.astype(x.dtype), (1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=B * C,
        )
        return x

    blurred = depthwise(x, per_chan)
    blurred = blurred.reshape(H, W, B, C).transpose(2, 0, 1, 3)

    apply = jax.random.bernoulli(kp, p, (B, 1, 1, 1))
    return jnp.where(apply, blurred, images)


def random_solarize(
    rng: jax.Array, images: jnp.ndarray, p: float = 0.2, threshold: float = 128.0 / 255.0
) -> jnp.ndarray:
    """PIL ImageOps.solarize (reference ``utils/utils.py:58-72``)."""
    B = images.shape[0]
    apply = jax.random.bernoulli(rng, p, (B, 1, 1, 1))
    sol = jnp.where(images >= threshold, 1.0 - images, images)
    return jnp.where(apply, sol, images)


def normalize(
    images: jnp.ndarray,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> jnp.ndarray:
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return (images - m) / s


def denormalize(
    images: jnp.ndarray,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> jnp.ndarray:
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    return images * s + m


# ---------------------------------------------------------------------------
# DINO-MC multi-crop composition
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MultiCropConfig:
    """Defaults = reference argparse defaults (``main_dino_mc.py:95-132``).

    ``fused``: 'auto' runs the post-crop photometric chain as ONE Pallas
    kernel on TPU (ops/pallas/augment.py) and the unfused XLA ops
    elsewhere; 'on'/'off' force. Both paths draw identical randomness.
    """

    global_size: int = 224
    global_scale: Tuple[float, float] = (0.32, 1.0)
    local_sizes: Tuple[int, ...] = (184, 164, 144, 124, 104, 84)
    local_scale: Tuple[float, float] = (0.05, 0.32)
    fused: str = "auto"


def _use_fused(cfg: MultiCropConfig) -> bool:
    if cfg.fused == "auto":
        return jax.default_backend() == "tpu"
    return cfg.fused == "on"


def _fused_photometric_nhwc(x, params, k_flip):
    """NHWC crop batch -> hflip (XLA; Mosaic has no lane reverse) ->
    planar fused kernel -> NHWC."""
    from dinomc_tpu.ops.pallas.augment import fused_photometric

    x = random_hflip(k_flip, x)
    y = fused_photometric(x.transpose(0, 3, 1, 2), params)
    return y.transpose(0, 2, 3, 1)


def _global_crop(rng, images, cfg: MultiCropConfig, variant: int):
    k = jax.random.split(rng, 6)
    x = random_resized_crop(k[0], images, cfg.global_size, cfg.global_scale)
    if _use_fused(cfg):
        from dinomc_tpu.ops.pallas.augment import draw_photometric_params

        params = draw_photometric_params(
            k[1], k[2], k[3], k[4], k[5] if variant == 1 else None,
            x.shape[0], (0.4, 0.4, 0.2, 0.1), p_jit=0.8, p_gray=0.2,
            p_blur=(1.0 if variant == 0 else 0.1),
            p_sol=(0.2 if variant == 1 else 0.0),
        )
        return _fused_photometric_nhwc(x, params, k[1])
    x = random_hflip(k[1], x)
    x = color_jitter(k[2], x, 0.4, 0.4, 0.2, 0.1, p=0.8)
    x = random_grayscale(k[3], x, p=0.2)
    if variant == 0:
        x = gaussian_blur(k[4], x, p=1.0)
    else:
        x = gaussian_blur(k[4], x, p=0.1)
        x = random_solarize(k[5], x, p=0.2)
    return normalize(x)


def _local_crop(rng, images, size: int, cfg: MultiCropConfig):
    k = jax.random.split(rng, 4)
    x = random_resized_crop(k[0], images, size, cfg.local_scale, method="bilinear")
    if _use_fused(cfg):
        from dinomc_tpu.ops.pallas.augment import draw_photometric_params

        # SimCLR color distortion (dino_augmentation.py:106-112)
        params = draw_photometric_params(
            k[1], k[2], k[3], jax.random.fold_in(rng, 7), None,
            x.shape[0], (0.8, 0.8, 0.8, 0.2), p_jit=0.8, p_gray=0.2,
            p_blur=0.5, p_sol=0.0,
        )
        return _fused_photometric_nhwc(x, params, k[1])
    x = random_hflip(k[1], x)
    # SimCLR color distortion (dino_augmentation.py:106-112)
    x = color_jitter(k[2], x, 0.8, 0.8, 0.8, 0.2, p=0.8)
    x = random_grayscale(k[3], x, p=0.2)
    x = gaussian_blur(jax.random.fold_in(rng, 7), x, p=0.5)
    return normalize(x)


@partial(jax.jit, static_argnames=("cfg",))
def multicrop_augment(
    rng: jax.Array, images: jnp.ndarray, cfg: MultiCropConfig = MultiCropConfig()
):
    """images (B, H, W, 3) in [0,1] -> (globals (2, B, S, S, 3), locals tuple).

    One call produces the full 2-global + N-multi-size-local view set of
    ``DataAugColorMulticrop`` for the whole batch on device. uint8 input
    (the packed-shard loader's wire format) is converted to f32/255 here,
    inside the jit.
    """
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    keys = jax.random.split(rng, 2 + len(cfg.local_sizes))
    g0 = _global_crop(keys[0], images, cfg, 0)
    g1 = _global_crop(keys[1], images, cfg, 1)
    locals_ = tuple(
        _local_crop(keys[2 + i], images, s, cfg) for i, s in enumerate(cfg.local_sizes)
    )
    return jnp.stack([g0, g1], axis=0), locals_


def _tp_photo_aug(rng, images):
    """MCTemporal's class-level augment (``dino_dataset.py:97-104``):
    jitter(0.4,0.4,0.4,0.1)@.8 + grayscale@.2 + blur@.5 + hflip@.5.

    Deliberately NOT routed through the fused Pallas kernel: unlike the MC
    path (kernel on 8 crop batches, measured ~25% faster), TP applies
    photometrics to only 2 full-size pre-crop views and the step is
    dominated by the 9 random_resized_crops — measured on v5e the fused
    form is slightly SLOWER here (41.4 vs 37.3 ms at 4x16x224px; NCHW
    transposes outweigh the fusion win), and above 224 px the kernel's
    per-image VMEM residency (~18 MB at 256 px vs the 16 MB scoped limit)
    overflows anyway. The kernel supports this chain (identity mean/std,
    p_sol=0 — tested in test_fused_augment) if the tradeoff changes."""
    k = jax.random.split(rng, 4)
    x = color_jitter(k[0], images, 0.4, 0.4, 0.4, 0.1, p=0.8)
    x = random_grayscale(k[1], x, p=0.2)
    x = gaussian_blur(k[2], x, p=0.5)
    return random_hflip(k[3], x)


@partial(jax.jit, static_argnames=("cfg", "batch_first"))
def multicrop_augment_tp(
    rng: jax.Array,
    images: jnp.ndarray,
    cfg: MultiCropConfig = MultiCropConfig(),
    batch_first: bool = False,
):
    """DINO-TP temporal variant: images is (4, B, H, W, 3) =
    [t0, t1, t2, t0] (data/seco.MCTemporal layout), or (B, 4, H, W, 3)
    with ``batch_first=True`` — the loader's layout; transposing INSIDE
    the jit matters multi-host, where eager ops cannot touch the loader's
    non-fully-addressable global arrays. Parity with the
    reference composition (``dino_dataset.py:114-128`` +
    ``dino_augmentation.py:70-103``): global views are
    [aug(t1), t2, aug(t0)] — photometric augment on views 1 and 3 — each
    RandomResizedCrop(224); locals are N multi-size crops of the raw t0;
    the crop transforms themselves add no color aug."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    if batch_first:
        images = jnp.moveaxis(images, 1, 0)
    keys = jax.random.split(rng, 5 + len(cfg.local_sizes))
    views = [images[1], images[2], images[3]]
    views[0] = _tp_photo_aug(keys[3], views[0])
    views[2] = _tp_photo_aug(keys[4], views[2])
    globals_ = []
    for i, v in enumerate(views):
        x = random_resized_crop(keys[i], v, cfg.global_size, cfg.global_scale)
        globals_.append(normalize(x))
    locals_ = []
    for i, s in enumerate(cfg.local_sizes):
        x = random_resized_crop(keys[5 + i], images[0], s, cfg.local_scale)
        locals_.append(normalize(x))
    return jnp.stack(globals_, axis=0), tuple(locals_)
