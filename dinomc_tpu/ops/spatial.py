"""Joint geometric augmentation for segmentation (image + mask).

Replaces the reference's albumentations affine pipeline
(``uavid_dataset.py:47-53`` / ``udd6_dataset.py:39-46``): an ``OneOf``
over {rotate, translate, scale, shear}, applied jointly to image (bilinear)
and mask (nearest), plus joint h/v flips — all as batched on-device ops with
per-sample parameters.

The warp is an inverse-mapped affine about the image center with constant
(0) fill, matching albumentations ``A.Affine`` defaults.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AffineConfig:
    """Per-dataset affine ranges. Defaults = UAVid (``uavid_dataset.py:47-53``);
    UDD6 uses rotate=(-90, 90), p=0.9 (``udd6_dataset.py:39-46``)."""

    rotate_deg: float = 10.0
    translate_frac: float = 0.05
    scale_range: Tuple[float, float] = (0.9, 1.1)
    shear_deg: float = 5.0
    # albumentations OneOf inner weights (rotate, translate, scale, shear)
    weights: Tuple[float, float, float, float] = (0.7, 0.5, 0.5, 0.5)
    p: float = 0.8


UAVID_AFFINE = AffineConfig()
UDD6_AFFINE = AffineConfig(
    rotate_deg=90.0, weights=(0.7, 0.2, 0.5, 0.5), p=0.9
)


def _affine_matrices(rng: jax.Array, B: int, cfg: AffineConfig) -> jnp.ndarray:
    """Per-sample 2x3 inverse maps (output px -> input px, center-origin).

    Each sample applies ONE of the four transforms (OneOf), chosen with the
    configured weights, with probability cfg.p overall.
    """
    k_choice, k_apply, k_rot, k_tx, k_ty, k_sc, k_sh = jax.random.split(rng, 7)
    w = jnp.asarray(cfg.weights)
    choice = jax.random.categorical(k_choice, jnp.log(w / w.sum()), shape=(B,))
    apply = jax.random.bernoulli(k_apply, cfg.p, (B,))

    theta = jax.random.uniform(
        k_rot, (B,), minval=-cfg.rotate_deg, maxval=cfg.rotate_deg
    ) * (jnp.pi / 180.0)
    tx = jax.random.uniform(k_tx, (B,), minval=-cfg.translate_frac, maxval=cfg.translate_frac)
    ty = jax.random.uniform(k_ty, (B,), minval=-cfg.translate_frac, maxval=cfg.translate_frac)
    sc = jax.random.uniform(k_sc, (B,), minval=cfg.scale_range[0], maxval=cfg.scale_range[1])
    sh = jax.random.uniform(
        k_sh, (B,), minval=-cfg.shear_deg, maxval=cfg.shear_deg
    ) * (jnp.pi / 180.0)

    on = lambda which, val, ident: jnp.where(
        apply & (choice == which), val, jnp.full_like(val, ident)
    )
    theta = on(0, theta, 0.0)
    tx = on(1, tx, 0.0)
    ty = on(1, ty, 0.0)
    sc = on(2, sc, 1.0)
    sh = on(3, sh, 0.0)

    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # forward map: rotate*scale*shear then translate; inverse map derived
    # analytically for the single-transform-at-a-time case.
    inv_sc = 1.0 / sc
    # inverse of rotation: [cos sin; -sin cos]; inverse of shear-x: [1 -tan; 0 1]
    a = cos * inv_sc
    b = sin * inv_sc - jnp.tan(sh)
    c = -sin * inv_sc
    d = cos * inv_sc
    return jnp.stack([a, b, tx, c, d, ty], axis=1)  # (B, 6)


def _warp(
    images: jnp.ndarray,  # (B, H, W, C) float
    mats: jnp.ndarray,  # (B, 6) inverse maps (unit translate = fraction)
    method: str,
) -> jnp.ndarray:
    B, H, W, C = images.shape
    ys = jnp.arange(H, dtype=jnp.float32) - (H - 1) / 2.0
    xs = jnp.arange(W, dtype=jnp.float32) - (W - 1) / 2.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)

    def one(img, m):
        a, b, tx, c, d, ty = m
        src_x = a * gx + b * gy - tx * W + (W - 1) / 2.0
        src_y = c * gx + d * gy - ty * H + (H - 1) / 2.0
        inside = (src_x >= 0) & (src_x <= W - 1) & (src_y >= 0) & (src_y <= H - 1)
        if method == "nearest":
            ix = jnp.clip(jnp.round(src_x).astype(jnp.int32), 0, W - 1)
            iy = jnp.clip(jnp.round(src_y).astype(jnp.int32), 0, H - 1)
            out = img[iy, ix]
        else:
            x0 = jnp.clip(jnp.floor(src_x).astype(jnp.int32), 0, W - 1)
            y0 = jnp.clip(jnp.floor(src_y).astype(jnp.int32), 0, H - 1)
            x1 = jnp.clip(x0 + 1, 0, W - 1)
            y1 = jnp.clip(y0 + 1, 0, H - 1)
            fx = jnp.clip(src_x - x0, 0.0, 1.0)[..., None]
            fy = jnp.clip(src_y - y0, 0.0, 1.0)[..., None]
            out = (
                img[y0, x0] * (1 - fx) * (1 - fy)
                + img[y0, x1] * fx * (1 - fy)
                + img[y1, x0] * (1 - fx) * fy
                + img[y1, x1] * fx * fy
            )
        return jnp.where(inside[..., None], out, jnp.zeros_like(out))

    return jax.vmap(one)(images, mats)


def random_affine_pair(
    rng: jax.Array,
    images: jnp.ndarray,  # (B, H, W, 3) float
    masks: jnp.ndarray,  # (B, H, W) int
    cfg: AffineConfig = UAVID_AFFINE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the SAME per-sample affine to image (bilinear) and mask
    (nearest). Out-of-bounds fill: 0 (albumentations default cval)."""
    B = images.shape[0]
    mats = _affine_matrices(rng, B, cfg)
    out_img = _warp(images, mats, "bilinear")
    out_mask = _warp(
        masks[..., None].astype(jnp.float32), mats, "nearest"
    )[..., 0].astype(masks.dtype)
    return out_img, out_mask


def joint_flip(
    rng: jax.Array,
    images: jnp.ndarray,
    masks: jnp.ndarray,
    p_h: float = 0.5,
    p_v: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Joint horizontal/vertical flips (``uavid_dataset.py`` train transform:
    hflip .5, vflip .2; UDD6 uses vflip .5)."""
    kh, kv = jax.random.split(rng)
    B = images.shape[0]
    fh = jax.random.bernoulli(kh, p_h, (B, 1, 1))
    fv = jax.random.bernoulli(kv, p_v, (B, 1, 1))
    images = jnp.where(fh[..., None], images[:, :, ::-1, :], images)
    masks = jnp.where(fh, masks[:, :, ::-1], masks)
    images = jnp.where(fv[..., None], images[:, ::-1, :, :], images)
    masks = jnp.where(fv, masks[:, ::-1, :], masks)
    return images, masks
