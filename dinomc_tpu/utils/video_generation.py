"""DINO attention-map visualization and video generation.

Parity target: ``utils/video_generation.py`` (``VideoGenerator``,
``:40-378``): extract frames from a video (or take a folder of frames),
run ``get_last_selfattention`` per frame, keep the top-attention mass per
head (threshold), render heatmaps, and assemble an output video.

TPU-first: attention for a whole frame batch is one jitted call
(``vit_last_selfattention``); rendering is host-side. Video IO uses cv2
when available and falls back to an animated GIF via PIL (the container
has no guaranteed ffmpeg/cv2).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np


def attention_heatmaps(
    params,
    images: "np.ndarray",  # (B, H, W, 3) float [0,1], normalized NOT applied
    vit_cfg,
    threshold: Optional[float] = 0.6,
) -> np.ndarray:
    """Per-image CLS attention maps, upsampled to pixels: (B, heads, H, W).

    When ``threshold`` is set, keeps the smallest set of patches holding
    that fraction of each head's attention mass (reference ``:150-238``).
    """
    import jax
    import jax.numpy as jnp

    from dinomc_tpu.models.vit import vit_last_selfattention
    from dinomc_tpu.ops.augment import normalize

    B, H, W, _ = images.shape
    p = vit_cfg.patch_size
    gh, gw = H // p, W // p
    x = normalize(jnp.asarray(images))
    attn = vit_last_selfattention(params, x, vit_cfg)  # (B, h, N+1, N+1)
    cls_attn = attn[:, :, 0, 1:]  # (B, h, N)
    nh = cls_attn.shape[1]

    if threshold is not None:
        flat = cls_attn / cls_attn.sum(-1, keepdims=True)
        order = jnp.argsort(flat, axis=-1)[..., ::-1]
        sorted_vals = jnp.take_along_axis(flat, order, axis=-1)
        cum = jnp.cumsum(sorted_vals, axis=-1)
        keep_sorted = cum <= threshold
        # scatter the keep mask back to patch order
        keep = jnp.zeros_like(flat, dtype=bool)
        keep = jnp.take_along_axis(
            keep, order, axis=-1
        )  # placeholder for shape; use scatter via argsort inverse
        inv = jnp.argsort(order, axis=-1)
        keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
        cls_attn = jnp.where(keep, flat, 0.0)

    maps = cls_attn.reshape(B, nh, gh, gw)
    maps = jax.image.resize(maps, (B, nh, H, W), "nearest")
    return np.asarray(maps)


def render_heatmap_frames(
    images: np.ndarray,  # (B, H, W, 3) [0,1]
    maps: np.ndarray,  # (B, heads, H, W)
    alpha: float = 0.5,
    head: Optional[int] = None,
) -> np.ndarray:
    """Overlay mean-over-heads (or one head) attention as red heat. Returns
    (B, H, W, 3) uint8 frames."""
    m = maps[:, head] if head is not None else maps.mean(1)
    m = m / np.maximum(m.max(axis=(1, 2), keepdims=True), 1e-12)
    heat = np.stack([m, np.zeros_like(m), 1.0 - m], axis=-1)
    out = (1 - alpha) * images + alpha * heat
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def extract_frames(video_path: str, out_dir: str, fps: Optional[int] = None) -> List[str]:
    """Video -> frame PNGs (cv2 required for video input)."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    paths = []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        p = os.path.join(out_dir, f"frame_{i:05d}.png")
        cv2.imwrite(p, frame)
        paths.append(p)
        i += 1
    cap.release()
    return paths


def write_video(frames: Sequence[np.ndarray], out_path: str, fps: int = 10) -> str:
    """uint8 frames -> mp4 via cv2, else animated GIF via PIL."""
    try:
        import cv2

        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(
            out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        for f in frames:
            vw.write(f[..., ::-1])  # RGB -> BGR
        vw.release()
        return out_path
    except Exception:
        from PIL import Image

        gif_path = os.path.splitext(out_path)[0] + ".gif"
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(
            gif_path, save_all=True, append_images=imgs[1:],
            duration=int(1000 / fps), loop=0,
        )
        return gif_path


class VideoGenerator:
    """Frames-or-video in, attention video out (reference class parity)."""

    def __init__(self, params, vit_cfg, image_size: int = 224,
                 threshold: Optional[float] = 0.6, batch_size: int = 8):
        self.params = params
        self.vit_cfg = vit_cfg
        self.image_size = image_size
        self.threshold = threshold
        self.batch_size = batch_size

    def _load_frames(self, input_path: str, tmp_dir: str) -> List[str]:
        if os.path.isdir(input_path):
            return sorted(
                str(p) for p in Path(input_path).iterdir()
                if p.suffix.lower() in (".png", ".jpg", ".jpeg")
            )
        return extract_frames(input_path, tmp_dir)

    def generate(self, input_path: str, output_path: str, fps: int = 10,
                 head: Optional[int] = None) -> str:
        from PIL import Image

        frame_paths = self._load_frames(input_path, output_path + "_frames")
        rendered = []
        s = self.image_size
        for i in range(0, len(frame_paths), self.batch_size):
            batch = np.stack([
                np.asarray(
                    Image.open(p).convert("RGB").resize((s, s), Image.BICUBIC),
                    np.float32,
                ) / 255.0
                for p in frame_paths[i : i + self.batch_size]
            ])
            maps = attention_heatmaps(self.params, batch, self.vit_cfg, self.threshold)
            rendered.extend(render_heatmap_frames(batch, maps, head=head))
        return write_video(rendered, output_path, fps)
