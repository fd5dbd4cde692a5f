"""Serialized inference export (serving artifact).

Beyond the reference's capabilities: `jax.export` serializes a jitted
inference function (segmentation predict, classification logits, or
backbone features) with its weights baked in, producing a single
StableHLO artifact that a serving binary can load and run without Python
model code. This is the production/serving path implied by the project's
deployment goals.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def export_fn(
    fn: Callable,
    example_args: Sequence,
    path: str,
) -> int:
    """Serialize jit(fn) at the example shapes; returns byte size."""
    exported = jax.export.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_exported(path: str):
    """Load a serialized artifact; returns a callable (via .call)."""
    with open(path, "rb") as f:
        blob = f.read()
    exported = jax.export.deserialize(blob)
    return exported.call


def export_seg_model(
    params,
    bn_state,
    cfg,
    path: str,
    image_size: int = 224,
    batch: int = 1,
) -> int:
    """Export an eval-mode segmentation predictor: (B, S, S, 3) -> logits."""
    from dinomc_tpu.train.seg_trainer import seg_predict

    def fn(images):
        return seg_predict(params, bn_state, images, cfg)

    example = (jnp.zeros((batch, image_size, image_size, 3), jnp.float32),)
    return export_fn(fn, example, path)


def export_classifier(
    params,
    bn_state,
    cfg,
    path: str,
    image_size: int = 224,
    batch: int = 1,
) -> int:
    from dinomc_tpu.train.cls_trainer import cls_predict

    def fn(images):
        return cls_predict(params, bn_state, images, cfg)

    example = (jnp.zeros((batch, image_size, image_size, 3), jnp.float32),)
    return export_fn(fn, example, path)
