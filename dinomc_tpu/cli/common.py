"""Shared CLI utilities: bool flags, seeding, run directories.

Unifies the reference's two disjoint config systems (argparse entry points
+ the ``CONFIG`` god-object, SURVEY.md §5.6) into argparse fronts over the
typed dataclass configs each trainer already defines.
"""

from __future__ import annotations

import argparse
import os
import random
from typing import Optional

import numpy as np


def bool_flag(s: str) -> bool:
    """Parse boolean CLI args (reference ``bool_flag``,
    ``utils/utils.py:216-227``)."""
    truthy = {"on", "true", "1", "yes"}
    falsy = {"off", "false", "0", "no"}
    if s.lower() in truthy:
        return True
    if s.lower() in falsy:
        return False
    raise argparse.ArgumentTypeError(f"invalid bool value {s!r}")


def set_seed(seed: int) -> None:
    """Host-side seeding (reference ``set_seed``/``fix_random_seeds``;
    device-side randomness flows through explicit jax PRNG keys)."""
    random.seed(seed)
    np.random.seed(seed)


def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def resolve_platform() -> None:
    """Undo the axon sitecustomize platform override when the caller asked
    for CPU via JAX_PLATFORMS (e.g. smoke tests)."""
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def load_pretrained_backbone(path: str, arch: str, checkpoint_key: str = "teacher"):
    """Resolve ``--pretrained_weights`` from either source a reference user
    has: a torch ``.pth`` (reference checkpoints; ``load_pretrained_weights``
    parity, ``utils/utils.py:75-119``) or an orbax checkpoint directory
    saved by this framework's trainers. Returns ``(params, bn_state|None)``.

    ``checkpoint_key``: 'teacher' (default) / 'student' / 'none'.
    """
    key = None if checkpoint_key.lower() == "none" else checkpoint_key
    if os.path.isdir(path):
        from dinomc_tpu.ckpt.orbax_io import restore_pytree

        tree = restore_pytree(path)
        src = tree
        bn = None
        if isinstance(tree, dict) and key and key in tree:
            src = tree[key]
            bn = tree.get(f"{key}_state")
        if isinstance(src, dict) and "backbone" in src:
            src = src["backbone"]
        return src, bn
    from dinomc_tpu.ckpt.torch_import import load_backbone_for_arch

    return load_backbone_for_arch(path, arch, checkpoint_key=key)
