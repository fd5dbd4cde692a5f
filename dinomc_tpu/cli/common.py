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
