"""Per-iteration schedules.

Parity target: the reference's ``cosine_scheduler`` (reference
``utils/utils.py:200-213``): a precomputed per-iteration array with a linear
warmup from ``start_warmup_value`` to ``base_value`` over ``warmup_epochs``,
followed by a cosine decay from ``base_value`` to ``final_value``.

On TPU we keep the same precomputed-array design: the schedule is a device
array indexed by the (traced) global step inside the jitted train step, so
changing lr/wd/momentum per step costs one dynamic gather, not a recompile.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def cosine_scheduler(
    base_value: float,
    final_value: float,
    epochs: int,
    niter_per_ep: int,
    warmup_epochs: int = 0,
    start_warmup_value: float = 0.0,
) -> np.ndarray:
    """Precomputed per-iteration schedule (numpy, host-side).

    Matches reference ``utils/utils.py:200-213`` numerically: warmup is
    ``np.linspace(start, base, warmup_iters)``; decay is
    ``final + 0.5*(base-final)*(1+cos(pi * i/len))`` over the remaining iters.
    """
    warmup_iters = min(int(warmup_epochs * niter_per_ep), epochs * niter_per_ep)
    warmup_schedule = np.array([])
    if warmup_iters > 0:
        warmup_schedule = np.linspace(start_warmup_value, base_value, warmup_iters)

    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    denom = max(len(iters), 1)
    schedule = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / denom)
    )

    schedule = np.concatenate((warmup_schedule, schedule))
    assert len(schedule) == epochs * niter_per_ep
    return schedule


def linear_scaled_lr(base_lr: float, global_batch_size: int) -> float:
    """DINO linear lr scaling rule: lr * total_batch / 256.

    Reference: ``main_dino_mc.py:293-298``.
    """
    return base_lr * global_batch_size / 256.0


def teacher_temp_schedule(
    warmup_teacher_temp: float,
    teacher_temp: float,
    warmup_teacher_temp_epochs: int,
    epochs: int,
) -> np.ndarray:
    """Per-epoch teacher temperature: linear warmup then constant.

    Reference: ``main_dino_mc.py:431-435``.
    """
    return np.concatenate(
        (
            np.linspace(warmup_teacher_temp, teacher_temp, warmup_teacher_temp_epochs),
            np.ones(epochs - warmup_teacher_temp_epochs) * teacher_temp,
        )
    )


def as_device_array(schedule: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(schedule, dtype=jnp.float32)
