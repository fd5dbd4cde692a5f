"""DINO loss with teacher centering.

Parity target: reference ``DINOLoss`` (``main_dino_mc.py:419-473``):
  * student logits / student_temp (0.1), chunked per crop;
  * teacher softmax of (logits - center) / teacher_temp, where teacher_temp
    is linearly warmed per epoch (see core/schedules.teacher_temp_schedule);
  * cross-entropy summed over all (teacher_crop, student_crop) pairs,
    skipping the same-view pair (``:451-458``), averaged over pairs;
  * center EMA (momentum 0.9) updated from the global batch mean of teacher
    logits. The reference does a ``dist.all_reduce`` here
    (``main_dino_mc.py:463-473``); under SPMD the ``jnp.mean`` over a
    batch-sharded array already reduces globally — XLA emits the ICI
    collective, no hand-written communication.

The loss is a pure function: ``(student, teacher, center, ...) ->
(loss, new_center)``; the center lives in the train state.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def dino_loss(
    student_logits: jnp.ndarray,  # (n_crops, B, K) float32
    teacher_logits: jnp.ndarray,  # (n_globals, B, K) float32
    center: jnp.ndarray,  # (K,) float32
    teacher_temp: jnp.ndarray,  # scalar (traced; per-epoch schedule)
    student_temp: float = 0.1,
    center_momentum: float = 0.9,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (scalar loss, updated center)."""
    n_crops = student_logits.shape[0]
    n_globals = teacher_logits.shape[0]

    student_logp = jax.nn.log_softmax(student_logits / student_temp, axis=-1)
    teacher_q = jax.nn.softmax(
        (jax.lax.stop_gradient(teacher_logits) - center) / teacher_temp, axis=-1
    )

    # CE for every (teacher view iq, student view v) pair: (n_globals, n_crops)
    # pair_ce[iq, v] = mean_B sum_K -q * log p
    pair_ce = -jnp.einsum("ibk,jbk->ij", teacher_q, student_logp) / student_logp.shape[1]
    mask = 1.0 - jnp.eye(n_globals, n_crops)  # skip same-view pairs
    total_loss = jnp.sum(pair_ce * mask)
    n_loss_terms = n_globals * n_crops - min(n_globals, n_crops)
    total_loss = total_loss / n_loss_terms

    # Center update: global mean over all teacher rows (views x global batch).
    batch_center = jnp.mean(teacher_logits.reshape(-1, teacher_logits.shape[-1]), axis=0)
    new_center = center * center_momentum + batch_center * (1.0 - center_momentum)
    return total_loss, jax.lax.stop_gradient(new_center)
