"""Orbax-based checkpointing.

TPU-native replacement for the reference's raw ``torch.save`` dicts +
``restart_from_checkpoint`` (``utils/utils.py:165-197``,
``main_dino_mc.py:310-345``): epoch/step-granular save of the full train
state (student, teacher, optimizer, center, rng), keep-last-N rotation plus
periodic keeps (reference ``saveckp_freq``), best-metric tracking for the
seg/classification loops, and restart-from-latest on preemption
(the submitit requeue path, ``run_dino_with_submitit.py:71-78`` — under
orbax a rescheduled job simply resumes from the newest step).

Only one host writes in multi-host runs — orbax handles the
``save_on_master`` semantics (``utils/utils.py:462-464``) internally.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager for step-indexed states."""

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 2,
        keep_period: Optional[int] = None,
        best_mode: Optional[str] = None,  # 'max' | 'min' | None
        metric_name: str = "metric",
    ):
        self._metric_name = metric_name
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            keep_period=keep_period,
            best_fn=(lambda m: m[metric_name]) if best_mode else None,
            best_mode=best_mode or "max",
            create=True,
        )
        self._mgr = ocp.CheckpointManager(_abs(directory), options=options)

    def save(self, step: int, state: Any, metric: Optional[float] = None) -> None:
        """NOTE: when the training step donates its state buffers, pass
        ``jax.device_get(state)`` (host copy) — an async save reading device
        arrays races with the next step's buffer donation."""
        metrics = {self._metric_name: float(metric)} if metric is not None else None
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics
        )

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_pytree(path: str, tree: Any) -> None:
    """One-shot save of a pytree (e.g. final weights export)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abs(path), tree, force=True)
    ckptr.wait_until_finished()


def restore_pytree(path: str, template: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(_abs(path), template)
    return ckptr.restore(_abs(path))
