"""Tracing / profiling hooks.

The reference has no profiler (SURVEY.md §5.1 — only MetricLogger
wall-clock timing). Here: thin wrappers over ``jax.profiler`` so any
training loop can capture XLA traces viewable in TensorBoard/Perfetto,
plus a step timer that forces a host sync (required on the axon relay,
where ``block_until_ready`` returns early) and a device-memory snapshot.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (shows up in the timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def sync(tree) -> None:
    """Force completion of all device work reachable from ``tree``.

    Uses a host transfer of a scalar reduction; ``block_until_ready`` is
    not reliable on the axon TPU relay.
    """
    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    if leaves:
        float(jnp.asarray(leaves[0]).astype(jnp.float32).sum())


class StepTimer:
    """Wall-clock step timing with optional periodic device sync."""

    def __init__(self, sync_every: int = 10):
        self.sync_every = sync_every
        self._count = 0
        self._last = time.perf_counter()
        self.history: list = []

    def step(self, outputs=None) -> Optional[float]:
        """Call once per train step; returns ms for synced steps."""
        self._count += 1
        if self._count % self.sync_every == 0 and outputs is not None:
            sync(outputs)
            now = time.perf_counter()
            ms = (now - self._last) / self.sync_every * 1000.0
            self._last = now
            self.history.append(ms)
            return ms
        return None


def device_memory_stats() -> Dict[str, float]:
    """Bytes in use / limit for device 0 (MB), when the backend reports it."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        stats = {}
    out = {}
    if "bytes_in_use" in stats:
        out["mb_in_use"] = stats["bytes_in_use"] / 1e6
    if "bytes_limit" in stats:
        out["mb_limit"] = stats["bytes_limit"] / 1e6
    return out
