"""Device mesh + sharding helpers.

The reference scales with one-process-per-GPU DDP over NCCL (reference
``utils/utils.py:482-516``). The TPU-native equivalent is a single SPMD
program over a ``jax.sharding.Mesh``: batches are sharded over the ``data``
axis, params are replicated, and XLA emits the gradient/center reductions as
ICI collectives. A ``seq`` axis is reserved for future sequence/context
parallelism (SURVEY.md §5.7) but is size 1 for all parity workloads.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    seq: int = 1,
) -> Mesh:
    """Build a (data, seq) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // seq
    assert data * seq == n, f"mesh {data}x{seq} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, seq)
    return Mesh(dev_array, (DATA_AXIS, SEQ_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
