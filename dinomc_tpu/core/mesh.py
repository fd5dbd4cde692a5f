"""Device mesh + sharding helpers.

The reference scales with one-process-per-GPU DDP over NCCL (reference
``utils/utils.py:482-516``). The TPU-native equivalent is a single SPMD
program over a ``jax.sharding.Mesh``: batches are sharded over the ``data``
axis, params are replicated, and XLA emits the gradient/center reductions as
ICI collectives.

Two further axes are first-class:
  * ``model`` — tensor parallelism for the DINO head's 65536-wide
    weight-normed last layer (the largest tensor and activation in the
    whole model: at out_dim 65536 the per-step logits are
    (n_crops*B, 65536)). Sharding its output dim splits the weight, the
    Adam moments, the EMA copy, the center, and the logits across chips;
    the softmax/CE reductions become ICI collectives emitted by GSPMD.
    See ``dino_state_shardings``.
  * ``seq`` — sequence/context parallelism (SURVEY.md §5.7): the ViT
    token axis shards across this axis and attention runs as ring
    attention (``ops/ring_attention.py``, ``models/vit.vit_forward_sp``;
    seg CLI ``--seq_parallel``). Size 1 for all parity workloads — the
    4097-token 512 px segmentation path fits one chip comfortably with
    flash attention, but scales over ``seq`` when sharded.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    seq: int = 1,
    model: int = 1,
) -> Mesh:
    """Build a (data, seq, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // (seq * model)
    assert data * seq * model == n, f"mesh {data}x{seq}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, seq, model)
    return Mesh(dev_array, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over BOTH the data and model axes.

    Sharding over ``model`` too keeps the backbone forward/backward (the
    dominant FLOPs) data-parallel across the model-axis chips — the head's
    out_dim-sharded last layer is where GSPMD reshards. With only
    ``P(data)``, the model-axis chips would redundantly recompute the whole
    backbone on identical samples. Degenerates to ``P(data)`` when the
    model axis is size 1."""
    return NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


FSDP_MIN_SIZE = 2**14  # don't bother sharding tiny leaves


def _fsdp_spec(mesh: Mesh, x) -> P:
    """ZeRO-style spec: shard the largest dim divisible by the data-axis
    size (ties -> last such dim); replicate if nothing qualifies."""
    n_data = mesh.shape[DATA_AXIS]
    if n_data <= 1 or x.ndim == 0 or x.size < FSDP_MIN_SIZE:
        return P()
    best = None
    for d in range(x.ndim):
        if x.shape[d] % n_data == 0 and x.shape[d] > 1:
            if best is None or x.shape[d] >= x.shape[best]:
                best = d
    if best is None:
        return P()
    spec = [None] * x.ndim
    spec[best] = DATA_AXIS
    return P(*spec)


def dino_state_shardings(mesh: Mesh, state, fsdp: bool = False):
    """NamedSharding pytree for a ``DinoTrainState``.

    Tensor parallelism (``model`` axis) — by param path, wherever the leaf
    appears (student, teacher, Adam mu/nu):
      * ``head/last_layer/v`` (bottleneck, out_dim): out_dim sharded;
      * ``head/last_layer/g`` (out_dim,): sharded;
      * the DINO ``center`` (out_dim,): sharded.

    ``fsdp=True`` additionally ZeRO-shards every other sizeable param /
    optimizer-moment / EMA leaf over the ``data`` axis (XLA all-gathers at
    use and keeps the optimizer/EMA update local to each shard) — the
    memory lever for the bigger encoders (WRN-50-2, ViT-B) at scale.

    On a (n, 1, 1) mesh with fsdp=False this degenerates to full
    replication, so it is safe as the default placement.
    """

    def spec_for(path, x) -> NamedSharding:
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        joined = "/".join(keys)
        if joined.endswith("last_layer/v") and x.ndim == 2:
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        if joined.endswith("last_layer/g") and x.ndim == 1:
            return NamedSharding(mesh, P(MODEL_AXIS))
        if keys and keys[-1] == "center" and x.ndim == 1:
            return NamedSharding(mesh, P(MODEL_AXIS))
        if fsdp and keys and keys[0] in (
            "student", "teacher", "opt_state"
        ) and keys[-1] != "count":
            return NamedSharding(mesh, _fsdp_spec(mesh, x))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, state)


def shard_dino_state(mesh: Mesh, state, fsdp: bool = False):
    """Place a DinoTrainState on the mesh with head-TP (+ optional FSDP)
    shardings."""
    return jax.tree_util.tree_map(
        jax.device_put, state, dino_state_shardings(mesh, state, fsdp=fsdp)
    )
