"""Multi-host runtime initialization.

TPU-native replacement for the reference's NCCL/DDP bootstrap
(``init_distributed_mode``, ``utils/utils.py:482-516``): there are no
process groups to wire by hand — ``jax.distributed.initialize()`` discovers
the TPU slice topology (or honors the standard env vars), after which every
jitted computation over a ``Mesh`` is a single SPMD program with XLA
emitting the collectives over ICI/DCN.

Also provides the reference's rank-gating helpers (``get_world_size`` /
``get_rank`` / ``is_main_process`` / ``save_on_master`` /
``setup_for_distributed``, ``utils/utils.py:446-479``) in process terms.
"""

from __future__ import annotations

import builtins
import os
from typing import Optional

import jax


def init_distributed_mode(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX if needed; no-op for single-process runs.

    On TPU pods the arguments are auto-detected from the metadata server;
    explicit args (or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env) cover manual launches — the SLURM_PROCID path of the
    reference maps onto these env vars.
    """
    env_np = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if env_np <= 1 and coordinator_address is None:
        return  # single process — nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def save_on_master(save_fn, *args, **kwargs) -> None:
    """Run a host-side save only on rank 0 (``utils/utils.py:462-464``).
    Note: orbax checkpointing coordinates multi-host writes itself; this is
    for ad-hoc artifacts (logs, CSVs, visualizations)."""
    if is_main_process():
        save_fn(*args, **kwargs)


def reduce_dict(input_dict: dict, average: bool = True) -> dict:
    """Sum (or average) a dict of host-side scalars/arrays across processes
    (reference ``reduce_dict``, ``utils/utils.py:301-325``).

    Under SPMD, metrics computed inside a jitted step over a global mesh are
    already globally reduced by XLA; this covers host-side accumulators
    (eval counters, meter totals) gathered over DCN. Values must share a
    shape per key (scalars in practice). Single process: returns a copy.
    """
    if get_world_size() < 2:
        return dict(input_dict)
    import numpy as np
    from jax.experimental import multihost_utils

    keys = sorted(input_dict.keys())
    stacked = np.stack([np.asarray(input_dict[k], np.float32) for k in keys])
    reduced = np.asarray(multihost_utils.process_allgather(stacked)).sum(axis=0)
    if average:
        reduced = reduced / get_world_size()
    return {k: reduced[i] for i, k in enumerate(keys)}


def setup_for_distributed(is_master: Optional[bool] = None) -> None:
    """Gate print() to the master process unless ``force=True`` is passed
    (``utils/utils.py:467-479``)."""
    master = is_main_process() if is_master is None else is_master
    builtin_print = builtins.print

    def print_gated(*args, **kwargs):
        force = kwargs.pop("force", False)
        if master or force:
            builtin_print(*args, **kwargs)

    builtins.print = print_gated
