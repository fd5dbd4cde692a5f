"""Worker process for the real multi-process distributed test.

Launched (twice) by tests/test_multiprocess.py: each process owns 4 virtual
CPU devices, joins a 2-process jax.distributed cluster (8 global devices),
loads its OWN shard of a deterministic synthetic dataset through
ShardedSampler + PrefetchLoader (make_array_from_process_local_data path),
and runs TWO DINO train steps over the global mesh. Prints the per-step
losses for the parent to compare across ranks and against a single-process
run on the same global batches.

Model/config/step code is imported from tests/_multiproc_common.py — the
same module the single-process reference uses, so the comparison cannot
drift.

This is the TPU-native analog of the reference's NCCL/DDP multi-worker path
(``utils/utils.py:482-516``) actually exercised with more than one process.
"""

import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from dinomc_tpu.parallel.distributed import (  # noqa: E402
    get_rank,
    get_world_size,
    init_distributed_mode,
)

init_distributed_mode(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
)
assert get_world_size() == 2 and get_rank() == rank
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import numpy as np  # noqa: E402

import _multiproc_common as common  # noqa: E402
from dinomc_tpu.core.mesh import batch_sharding, make_mesh, replicate  # noqa: E402
from dinomc_tpu.data.loader import PrefetchLoader, ShardedSampler  # noqa: E402
from dinomc_tpu.train.dino_trainer import init_dino_train_state  # noqa: E402

cfg = common.make_cfg()
mesh = make_mesh(jax.devices())  # (8, 1, 1) global data mesh

sampler = ShardedSampler(
    common.N_SAMPLES, batch_size=common.BATCH_PER_RANK, shuffle=False,
    num_shards=2, shard_id=rank,
)
loader = PrefetchLoader(
    common.DeterministicImages(), sampler, sharding=batch_sharding(mesh)
)

state = replicate(mesh, init_dino_train_state(jax.random.PRNGKey(0), cfg))
sch = replicate(mesh, common.make_schedules(cfg))
step = common.make_step()

losses = []
for raw in loader:  # raw: GLOBAL (16, 32, 32, 3); this process fed rows rank::2
    state, metrics = step(state, raw, sch, cfg)
    losses.append(float(metrics["loss"]))

assert len(losses) == 2, losses  # two optimizer steps actually ran
print("LOSSES", rank, " ".join(f"{x:.6f}" for x in losses), flush=True)
assert all(np.isfinite(x) for x in losses)

# Cross-process host-side reductions (reference utils/utils.py:257-268,
# 301-325): reduce_dict averaging/summing and MetricLogger meter sync.
from dinomc_tpu.parallel.distributed import reduce_dict  # noqa: E402
from dinomc_tpu.utils.logging import MetricLogger  # noqa: E402

rd = reduce_dict({"a": float(rank), "b": 2.0 * rank + 1.0}, average=True)
assert abs(float(rd["a"]) - 0.5) < 1e-6, rd
assert abs(float(rd["b"]) - 2.0) < 1e-6, rd
rd_sum = reduce_dict({"a": float(rank)}, average=False)
assert abs(float(rd_sum["a"]) - 1.0) < 1e-6, rd_sum

ml = MetricLogger()
ml.update(loss=float(rank + 1))  # rank0 sees 1.0, rank1 sees 2.0
ml.synchronize_between_processes()
assert ml.meters["loss"].count == 2, ml.meters["loss"].count
assert abs(ml.meters["loss"].global_avg - 1.5) < 1e-6
print("REDUCE_OK", rank, flush=True)
