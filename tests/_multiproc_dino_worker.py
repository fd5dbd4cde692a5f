"""Worker process for the real multi-process distributed test.

Launched (twice) by tests/test_multiprocess.py: each process owns 4 virtual
CPU devices, joins a 2-process jax.distributed cluster (8 global devices),
loads its OWN shard of a deterministic synthetic dataset through
ShardedSampler + PrefetchLoader (make_array_from_process_local_data path),
and runs two DINO train steps over the global mesh. Prints the per-step
losses for the parent to compare across ranks and against a single-process
run on the same global batch.

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
import jax.numpy as jnp  # noqa: E402

from dinomc_tpu.core import schedules  # noqa: E402
from dinomc_tpu.core.mesh import batch_sharding, make_mesh, replicate  # noqa: E402
from dinomc_tpu.data.loader import PrefetchLoader, ShardedSampler  # noqa: E402
from dinomc_tpu.train.dino_trainer import (  # noqa: E402
    DinoConfig,
    DinoSchedules,
    dino_train_step,
    init_dino_train_state,
)


class DeterministicImages:
    """dataset[i] -> image derived only from the global index i."""

    def __init__(self, n, size):
        self.n, self.size = n, size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.random.RandomState(1000 + i).rand(
            self.size, self.size, 3
        ).astype(np.float32)


cfg = DinoConfig(
    arch="vit_tiny", patch_size=8, out_dim=128, niter_per_ep=2,
    global_crop_size=32, drop_path_rate=0.0,
)
mesh = make_mesh(jax.devices())  # (8, 1, 1) global data mesh

dataset = DeterministicImages(16, 32)
sampler = ShardedSampler(
    len(dataset), batch_size=8, shuffle=False, num_shards=2, shard_id=rank
)
loader = PrefetchLoader(dataset, sampler, sharding=batch_sharding(mesh))

state = replicate(mesh, init_dino_train_state(jax.random.PRNGKey(0), cfg))
epochs = 2
sch = replicate(
    mesh,
    DinoSchedules(
        lr=jnp.asarray(schedules.cosine_scheduler(1e-3, 1e-6, epochs, cfg.niter_per_ep)),
        wd=jnp.asarray(schedules.cosine_scheduler(0.04, 0.4, epochs, cfg.niter_per_ep)),
        teacher_momentum=jnp.asarray(
            schedules.cosine_scheduler(0.996, 1.0, epochs, cfg.niter_per_ep)
        ),
        teacher_temp=jnp.asarray(schedules.teacher_temp_schedule(0.04, 0.07, 1, epochs)),
    ),
)

from functools import partial  # noqa: E402


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def step(state, raw, sch, cfg):
    # fixed "crops" derived from the batch itself (keeps the test about the
    # distributed runtime, not the augmentation pipeline); inside jit since
    # eager ops can't touch non-fully-addressable global arrays
    g = jnp.stack([raw, raw[:, ::-1, ::-1]], axis=0)
    locals_ = (raw[:, 4:28, 4:28], raw[:, :16, :16])
    return dino_train_step(state, g, locals_, sch, cfg)


losses = []
for raw in loader:  # raw: GLOBAL (16, 32, 32, 3), this process fed rows rank::2
    state, metrics = step(state, raw, sch, cfg)
    losses.append(float(metrics["loss"]))

print("LOSSES", rank, " ".join(f"{x:.6f}" for x in losses), flush=True)
assert all(np.isfinite(x) for x in losses)
