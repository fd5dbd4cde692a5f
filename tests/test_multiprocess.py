"""REAL multi-process distributed test: 2 jax.distributed processes x 4
virtual CPU devices = an 8-device global mesh, per-process data loading.

The reference "tests" its NCCL/DDP path only by running on SLURM
(SURVEY.md §4); here the multi-host runtime (parallel/distributed.py, the
loader's make_array_from_process_local_data path, global-mesh SPMD steps)
is exercised in-repo: both ranks must agree on every loss, and the
2-process run must match a single-process run over the same global batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multiproc_dino_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse_losses(out: str, rank: int):
    for line in out.splitlines():
        if line.startswith("LOSSES"):
            parts = line.split()
            assert int(parts[1]) == rank
            return [float(x) for x in parts[2:]]
    raise AssertionError(f"no LOSSES line in rank-{rank} output:\n{out}")


def test_two_process_dino_step_matches_single_process():
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for rank in range(2)
    ]
    outs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    losses0 = _parse_losses(outs[0], 0)
    losses1 = _parse_losses(outs[1], 1)
    # SPMD: both processes execute the same global program
    np.testing.assert_allclose(losses0, losses1, rtol=0, atol=0)
    assert all(np.isfinite(x) for x in losses0) and losses0

    # single-process reference over the SAME global batch (device order:
    # process 0's rows [0,2,4,6,...] then process 1's [1,3,5,7,...])
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from functools import partial

    from dinomc_tpu.core import schedules
    from dinomc_tpu.core.mesh import batch_sharding, make_mesh, replicate, shard_batch
    from dinomc_tpu.train.dino_trainer import (
        DinoConfig,
        DinoSchedules,
        dino_train_step,
        init_dino_train_state,
    )

    cfg = DinoConfig(
        arch="vit_tiny", patch_size=8, out_dim=128, niter_per_ep=2,
        global_crop_size=32, drop_path_rate=0.0,
    )
    mesh = make_mesh(jax.devices())
    order = list(range(0, 16, 2)) + list(range(1, 16, 2))
    raw_np = np.stack(
        [
            np.random.RandomState(1000 + i).rand(32, 32, 3).astype(np.float32)
            for i in order
        ]
    )
    raw = shard_batch(mesh, raw_np)
    state = replicate(mesh, init_dino_train_state(jax.random.PRNGKey(0), cfg))
    epochs = 2
    sch = replicate(
        mesh,
        DinoSchedules(
            lr=jnp.asarray(
                schedules.cosine_scheduler(1e-3, 1e-6, epochs, cfg.niter_per_ep)
            ),
            wd=jnp.asarray(
                schedules.cosine_scheduler(0.04, 0.4, epochs, cfg.niter_per_ep)
            ),
            teacher_momentum=jnp.asarray(
                schedules.cosine_scheduler(0.996, 1.0, epochs, cfg.niter_per_ep)
            ),
            teacher_temp=jnp.asarray(
                schedules.teacher_temp_schedule(0.04, 0.07, 1, epochs)
            ),
        ),
    )

    @partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
    def step(state, raw, sch, cfg):
        g = jnp.stack([raw, raw[:, ::-1, ::-1]], axis=0)
        locals_ = (raw[:, 4:28, 4:28], raw[:, :16, :16])
        return dino_train_step(state, g, locals_, sch, cfg)

    state, metrics = step(state, raw, sch, cfg)
    np.testing.assert_allclose(
        float(metrics["loss"]), losses0[0], rtol=5e-5, atol=5e-5
    )
