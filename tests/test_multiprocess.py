"""REAL multi-process distributed test: 2 jax.distributed processes x 4
virtual CPU devices = an 8-device global mesh, per-process data loading.

The reference "tests" its NCCL/DDP path only by running on SLURM
(SURVEY.md §4); here the multi-host runtime (parallel/distributed.py, the
loader's make_array_from_process_local_data path, global-mesh SPMD steps)
is exercised in-repo: both ranks must agree on every loss across TWO
optimizer steps, and the 2-process run must match a single-process run
over the same global batches. The model/config/step code is shared with
the workers via tests/_multiproc_common.py so the comparison cannot drift.
"""

import os
import socket
import subprocess
import sys

import numpy as np

import pytest

pytestmark = pytest.mark.slow  # spawns a real 2-process jax.distributed run

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


def test_two_process_dino_steps_match_single_process():
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
    assert len(losses0) == 2  # two optimizer steps, not one
    # SPMD: both processes execute the same global program
    np.testing.assert_allclose(losses0, losses1, rtol=0, atol=0)
    assert all(np.isfinite(x) for x in losses0)
    # reduce_dict + MetricLogger.synchronize_between_processes ran in both
    # workers (asserted rank-side; the marker proves they executed)
    assert "REDUCE_OK" in outs[0] and "REDUCE_OK" in outs[1]

    # single-process reference over the SAME global batches (device order:
    # process 0's rows [0,2,...] then process 1's [1,3,...]), via the same
    # shared helpers the workers use
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tests import _multiproc_common as common
    from dinomc_tpu.core.mesh import make_mesh, replicate, shard_batch
    from dinomc_tpu.train.dino_trainer import init_dino_train_state

    cfg = common.make_cfg()
    mesh = make_mesh(jax.devices())
    state = replicate(mesh, init_dino_train_state(jax.random.PRNGKey(0), cfg))
    sch = replicate(mesh, common.make_schedules(cfg))
    step = common.make_step()

    ref_losses = []
    n, bpr = common.N_SAMPLES, common.BATCH_PER_RANK
    for bi in range(n // (2 * bpr)):
        rows0 = list(range(0, n, 2))[bi * bpr : (bi + 1) * bpr]
        rows1 = list(range(1, n, 2))[bi * bpr : (bi + 1) * bpr]
        raw_np = np.stack(
            [common.deterministic_image(i) for i in rows0 + rows1]
        )
        raw = shard_batch(mesh, raw_np)
        state, metrics = step(state, raw, sch, cfg)
        ref_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(ref_losses, losses0, rtol=5e-5, atol=5e-5)
