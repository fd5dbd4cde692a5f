"""Shared pieces for the multi-process distributed test: the worker
(tests/_multiproc_dino_worker.py) and the in-test single-process reference
(tests/test_multiprocess.py) MUST run byte-identical model/config/step
code for their loss comparison to be meaningful — importing it from here
enforces that structurally."""

from functools import partial

import numpy as np

N_SAMPLES = 32  # 2 shards x 16 -> 2 batches of 8 per rank => 2 train steps
BATCH_PER_RANK = 8
IMG = 32


def deterministic_image(i: int) -> np.ndarray:
    """Image derived only from the global dataset index."""
    return np.random.RandomState(1000 + i).rand(IMG, IMG, 3).astype(np.float32)


class DeterministicImages:
    def __len__(self):
        return N_SAMPLES

    def __getitem__(self, i):
        return deterministic_image(i)


def make_cfg():
    from dinomc_tpu.train.dino_trainer import DinoConfig

    return DinoConfig(
        arch="vit_tiny", patch_size=8, out_dim=128, niter_per_ep=2,
        global_crop_size=IMG, drop_path_rate=0.0,
    )


def make_schedules(cfg):
    import jax.numpy as jnp

    from dinomc_tpu.core import schedules
    from dinomc_tpu.train.dino_trainer import DinoSchedules

    epochs = 2
    return DinoSchedules(
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
    )


def make_step():
    import jax
    import jax.numpy as jnp

    from dinomc_tpu.train.dino_trainer import dino_train_step

    @partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
    def step(state, raw, sch, cfg):
        # fixed "crops" derived from the batch itself (keeps the test about
        # the distributed runtime, not the augmentation pipeline); inside
        # jit since eager ops can't touch non-fully-addressable arrays
        g = jnp.stack([raw, raw[:, ::-1, ::-1]], axis=0)
        locals_ = (raw[:, 4:28, 4:28], raw[:, :16, :16])
        return dino_train_step(state, g, locals_, sch, cfg)

    return step
