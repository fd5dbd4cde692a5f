"""End-to-end DINO train-step tests on a tiny model, including the sharded
multi-device path over the 8-virtual-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full train-step integration (multi-minute jit compiles)

from dinomc_tpu.core import schedules
from dinomc_tpu.core.mesh import make_mesh, shard_batch, replicate
from dinomc_tpu.train.dino_trainer import (
    DinoConfig,
    DinoSchedules,
    dino_train_step,
    init_dino_train_state,
)

TINY = DinoConfig(
    arch="vit_tiny",
    patch_size=8,
    out_dim=256,
    drop_path_rate=0.1,
    niter_per_ep=2,
    global_crop_size=32,
    clip_grad=3.0,
    freeze_last_layer=1,
)


def _schedules(cfg, epochs=2):
    total = epochs * cfg.niter_per_ep
    return DinoSchedules(
        lr=jnp.asarray(schedules.cosine_scheduler(1e-3, 1e-6, epochs, cfg.niter_per_ep)),
        wd=jnp.asarray(schedules.cosine_scheduler(0.04, 0.4, epochs, cfg.niter_per_ep)),
        teacher_momentum=jnp.asarray(
            schedules.cosine_scheduler(0.996, 1.0, epochs, cfg.niter_per_ep)
        ),
        teacher_temp=jnp.asarray(
            schedules.teacher_temp_schedule(0.04, 0.07, 1, epochs)
        ),
    )


def _batch(B=8, n_locals=3):
    k = jax.random.PRNGKey(0)
    globals_ = jax.random.normal(k, (2, B, 32, 32, 3), jnp.float32)
    local_sizes = [24, 24, 16][:n_locals]
    locals_ = tuple(
        jax.random.normal(jax.random.PRNGKey(i + 1), (B, s, s, 3), jnp.float32)
        for i, s in enumerate(local_sizes)
    )
    return globals_, locals_


def test_train_step_runs_and_loss_finite():
    state = init_dino_train_state(jax.random.PRNGKey(0), TINY)
    sch = _schedules(TINY)
    g, l = _batch()
    state, metrics = dino_train_step(state, g, l, sch, TINY)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_params_change_and_teacher_follows_ema():
    state0 = init_dino_train_state(jax.random.PRNGKey(0), TINY)
    sch = _schedules(TINY)
    g, l = _batch()
    s0 = np.asarray(state0.student["backbone"]["patch_embed"]["kernel"])
    t0 = np.asarray(state0.teacher["backbone"]["patch_embed"]["kernel"])
    state1, _ = dino_train_step(state0, g, l, sch, TINY)
    s1 = np.asarray(state1.student["backbone"]["patch_embed"]["kernel"])
    t1 = np.asarray(state1.teacher["backbone"]["patch_embed"]["kernel"])
    assert not np.allclose(s0, s1)  # student stepped
    m = float(sch.teacher_momentum[0])
    np.testing.assert_allclose(t1, m * t0 + (1 - m) * s1, rtol=1e-4, atol=1e-6)


def test_last_layer_frozen_in_first_epoch():
    state = init_dino_train_state(jax.random.PRNGKey(0), TINY)
    sch = _schedules(TINY)
    g, l = _batch()
    v0 = np.asarray(state.student["head"]["last_layer"]["v"])
    g0 = np.asarray(state.student["head"]["last_layer"]["g"])
    # epoch 0 (< freeze_last_layer=1): last layer must not move
    state, _ = dino_train_step(state, g, l, sch, TINY)
    np.testing.assert_array_equal(np.asarray(state.student["head"]["last_layer"]["v"]), v0)
    # step into epoch 1 (niter_per_ep=2)
    state, _ = dino_train_step(state, g, l, sch, TINY)
    state, _ = dino_train_step(state, g, l, sch, TINY)
    assert not np.allclose(np.asarray(state.student["head"]["last_layer"]["v"]), v0)
    # weight-norm g stays frozen forever when norm_last_layer=True
    np.testing.assert_array_equal(np.asarray(state.student["head"]["last_layer"]["g"]), g0)


def test_center_updates():
    state = init_dino_train_state(jax.random.PRNGKey(0), TINY)
    sch = _schedules(TINY)
    g, l = _batch()
    state, _ = dino_train_step(state, g, l, sch, TINY)
    assert float(jnp.abs(state.center).sum()) > 0


def test_convnet_and_swin_encoders_train():
    """The DINO step must run for resnet50 and swin_t encoders too
    (reference main_dino_mc.py:223-229); BN state must update for resnet."""
    for arch in ("resnet50", "swin_t"):
        cfg = dataclasses.replace(
            TINY, arch=arch, patch_size=16, out_dim=64, global_crop_size=32
        )
        state = init_dino_train_state(jax.random.PRNGKey(0), cfg)
        sch = _schedules(cfg)
        g, l = _batch(B=4, n_locals=2)
        state, metrics = dino_train_step(state, g, l, sch, cfg)
        assert np.isfinite(float(metrics["loss"])), arch
        if arch == "resnet50":
            assert float(
                jnp.abs(state.student_state["stem"]["bn"]["mean"]).sum()
            ) > 0  # BN stats moved
            assert float(
                jnp.abs(state.teacher_state["stem"]["bn"]["mean"]).sum()
            ) > 0  # teacher BN stats updated by its own forward


def test_sharded_train_step_matches_single_device(mesh8):
    """The same batch, replicated vs sharded over 8 devices, must produce the
    same loss (SPMD correctness of the global center/gradient reductions)."""
    state = init_dino_train_state(jax.random.PRNGKey(0), TINY)
    sch = _schedules(TINY)
    g, l = _batch(B=8)

    state_r, metrics_single = dino_train_step(state, g, l, sch, TINY)

    state_sh = replicate(mesh8, init_dino_train_state(jax.random.PRNGKey(0), TINY))
    sch_sh = replicate(mesh8, sch)
    # shard over batch dim (axis 1 for globals: (G, B, ...) -> shard B)
    from jax.sharding import NamedSharding, PartitionSpec as P

    gsh = jax.device_put(g, NamedSharding(mesh8, P(None, "data")))
    lsh = tuple(jax.device_put(x, NamedSharding(mesh8, P("data"))) for x in l)
    state_sh, metrics_sharded = dino_train_step(state_sh, gsh, lsh, sch_sh, TINY)

    np.testing.assert_allclose(
        float(metrics_single["loss"]), float(metrics_sharded["loss"]), rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(state_r.center), np.asarray(state_sh.center), rtol=2e-3, atol=1e-5
    )


def test_grad_accum_matches_big_batch():
    """A=2 microbatches of b=4 must equal one step on the full B=8 batch
    (SGD + no DropPath => gradients are linear in the batch; the averaged
    microbatch grads, the averaged teacher batch-center, and the single
    EMA/optimizer application reproduce the big-batch step exactly)."""
    from dinomc_tpu.train.dino_trainer import dino_train_step_accum

    cfg = dataclasses.replace(TINY, optimizer="sgd", drop_path_rate=0.0)
    sch = _schedules(cfg)
    g, locals_ = _batch(B=8, n_locals=2)

    st_big = init_dino_train_state(jax.random.PRNGKey(0), cfg)
    st_big, m_big = dino_train_step(st_big, g, locals_, sch, cfg)

    st_acc = init_dino_train_state(jax.random.PRNGKey(0), cfg)
    st_acc, m_acc = dino_train_step_accum(st_acc, g, locals_, sch, cfg, accum=2)

    np.testing.assert_allclose(
        float(m_acc["loss"]), float(m_big["loss"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(st_acc.center), np.asarray(st_big.center), rtol=1e-5, atol=1e-6
    )
    for path in (("backbone", "patch_embed", "kernel"),
                 ("head", "last_layer", "v")):
        a, bL = st_acc.student, st_big.student
        for kkey in path:
            a, bL = a[kkey], bL[kkey]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bL), rtol=2e-4, atol=2e-6,
            err_msg=f"param mismatch at {'/'.join(path)}",
        )
    assert int(st_acc.step) == 1


def test_plan_packing_bench_sizes():
    """At the bench multi-crop sizes (patch 8) the planner must pack all
    three pairs, large-with-small, minimizing padded attention work:
    (184,84)->640, (160,124)->640, (144,104)->512."""
    from dinomc_tpu.models.encoders import EncoderConfig
    from dinomc_tpu.train.dino_trainer import _plan_packing

    enc = EncoderConfig(arch="vit_small", patch_size=8)
    sizes = [184, 164, 144, 124, 104, 84]
    work = [(s, jnp.zeros((4, s, s, 3)), [i]) for i, s in enumerate(sizes)]
    pairs, singles = _plan_packing(work, enc)
    assert not singles
    got = sorted((a[0], b[0]) for a, b in pairs)
    assert got == [(144, 104), (164, 124), (184, 84)]
    # larger segment always first
    for a, b in pairs:
        assert (a[0] // 8) ** 2 >= (b[0] // 8) ** 2


def test_plan_packing_same_size_not_packed():
    """Equal-size crops are already batched in one bucket — nothing to pack."""
    from dinomc_tpu.models.encoders import EncoderConfig
    from dinomc_tpu.train.dino_trainer import _plan_packing

    enc = EncoderConfig(arch="vit_small", patch_size=8)
    work = [(96, jnp.zeros((8, 96, 96, 3)), [0, 1])]
    pairs, singles = _plan_packing(work, enc)
    assert pairs == [] and len(singles) == 1


def test_crop_packing_matches_unpacked():
    """crop_packing=True must reproduce the unpacked step exactly (no
    drop-path, so rng-consumption differences are inert)."""
    cfg_p = dataclasses.replace(TINY, drop_path_rate=0.0, crop_packing=True)
    cfg_u = dataclasses.replace(TINY, drop_path_rate=0.0, crop_packing=False)
    sch = _schedules(cfg_p)
    g, _ = _batch()
    # two DISTINCT local sizes with equal row counts -> one packed pair
    locals_ = tuple(
        jax.random.normal(jax.random.PRNGKey(i + 1), (8, s, s, 3), jnp.float32)
        for i, s in enumerate([24, 16])
    )
    s0 = init_dino_train_state(jax.random.PRNGKey(0), cfg_p)
    s1 = jax.tree_util.tree_map(jnp.copy, s0)
    _, m_p = dino_train_step(s0, g, locals_, sch, cfg_p)
    _, m_u = dino_train_step(s1, g, locals_, sch, cfg_u)
    # same math up to float associativity (XLA tiles the packed-N matmuls
    # differently); exact equivalence is covered in f32 by
    # test_vit.py::test_packed_forward_matches_separate
    np.testing.assert_allclose(
        float(m_p["loss"]), float(m_u["loss"]), rtol=1e-3
    )


def test_bucket_merge_matches_unmerged():
    """bucket_merge=True (merged-GEMM student forward) must reproduce the
    per-bucket step exactly (no drop-path, so rng-consumption differences
    are inert). Exact f32 equivalence of the forward itself is covered by
    test_vit.py::test_multi_forward_matches_separate."""
    cfg_m = dataclasses.replace(TINY, drop_path_rate=0.0, bucket_merge=True)
    cfg_u = dataclasses.replace(TINY, drop_path_rate=0.0, bucket_merge=False)
    sch = _schedules(cfg_m)
    g, locals_ = _batch()
    s0 = init_dino_train_state(jax.random.PRNGKey(0), cfg_m)
    s1 = jax.tree_util.tree_map(jnp.copy, s0)
    _, m_m = dino_train_step(s0, g, locals_, sch, cfg_m)
    _, m_u = dino_train_step(s1, g, locals_, sch, cfg_u)
    np.testing.assert_allclose(
        float(m_m["loss"]), float(m_u["loss"]), rtol=1e-3
    )
