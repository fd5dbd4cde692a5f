"""Tensor-parallel DINO head: dp x tp mesh runs must match pure-dp runs.

The ``model`` mesh axis shards the head's weight-normed last layer
(bottleneck, out_dim), its Adam moments, the EMA teacher copy, and the DINO
center (core/mesh.dino_state_shardings). GSPMD turns the softmax/CE
reductions over out_dim into ICI collectives — the math must not change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # dp/tp/fsdp mesh train-step trajectory comparisons

from dinomc_tpu.core import schedules
from dinomc_tpu.core.mesh import (
    MODEL_AXIS,
    dino_state_shardings,
    make_mesh,
    replicate,
    shard_dino_state,
)
from dinomc_tpu.train.dino_trainer import (
    DinoConfig,
    DinoSchedules,
    dino_train_step,
    init_dino_train_state,
)
from jax.sharding import NamedSharding, PartitionSpec as P


def _tiny_cfg():
    return DinoConfig(
        arch="vit_tiny",
        patch_size=8,
        out_dim=512,
        niter_per_ep=2,
        global_crop_size=32,
        drop_path_rate=0.0,
    )


def _setup(cfg):
    epochs = 2
    sch = DinoSchedules(
        lr=jnp.asarray(schedules.cosine_scheduler(1e-3, 1e-6, epochs, cfg.niter_per_ep)),
        wd=jnp.asarray(schedules.cosine_scheduler(0.04, 0.4, epochs, cfg.niter_per_ep)),
        teacher_momentum=jnp.asarray(
            schedules.cosine_scheduler(0.996, 1.0, epochs, cfg.niter_per_ep)
        ),
        teacher_temp=jnp.asarray(
            schedules.teacher_temp_schedule(0.04, 0.07, 1, epochs)
        ),
    )
    B = 8
    rs = np.random.RandomState(0)
    g = jnp.asarray(rs.randn(2, B, 32, 32, 3), jnp.float32)
    locals_ = tuple(
        jnp.asarray(np.random.RandomState(i + 1).randn(B, s, s, 3), jnp.float32)
        for i, s in enumerate((24, 16))
    )
    return sch, g, locals_


def _run_steps(mesh, state, sch, g, locals_, cfg, n=2):
    sch = replicate(mesh, sch)
    # production batch layout: shard over data AND model axes so the
    # backbone stays data-parallel across model-axis chips
    g = jax.device_put(g, NamedSharding(mesh, P(None, ("data", "model"))))
    locals_ = tuple(
        jax.device_put(x, NamedSharding(mesh, P(("data", "model"))))
        for x in locals_
    )
    losses = []
    for _ in range(n):
        state, metrics = dino_train_step(state, g, locals_, sch, cfg)
        losses.append(float(metrics["loss"]))
    return state, losses


def test_tp_head_matches_dp():
    """Multi-step trajectory comparison runs SGD: with Adam the step-1
    update is ~lr*sign(g) (v ~= 0), so the ~1e-7 reduction-order noise TP
    introduces into near-zero gradients flips update signs and inflates to
    ~2*lr per flipped element — an optimizer property, not a sharding bug
    (same rationale as test_fsdp_matches_dp; the Adam/TP composition is
    covered by test_tp_adam_step below and end-to-end by the CLI smoke's
    --model_parallel run)."""
    import dataclasses as dc

    cfg = dc.replace(_tiny_cfg(), optimizer="sgd")
    sch, g, locals_ = _setup(cfg)

    # NOTE: fresh init per run — dino_train_step donates its state, and
    # device_put may alias (not copy) buffers whose sharding already matches,
    # so reusing one initial state across runs would hit deleted arrays.
    mesh_dp = make_mesh(jax.devices())  # (8, 1, 1)
    st_dp = replicate(mesh_dp, init_dino_train_state(jax.random.PRNGKey(0), cfg))
    st_dp, losses_dp = _run_steps(mesh_dp, st_dp, sch, g, locals_, cfg)

    mesh_tp = make_mesh(jax.devices(), data=2, seq=1, model=4)
    st_tp = shard_dino_state(mesh_tp, init_dino_train_state(jax.random.PRNGKey(0), cfg))
    # the last layer really is sharded over the model axis
    v_sh = st_tp.student["head"]["last_layer"]["v"].sharding
    assert v_sh.spec == P(None, MODEL_AXIS)
    assert st_tp.center.sharding.spec == P(MODEL_AXIS)
    st_tp, losses_tp = _run_steps(mesh_tp, st_tp, sch, g, locals_, cfg)

    np.testing.assert_allclose(losses_tp, losses_dp, rtol=2e-4, atol=2e-4)
    # parameters after 2 steps agree
    v_dp = np.asarray(st_dp.student["head"]["last_layer"]["v"])
    v_tp = np.asarray(st_tp.student["head"]["last_layer"]["v"])
    np.testing.assert_allclose(v_tp, v_dp, rtol=2e-3, atol=2e-5)
    # center entries are O(1e-2) means of bf16 teacher logits — different
    # reduction orders across shardings leave ~1e-4 absolute noise
    c_dp = np.asarray(st_dp.center)
    c_tp = np.asarray(st_tp.center)
    np.testing.assert_allclose(c_tp, c_dp, atol=2e-4)


def test_tp_adam_step():
    """Adam over the TP mesh: sharded moments update, first-step loss is
    EXACTLY the dp loss (no update has happened yet), later losses finite.
    The trajectory itself is sign-flip-sensitive (see above) so it is not
    compared elementwise."""
    cfg = _tiny_cfg()
    sch, g, locals_ = _setup(cfg)

    mesh_dp = make_mesh(jax.devices())
    st_dp = replicate(mesh_dp, init_dino_train_state(jax.random.PRNGKey(0), cfg))
    _, losses_dp = _run_steps(mesh_dp, st_dp, sch, g, locals_, cfg, n=1)

    mesh_tp = make_mesh(jax.devices(), data=2, seq=1, model=4)
    st_tp = shard_dino_state(mesh_tp, init_dino_train_state(jax.random.PRNGKey(0), cfg))
    mu_sh = st_tp.opt_state["mu"]["head"]["last_layer"]["v"].sharding
    assert mu_sh.spec == P(None, MODEL_AXIS), "Adam moments must shard with the param"
    st_tp, losses_tp = _run_steps(mesh_tp, st_tp, sch, g, locals_, cfg, n=2)

    np.testing.assert_allclose(losses_tp[0], losses_dp[0], rtol=1e-5)
    assert np.isfinite(losses_tp).all()


def test_fsdp_matches_dp():
    """ZeRO sharding over the data axis must not change the math.

    Uses SGD: with Adam at step 1 the update is ~sign(g) (v ≈ 0), so the
    ~1e-7 reduction-order noise that reduce-scatter introduces into tiny
    gradients flips update signs and inflates into ~0.2% loss differences —
    an optimizer property, not a sharding bug. SGD keeps the comparison
    linear and tight.
    """
    import dataclasses as dc

    cfg = dc.replace(_tiny_cfg(), optimizer="sgd")
    sch, g, locals_ = _setup(cfg)

    mesh = make_mesh(jax.devices())  # (8, 1, 1)
    st_rep = replicate(mesh, init_dino_train_state(jax.random.PRNGKey(0), cfg))
    st_rep, losses_rep = _run_steps(mesh, st_rep, sch, g, locals_, cfg)

    st_fsdp = shard_dino_state(
        mesh, init_dino_train_state(jax.random.PRNGKey(0), cfg), fsdp=True
    )
    # something big actually got sharded over 'data'
    qkv = st_fsdp.student["backbone"]["blocks"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    st_fsdp, losses_fsdp = _run_steps(mesh, st_fsdp, sch, g, locals_, cfg)

    np.testing.assert_allclose(losses_fsdp, losses_rep, rtol=2e-4, atol=2e-4)
    v_rep = np.asarray(st_rep.student["backbone"]["blocks"]["mlp"]["fc1"]["kernel"])
    v_fsdp = np.asarray(st_fsdp.student["backbone"]["blocks"]["mlp"]["fc1"]["kernel"])
    np.testing.assert_allclose(v_fsdp, v_rep, rtol=2e-3, atol=2e-5)


def test_model_axis_degenerate_on_dp_mesh():
    """model=1 mesh: shard_dino_state is exactly replication (safe default)."""
    cfg = _tiny_cfg()
    state0 = init_dino_train_state(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(jax.devices())
    st = shard_dino_state(mesh, state0)
    shard_specs = jax.tree_util.tree_leaves(
        dino_state_shardings(mesh, state0), is_leaf=lambda x: isinstance(x, NamedSharding)
    )
    assert all(isinstance(s, NamedSharding) for s in shard_specs)
    v = st.student["head"]["last_layer"]["v"]
    # model=1, fsdp off: every leaf must be effectively fully replicated
    # (a P(None, MODEL_AXIS) over a size-1 axis qualifies; sharding over
    # 'data' would not)
    assert v.sharding.is_fully_replicated
    qkv = st.student["backbone"]["blocks"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.is_fully_replicated


def test_tp_checkpoint_resume_continuity(tmp_path):
    """Save mid-training under a dp x tp mesh, restore, re-shard, continue:
    must match the uninterrupted run exactly (the preemption-requeue path
    for tensor-parallel state — device_get gathers shards to full host
    arrays, restore re-places them via shard_dino_state)."""
    from dinomc_tpu.ckpt.orbax_io import CheckpointManager

    cfg = _tiny_cfg()
    sch, g, locals_ = _setup(cfg)
    mesh = make_mesh(jax.devices(), data=2, seq=1, model=4)

    # uninterrupted: 2 steps
    st_a = shard_dino_state(mesh, init_dino_train_state(jax.random.PRNGKey(0), cfg))
    st_a, _ = _run_steps(mesh, st_a, sch, g, locals_, cfg, n=2)

    # interrupted: 1 step, checkpoint, restore into a fresh template, 1 step
    st_b = shard_dino_state(mesh, init_dino_train_state(jax.random.PRNGKey(0), cfg))
    st_b, _ = _run_steps(mesh, st_b, sch, g, locals_, cfg, n=1)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(1, jax.device_get(st_b))
    mgr.wait()
    template = init_dino_train_state(jax.random.PRNGKey(42), cfg)  # different seed
    restored = mgr.restore(jax.device_get(template))
    mgr.close()
    assert restored is not None and int(restored.step) == 1
    st_c = shard_dino_state(mesh, restored)
    st_c, losses_c = _run_steps(mesh, st_c, sch, g, locals_, cfg, n=1)

    v_a = np.asarray(st_a.student["head"]["last_layer"]["v"])
    v_c = np.asarray(st_c.student["head"]["last_layer"]["v"])
    np.testing.assert_allclose(v_c, v_a, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(st_c.center), np.asarray(st_a.center), rtol=1e-6, atol=1e-7
    )
    assert int(st_c.step) == 2
