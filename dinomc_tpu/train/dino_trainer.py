"""DINO-MC training step — single jitted SPMD program, any encoder family.

Parity target: reference ``train_one_epoch`` (``main_dino_mc.py:356-416``)
and the surrounding setup in ``train_dino`` (``main_dino_mc.py:154-353``):
student/teacher MultiCropWrapper forwards over ViT-S/8, ResNet-50,
WRN-50-2 or Swin-T encoders, DINO loss with centering, per-tensor grad
clip, last-layer freeze, AdamW/SGD/LARS with per-iteration lr/wd schedules,
and the EMA teacher momentum update.

TPU-first design:
  * The whole step (teacher fwd, student fwd over every crop resolution,
    loss, backward, optimizer, EMA) is ONE jitted function. Params are
    replicated; the batch is sharded over the ``data`` mesh axis; XLA emits
    the gradient and center reductions as ICI collectives (the reference's
    DDP allreduce + ``dist.all_reduce`` of the center, SURVEY.md §2.9).
  * Multi-resolution crops: one backbone forward per distinct crop shape
    (resolution-bucketed like ``MultiCropWrapper``, ``utils/utils.py:627-646``)
    but all inside one XLA program; embeddings are concatenated and run
    through the head once.
  * The teacher EMA is a ``tree_map`` over replicated params — no
    communication (the reference loops per-parameter in Python,
    ``main_dino_mc.py:403-406``). BatchNorm running stats (convnets) are
    buffers, not params: like the reference, the teacher's BN state is
    updated by its own train-mode forwards, not EMA'd.
  * bf16 activations; f32 params, optimizer state, loss, and center.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from dinomc_tpu.models.encoders import EncoderConfig
from dinomc_tpu.models.dino_head import (
    DINOHeadConfig,
    dino_head_forward,
    init_dino_head,
)
from dinomc_tpu.objectives.dino import dino_loss
from dinomc_tpu.train import optim

Params = Any


@dataclasses.dataclass(frozen=True)
class DinoConfig:
    """Static (hashable) training configuration.

    Defaults follow reference argparse defaults (``main_dino_mc.py:46-151``).
    """

    arch: str = "vit_small"
    patch_size: int = 8
    out_dim: int = 65536
    norm_last_layer: bool = True
    use_bn_in_head: bool = False
    drop_path_rate: float = 0.1
    student_temp: float = 0.1
    center_momentum: float = 0.9
    clip_grad: float = 3.0
    freeze_last_layer: int = 1
    optimizer: str = "adamw"
    niter_per_ep: int = 1
    global_crop_size: int = 224
    n_global_crops: int = 2
    # Pack pairs of local-crop size-buckets into single block-diagonal
    # forwards (ViT only; exact — see models/vit.py:vit_forward_packed).
    # Measured −8.4% on the local-crop fwd+bwd at bench shapes.
    crop_packing: bool = True
    # Merge ALL crop buckets (globals + locals) into one token stream so
    # qkv/proj/MLP run as single large-M GEMMs per layer; attention stays
    # per bucket (ViT only; exact — models/vit.py:vit_forward_multi).
    # Supersedes crop_packing when on.
    bucket_merge: bool = False
    # ViT selective-remat policy (models/vit.ViTConfig.remat_policy). All
    # policies are numerically identical; the choice trades recompute FLOPs
    # against saved-activation HBM. Measured on v5e (scripts/remat_bench.py):
    # 'attn' peaks at B=14 (109.6 img/s), 'qkv+attn+mlp' at B=10 (110.2).
    remat_policy: str = "attn"
    # bf16 is the TPU training path (reference uses fp16 AMP,
    # main_dino_mc.py:89-92); "float32" + gelu_approx=False is the
    # bit-faithful mode the torch-oracle step test runs in.
    compute_dtype: str = "bfloat16"
    gelu_approx: bool = True

    def encoder(self, student: bool) -> EncoderConfig:
        return EncoderConfig(
            arch=self.arch,
            patch_size=self.patch_size,
            img_size=self.global_crop_size,
            drop_path_rate=self.drop_path_rate if student else 0.0,
            remat_policy=self.remat_policy,
            compute_dtype=jnp.dtype(self.compute_dtype).type,
            gelu_approx=self.gelu_approx,
        )

    def head_config(self) -> DINOHeadConfig:
        return DINOHeadConfig(
            in_dim=self.encoder(True).embed_dim,
            out_dim=self.out_dim,
            use_bn=self.use_bn_in_head,
            norm_last_layer=self.norm_last_layer,
            compute_dtype=jnp.dtype(self.compute_dtype).type,
        )


@struct.dataclass
class DinoTrainState:
    step: jnp.ndarray
    student: Params  # {'backbone', 'head'}
    teacher: Params
    student_state: Params  # BN running stats ({} for ViT/Swin)
    teacher_state: Params
    opt_state: Dict[str, Any]
    center: jnp.ndarray
    rng: jax.Array


@struct.dataclass
class DinoSchedules:
    """Per-iteration device arrays (see core/schedules.py)."""

    lr: jnp.ndarray  # (total_iters,)
    wd: jnp.ndarray  # (total_iters,)
    teacher_momentum: jnp.ndarray  # (total_iters,)
    teacher_temp: jnp.ndarray  # (epochs,) — indexed by epoch


def init_dino_train_state(key: jax.Array, cfg: DinoConfig) -> DinoTrainState:
    kb, kh, krest = jax.random.split(key, 3)
    backbone, bb_state = cfg.encoder(student=True).init(kb)
    head = init_dino_head(kh, cfg.head_config())
    student = {"backbone": backbone, "head": head}
    # Teacher starts as a copy of the student (reference main_dino_mc.py:262-265).
    teacher = jax.tree_util.tree_map(jnp.copy, student)
    opt_init, _ = optim.OPTIMIZERS[cfg.optimizer]
    return DinoTrainState(
        step=jnp.zeros((), jnp.int32),
        student=student,
        teacher=teacher,
        student_state=bb_state,
        teacher_state=jax.tree_util.tree_map(jnp.copy, bb_state),
        opt_state=opt_init(student),
        center=jnp.zeros((cfg.out_dim,), jnp.float32),
        rng=krest,
    )


def _masks(cfg: DinoConfig, student: Params):
    """Weight-decay mask, last-layer mask, frozen-g mask (pytrees of 0/1)."""
    wd_m = optim.wd_mask(student)
    last_layer_m = optim.path_mask(student, lambda p: "head/last_layer" in p)
    # torch stores weight-norm g as (out, 1) — 2-D — so the reference's
    # get_params_groups REGULARIZES it (utils/utils.py:649-660), unlike every
    # other 1-D scale. Our g is stored 1-D; force it into the wd group to
    # match. (Moot when norm_last_layer=True: g is frozen entirely.)
    g_m = optim.path_mask(student, lambda p: p == "head/last_layer/g")
    wd_m = jax.tree_util.tree_map(jnp.maximum, wd_m, g_m)
    if cfg.norm_last_layer:
        frozen_m = optim.path_mask(student, lambda p: p == "head/last_layer/g")
    else:
        frozen_m = None
    return wd_m, last_layer_m, frozen_m


def _plan_packing(work, enc):
    """Choose which local-crop size-buckets to pack pairwise.

    ``work``: list of (size, rows, crop-indices). Trace-time (pure Python,
    static shapes). Only buckets with EQUAL row counts can share a packed
    sequence, and the packed padded length must fit the fused kernel.
    Packing computes the masked cross-attention blocks, so among maximal
    pairings we pick the one minimizing total padded attention work
    Σ pad(na+nb)² — pairing large with small (e.g. 530+101, 401+226,
    325+170 at bench sizes) bounds that waste. Exhaustive search: ≤8
    buckets in any sane multi-crop config.

    Returns (pairs, singles): pairs of work entries to pack (larger
    first), and leftover entries to run separately.
    """
    from dinomc_tpu.ops.pallas.attention import MAX_FUSED_LEN, _pad_len

    if not getattr(enc, "is_vit", False):
        return [], work
    ntok = lambda size: (size // enc.patch_size) ** 2 + 1  # noqa: E731

    by_rows: Dict[int, list] = {}
    for w in work:
        by_rows.setdefault(w[1].shape[0], []).append(w)

    pairs, singles = [], []
    for group in by_rows.values():
        best = None  # ((-n_pairs, padded_cost), pairs, singles)

        def rec(items, ps, sg, cost):
            nonlocal best
            if not items:
                key = (-len(ps), cost)
                if best is None or key < best[0]:
                    best = (key, list(ps), list(sg))
                return
            head, rest = items[0], items[1:]
            rec(rest, ps, sg + [head], cost + _pad_len(ntok(head[0])) ** 2)
            for j, other in enumerate(rest):
                na, nb = ntok(head[0]), ntok(other[0])
                if _pad_len(na + nb) <= MAX_FUSED_LEN:
                    big, small = (head, other) if na >= nb else (other, head)
                    ps.append((big, small))
                    rec(
                        rest[:j] + rest[j + 1:], ps, sg,
                        cost + _pad_len(na + nb) ** 2,
                    )
                    ps.pop()

        rec(group, [], [], 0)
        pairs.extend(best[1])
        singles.extend(best[2])
    return pairs, singles


def _forward_crops(
    params: Params,
    bn_state: Params,
    global_crops: jnp.ndarray,  # (G, B, S, S, 3)
    local_crops: Tuple[jnp.ndarray, ...],  # each (B, s, s, 3)
    enc: EncoderConfig,
    head_cfg: DINOHeadConfig,
    rng: Optional[jax.Array],
    train: bool,
    pack: bool = True,
    merge: bool = False,
) -> Tuple[jnp.ndarray, Params]:
    """Backbone per resolution bucket, one head pass.
    Returns ((n_crops, B, K) logits, new_bn_state)."""
    G, B = global_crops.shape[0], global_crops.shape[1]
    feats = []  # list of (B, D) in crop order
    gx = global_crops.reshape((G * B,) + global_crops.shape[2:])

    # Bucket local crops by resolution so same-size crops share one forward
    # (MultiCropWrapper parity, utils/utils.py:627-646).
    buckets: Dict[int, list] = {}
    for idx, lc in enumerate(local_crops):
        buckets.setdefault(lc.shape[1], []).append((idx, lc))
    work = []  # (size, rows-concat, crop indices)
    for size, items in sorted(buckets.items()):
        xs = jnp.concatenate([lc for _, lc in items], axis=0)
        work.append((size, xs, [i for i, _ in items]))

    if merge and local_crops and getattr(enc, "supports_packing", False):
        # Merged-GEMM path: ALL buckets (globals first) in ONE forward —
        # qkv/proj/MLP run at M = total tokens (vit_forward_multi).
        bucket_feats, bn_state = enc.apply_multi(
            params["backbone"], bn_state,
            [gx] + [xs for _, xs, _ in work], train, rng,
        )
        feats.extend(jnp.split(bucket_feats[0], G, axis=0))
        local_feats: Dict[int, jnp.ndarray] = {}
        for (size, xs, idxs), fb in zip(work, bucket_feats[1:]):
            for i, fi in zip(idxs, jnp.split(fb, len(idxs), axis=0)):
                local_feats[i] = fi
        feats.extend(local_feats[i] for i in range(len(local_crops)))
        all_feats = jnp.concatenate(feats, axis=0)  # (n_crops*B, D)
        logits = dino_head_forward(params["head"], all_feats, head_cfg)
        return logits.reshape(len(feats), B, -1), bn_state

    if rng is not None:
        rng, r0 = jax.random.split(rng)
    else:
        r0 = None
    f, bn_state = enc.apply(params["backbone"], bn_state, gx, train, r0)
    feats.extend(jnp.split(f, G, axis=0))
    local_feats: Dict[int, jnp.ndarray] = {}

    def _next_rng():
        nonlocal rng
        if rng is None:
            return None
        rng, r = jax.random.split(rng)
        return r

    def _store(idxs, fb):
        for i, fi in zip(idxs, jnp.split(fb, len(idxs), axis=0)):
            local_feats[i] = fi

    # Crop packing (ViT): run two size-buckets as ONE block-diagonal
    # forward (models/vit.py:vit_forward_packed) — halves scan traversals
    # and attention launches; measured −8.4% on the 6-local-crop fwd+bwd
    # at bench shapes (v5e, B=24). Exact: segment-masked attention +
    # per-segment DropPath.
    pairs, singles = (
        _plan_packing(work, enc) if pack and enc.supports_packing else ([], work)
    )
    for (sa, xa, ia), (sb, xb, ib) in pairs:
        fa, fb, bn_state = enc.apply_packed(
            params["backbone"], bn_state, xa, xb, train, _next_rng()
        )
        _store(ia, fa)
        _store(ib, fb)
    for size, xs, idxs in singles:
        fb, bn_state = enc.apply(params["backbone"], bn_state, xs, train, _next_rng())
        _store(idxs, fb)
    feats.extend(local_feats[i] for i in range(len(local_crops)))

    all_feats = jnp.concatenate(feats, axis=0)  # (n_crops*B, D)
    logits = dino_head_forward(params["head"], all_feats, head_cfg)
    return logits.reshape(len(feats), B, -1), bn_state


def dino_loss_and_grads(
    state: DinoTrainState,
    global_crops: jnp.ndarray,
    local_crops: Tuple[jnp.ndarray, ...],
    teacher_temp: jnp.ndarray,
    step_rng: Optional[jax.Array],
    cfg: DinoConfig,
):
    """Teacher + student multi-crop forwards, DINO loss, student grads.

    The forward/backward core of the train step, exposed separately so the
    torch-oracle parity test (tests/test_step_oracle.py) can compare raw
    gradients against the reference composition before any optimizer state
    enters the picture. Returns
    ``(loss, grads, new_center, new_student_state, new_teacher_state)``.
    """
    enc_s = cfg.encoder(student=True)
    enc_t = cfg.encoder(student=False)
    head_cfg = cfg.head_config()

    # Teacher forward: global views only (main_dino_mc.py:373). The teacher
    # stays in train mode (reference never calls .eval()): BN uses batch
    # stats and updates its own running stats.
    teacher_logits, new_teacher_state = _forward_crops(
        state.teacher,
        state.teacher_state,
        global_crops,
        (),
        enc_t,
        head_cfg,
        None,
        enc_t.has_bn,
    )

    def loss_fn(student_params):
        student_logits, new_bn = _forward_crops(
            student_params,
            state.student_state,
            global_crops,
            local_crops,
            enc_s,
            head_cfg,
            step_rng,
            True,
            cfg.crop_packing,
            cfg.bucket_merge,
        )
        loss, new_center = dino_loss(
            student_logits,
            teacher_logits,
            state.center,
            teacher_temp,
            cfg.student_temp,
            cfg.center_momentum,
        )
        return loss, (new_center, new_bn)

    (loss, (new_center, new_student_state)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.student)
    return loss, grads, new_center, new_student_state, new_teacher_state


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def dino_train_step(
    state: DinoTrainState,
    global_crops: jnp.ndarray,
    local_crops: Tuple[jnp.ndarray, ...],
    schedules: DinoSchedules,
    cfg: DinoConfig,
) -> Tuple[DinoTrainState, Dict[str, jnp.ndarray]]:
    step = state.step
    epoch = step // cfg.niter_per_ep
    lr = schedules.lr[step]
    wd = schedules.wd[step]
    ema_m = schedules.teacher_momentum[step]
    teacher_temp = schedules.teacher_temp[epoch]

    rng, step_rng = jax.random.split(state.rng)

    loss, grads, new_center, new_student_state, new_teacher_state = (
        dino_loss_and_grads(
            state, global_crops, local_crops, teacher_temp, step_rng, cfg
        )
    )

    return _finish_step(
        state, grads, loss, new_center, new_student_state, new_teacher_state,
        rng, lr, wd, ema_m, epoch, cfg,
    )


@partial(jax.jit, static_argnames=("cfg", "accum"), donate_argnames=("state",))
def dino_train_step_accum(
    state: DinoTrainState,
    global_crops: jnp.ndarray,  # (G, B, S, S, 3); B = accum * b
    local_crops: Tuple[jnp.ndarray, ...],  # each (B, s, s, 3)
    schedules: DinoSchedules,
    cfg: DinoConfig,
    accum: int = 1,
) -> Tuple[DinoTrainState, Dict[str, jnp.ndarray]]:
    """Gradient accumulation: one optimizer step from ``accum`` microbatches.

    Takes the SAME full-batch crop layout as ``dino_train_step`` and splits
    into microbatches inside the jit (eager reshapes would fail on
    multi-host global arrays). Not in the reference (which scales batch
    only via more GPUs); this is the single-chip lever for reference-scale
    effective batches (e.g. the paper's 8/GPU x N). Semantics match one
    large batch of size B: gradients and the teacher-logit batch center are
    averaged over all microbatches, the center EMA and the teacher EMA
    update ONCE, and the pre-step center is used for every microbatch's
    loss. The microbatch loop is a ``lax.scan`` (one compiled body;
    activations from microbatch i are freed before i+1 — peak HBM is one
    microbatch's worth).

    BN backbones: running stats thread through the scan sequentially (the
    same stats drift a large batch would produce in expectation).
    """
    enc_s = cfg.encoder(student=True)
    enc_t = cfg.encoder(student=False)
    head_cfg = cfg.head_config()
    A = accum
    G, B = global_crops.shape[0], global_crops.shape[1]
    b = B // A
    assert b * A == B, f"accum={A} must divide batch {B}"
    # STRIDED split — microbatch a takes rows a::A. With the batch axis
    # sharded over the data mesh axis, a contiguous split would put each
    # microbatch's rows on only 1/A of the devices (forcing an all-to-all
    # or idling chips every scan iteration); the strided split keeps every
    # microbatch evenly sharded. Semantically identical: gradients and the
    # teacher-logit center are batch means, invariant to which microbatch
    # an image lands in. (G, B, ...) -> (A, G, b, ...); locals -> (A, b, ...)
    global_crops = jnp.moveaxis(
        global_crops.reshape((G, b, A) + global_crops.shape[2:]), 2, 0
    )
    local_crops = tuple(
        jnp.moveaxis(x.reshape((b, A) + x.shape[1:]), 1, 0) for x in local_crops
    )

    step = state.step
    epoch = step // cfg.niter_per_ep
    lr = schedules.lr[step]
    wd = schedules.wd[step]
    ema_m = schedules.teacher_momentum[step]
    teacher_temp = schedules.teacher_temp[epoch]

    rng, step_rng = jax.random.split(state.rng)
    micro_rngs = jax.random.split(step_rng, A)

    def micro(carry, xs):
        grads_acc, loss_acc, bc_acc, t_state, s_state = carry
        g, locals_, mrng = xs

        teacher_logits, t_state = _forward_crops(
            state.teacher, t_state, g, (), enc_t, head_cfg, None, enc_t.has_bn
        )

        def loss_fn(student_params):
            student_logits, new_bn = _forward_crops(
                student_params, s_state, g, locals_, enc_s, head_cfg, mrng,
                True, cfg.crop_packing, cfg.bucket_merge,
            )
            loss, _ = dino_loss(
                student_logits,
                teacher_logits,
                state.center,  # pre-step center for every microbatch
                teacher_temp,
                cfg.student_temp,
                cfg.center_momentum,
            )
            return loss, new_bn

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.student
        )
        grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
        bc = jnp.mean(
            teacher_logits.reshape(-1, teacher_logits.shape[-1]), axis=0
        )
        return (grads_acc, loss_acc + loss, bc_acc + bc, t_state, new_bn), None

    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.student)
    carry0 = (
        zero_grads,
        jnp.zeros((), jnp.float32),
        jnp.zeros_like(state.center),
        state.teacher_state,
        state.student_state,
    )
    (grads, loss_sum, bc_sum, new_teacher_state, new_student_state), _ = (
        jax.lax.scan(micro, carry0, (global_crops, local_crops, micro_rngs))
    )
    inv_a = 1.0 / A
    grads = jax.tree_util.tree_map(lambda g: g * inv_a, grads)
    loss = loss_sum * inv_a
    new_center = jax.lax.stop_gradient(
        state.center * cfg.center_momentum
        + (bc_sum * inv_a) * (1.0 - cfg.center_momentum)
    )

    return _finish_step(
        state, grads, loss, new_center, new_student_state, new_teacher_state,
        rng, lr, wd, ema_m, epoch, cfg,
    )


def _finish_step(
    state, grads, loss, new_center, new_student_state, new_teacher_state,
    rng, lr, wd, ema_m, epoch, cfg: DinoConfig,
):
    """Clip -> masked optimizer update -> EMA teacher -> new state."""
    if cfg.clip_grad > 0:
        grads = optim.clip_gradients_per_tensor(grads, cfg.clip_grad)

    wd_m, last_layer_m, frozen_m = _masks(cfg, state.student)
    # Cancel the last-layer update entirely while epoch < freeze_last_layer
    # (reference sets .grad=None, which skips the wd term too,
    # utils/utils.py:157-162): fold the epoch condition into the frozen mask.
    frozen_now = (epoch < cfg.freeze_last_layer).astype(jnp.float32)
    if frozen_m is None:
        frozen_m = jax.tree_util.tree_map(jnp.zeros_like, last_layer_m)
    frozen_m = jax.tree_util.tree_map(
        lambda f, ll: jnp.maximum(f, ll * frozen_now), frozen_m, last_layer_m
    )

    _, opt_update = optim.OPTIMIZERS[cfg.optimizer]
    new_student, new_opt_state = opt_update(
        grads, state.opt_state, state.student, lr, wd, wd_m, frozen_mask=frozen_m
    )

    # EMA teacher update (main_dino_mc.py:403-406) — pure tree_map.
    new_teacher = jax.tree_util.tree_map(
        lambda t, s: ema_m * t + (1.0 - ema_m) * s.astype(jnp.float32),
        state.teacher,
        new_student,
    )

    new_state = DinoTrainState(
        step=state.step + 1,
        student=new_student,
        teacher=new_teacher,
        student_state=new_student_state,
        teacher_state=new_teacher_state,
        opt_state=new_opt_state,
        center=new_center,
        rng=rng,
    )
    metrics = {"loss": loss, "lr": lr, "wd": wd, "teacher_momentum": ema_m}
    return new_state, metrics
