"""Classification fine-tuning (EuroSAT / BigEarthNet).

Parity targets:
  * ``main_eurosat.py`` — END-TO-END fine-tune (full model + num_classes
    head, SGD over all params with linear-scaled lr + cosine annealing,
    ``main_eurosat.py:101-107``), CE loss, top-1 val accuracy with best-acc
    checkpoint selection;
  * ``main_bigearthnet.py`` — 19-label multi-label fine-tune with
    ``MultiLabelSoftMarginLoss``, micro-mAP eval (``:223-225``), optional
    ``--train_frac`` subsetting (data/loader.random_subset).

One step function serves both: the loss switches on ``multilabel``.
Backbone weights come either fresh or from a DINO checkpoint
(``load_pretrained_weights`` parity lives in ckpt/torch_import.py; JAX-side
pretrained trees are just passed into ``init_cls_train_state``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from dinomc_tpu.models.encoders import EncoderConfig
from dinomc_tpu.objectives.segmentation import multilabel_soft_margin_loss
from dinomc_tpu.train import optim

Params = Any


@dataclasses.dataclass(frozen=True)
class ClsConfig:
    arch: str = "vit_small"
    patch_size: int = 8
    num_classes: int = 10
    multilabel: bool = False
    optimizer: str = "sgd"
    momentum: float = 0.9
    label_smoothing: float = 0.0
    freeze_backbone: bool = False  # True => linear-probe-style training
    # bf16 is the TPU training path; "float32" for bit-level parity tests
    # (same convention as DinoConfig.compute_dtype)
    compute_dtype: str = "bfloat16"

    def encoder(self) -> EncoderConfig:
        return EncoderConfig(
            arch=self.arch,
            patch_size=self.patch_size,
            compute_dtype=jnp.dtype(self.compute_dtype).type,
        )


@struct.dataclass
class ClsTrainState:
    step: jnp.ndarray
    params: Params  # {'backbone', 'fc'}
    bn_state: Params
    opt_state: Dict[str, Any]
    rng: jax.Array


def init_cls_train_state(
    key: jax.Array,
    cfg: ClsConfig,
    pretrained_backbone: Optional[Params] = None,
    pretrained_bn_state: Optional[Params] = None,
) -> ClsTrainState:
    kb, kf, kr = jax.random.split(key, 3)
    backbone, bn_state = cfg.encoder().init(kb)
    if pretrained_backbone is not None:
        backbone = jax.tree_util.tree_map(jnp.asarray, pretrained_backbone)
    if pretrained_bn_state is not None:  # convnet imports carry running stats
        bn_state = jax.tree_util.tree_map(jnp.asarray, pretrained_bn_state)
    d = cfg.encoder().embed_dim
    params = {
        "backbone": backbone,
        "fc": {
            "kernel": 0.01 * jax.random.normal(kf, (d, cfg.num_classes), jnp.float32),
            "bias": jnp.zeros((cfg.num_classes,), jnp.float32),
        },
    }
    opt_init, _ = optim.OPTIMIZERS[cfg.optimizer]
    return ClsTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        bn_state=bn_state,
        opt_state=opt_init(params),
        rng=kr,
    )


def _logits(params, bn_state, x, cfg: ClsConfig, train, rng):
    feats, new_bn = cfg.encoder().apply(params["backbone"], bn_state, x, train, rng)
    if cfg.freeze_backbone:
        # linear-probe mode: cut the grad at the features so backward skips
        # the whole backbone (the optimizer's frozen mask alone would keep
        # the weights fixed but still pay the backbone backward)
        feats = jax.lax.stop_gradient(feats)
    return feats @ params["fc"]["kernel"] + params["fc"]["bias"], new_bn


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def cls_train_step(
    state: ClsTrainState,
    images: jnp.ndarray,  # (B, S, S, 3) normalized
    labels: jnp.ndarray,  # (B,) int or (B, C) multi-hot
    lr: jnp.ndarray,
    weight_decay: jnp.ndarray,
    cfg: ClsConfig,
) -> Tuple[ClsTrainState, Dict[str, jnp.ndarray]]:
    rng, step_rng = jax.random.split(state.rng)

    def loss_fn(params):
        logits, new_bn = _logits(params, state.bn_state, images, cfg, True, step_rng)
        if cfg.multilabel:
            loss = multilabel_soft_margin_loss(logits, labels)
        else:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            if cfg.label_smoothing > 0:
                C = logits.shape[-1]
                t = jax.nn.one_hot(labels, C) * (1 - cfg.label_smoothing) + (
                    cfg.label_smoothing / C
                )
                loss = -(t * logp).sum(-1).mean()
            else:
                loss = -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
        return loss, (new_bn, logits)

    (loss, (new_bn, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    wd_m = optim.wd_mask(state.params)
    frozen_m = (
        optim.path_mask(state.params, lambda p: p.startswith("backbone"))
        if cfg.freeze_backbone
        else None
    )
    _, opt_update = optim.OPTIMIZERS[cfg.optimizer]
    new_params, new_opt = opt_update(
        grads, state.opt_state, state.params, lr, weight_decay, wd_m,
        frozen_mask=frozen_m,
    )
    if cfg.multilabel:
        acc = ((logits > 0) == (labels > 0.5)).mean(dtype=jnp.float32)
    else:
        acc = (logits.argmax(-1) == labels).mean(dtype=jnp.float32)
    return (
        ClsTrainState(
            step=state.step + 1,
            params=new_params,
            bn_state=new_bn,
            opt_state=new_opt,
            rng=rng,
        ),
        {"loss": loss, "acc": acc, "lr": lr},
    )


@partial(jax.jit, static_argnames=("cfg",))
def cls_predict(
    params: Params, bn_state: Params, images: jnp.ndarray, cfg: ClsConfig
) -> jnp.ndarray:
    logits, _ = _logits(params, bn_state, images, cfg, False, None)
    return logits
