"""OSCD change-detection training step.

Parity target: reference ``SiamSegment`` LightningModule
(``main_oscd.py:28-104``): frozen siamese encoder (optimizer over
decoder params only, ``:100-104``), BCE-with-logits or dice_bce loss
(``:36``), Adam + ExponentialLR(gamma=0.95) per epoch, binary
precision/recall/F1 tracked on a 0.5-sigmoid threshold.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from dinomc_tpu.models.siamese import SiameseConfig, init_siamese, siamese_forward
from dinomc_tpu.objectives.segmentation import dice_bce_loss
from dinomc_tpu.train import optim

Params = Any


@dataclasses.dataclass(frozen=True)
class OSCDConfig:
    model: SiameseConfig = SiameseConfig()
    loss: str = "bce"  # 'bce' | 'dice_bce'

    def frozen_pred(self, path: str) -> bool:
        return self.model.freeze_encoder and path.startswith("encoder")


@struct.dataclass
class OSCDTrainState:
    step: jnp.ndarray
    params: Params
    bn_state: Params
    opt_state: Dict[str, Any]
    rng: jax.Array


def exponential_lr(base_lr: float, epoch: int, gamma: float = 0.95) -> float:
    """torch ExponentialLR parity (``main_oscd.py``)."""
    return base_lr * (gamma**epoch)


def init_oscd_train_state(
    key: jax.Array,
    cfg: OSCDConfig,
    pretrained_encoder: Params = None,
    pretrained_encoder_bn: Params = None,
) -> OSCDTrainState:
    kp, kr = jax.random.split(key)
    params, bn_state = init_siamese(kp, cfg.model)
    if pretrained_encoder is not None:
        params = dict(params)
        params["encoder"] = jax.tree_util.tree_map(jnp.asarray, pretrained_encoder)
    if pretrained_encoder_bn is not None:
        bn_state = dict(bn_state)
        bn_state["encoder"] = jax.tree_util.tree_map(
            jnp.asarray, pretrained_encoder_bn
        )
    return OSCDTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        bn_state=bn_state,
        opt_state=optim.adamw_init(params),
        rng=kr,
    )


def _bce(logits, target):
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def oscd_train_step(
    state: OSCDTrainState,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray,  # (B, H, W) in {0,1}
    lr: jnp.ndarray,
    cfg: OSCDConfig,
) -> Tuple[OSCDTrainState, Dict[str, jnp.ndarray]]:
    def loss_fn(params):
        logits, new_bn = siamese_forward(params, state.bn_state, x1, x2, cfg.model, True)
        if cfg.loss == "dice_bce":
            loss = dice_bce_loss(logits, mask)
        else:
            loss = _bce(logits, mask)
        return loss, (new_bn, logits)

    (loss, (new_bn, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    wd_m = optim.wd_mask(state.params)
    frozen_m = optim.path_mask(state.params, cfg.frozen_pred)
    # Adam, wd=0 (torch Adam default in the reference)
    new_params, new_opt = optim.adamw_update(
        grads, state.opt_state, state.params, lr, jnp.float32(0.0), wd_m,
        frozen_mask=frozen_m,
    )
    pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
    tp = (pred * mask).sum()
    precision = tp / jnp.maximum(pred.sum(), 1.0)
    recall = tp / jnp.maximum(mask.sum(), 1.0)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    # binary Jaccard on the same 0.5 threshold (reference main_oscd.py:41)
    iou = tp / jnp.maximum(pred.sum() + mask.sum() - tp, 1.0)
    return (
        OSCDTrainState(
            step=state.step + 1,
            params=new_params,
            bn_state=new_bn,
            opt_state=new_opt,
            rng=state.rng,
        ),
        {"loss": loss, "precision": precision, "recall": recall, "f1": f1,
         "iou": iou},
    )


@partial(jax.jit, static_argnames=("cfg",))
def oscd_predict(
    params: Params, bn_state: Params, x1: jnp.ndarray, x2: jnp.ndarray, cfg: OSCDConfig
) -> jnp.ndarray:
    logits, _ = siamese_forward(params, bn_state, x1, x2, cfg.model, False)
    return logits
