"""Segmentation fine-tuning step (UPerNet on DINO features).

Parity target: reference ``train_model`` (``train_dino_mc_seg.py:27-208``):
AdamW(lr 3e-4, wd 1e-4) + cosine annealing, DiceCrossEntropyLoss on the
decode logits, optional backbone/decoder freezing (``freeze_module``,
``train_dino_mc_seg.py:22-24``; the published runs use
``train_backbone=False`` — decoder-only fine-tune), per-epoch val mIoU and
best-checkpoint selection (handled by the training loop in cli/).

Note: like the reference (SURVEY.md §3.3), the default loss uses only the
decode head — the auxiliary FCNHead exists but is not trained unless
``use_aux_loss=True`` (mmseg's 0.4-weighted aux CE is available for better-
than-reference training).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from dinomc_tpu.models.upernet import UPerNetConfig, init_upernet, upernet_forward
from dinomc_tpu.objectives.segmentation import cross_entropy_loss, dice_ce_loss
from dinomc_tpu.train import optim

Params = Any


@dataclasses.dataclass(frozen=True)
class SegConfig:
    model: UPerNetConfig = UPerNetConfig()
    train_backbone: bool = False
    train_decoder: bool = True
    use_aux_loss: bool = False
    ignore_index: Optional[int] = None

    def frozen_pred(self, path: str) -> bool:
        if not self.train_backbone and path.startswith("backbone"):
            return True
        if not self.train_decoder and not path.startswith("backbone"):
            return True
        return False


@struct.dataclass
class SegTrainState:
    step: jnp.ndarray
    params: Params
    bn_state: Params
    opt_state: Dict[str, Any]
    rng: jax.Array


def init_seg_train_state(key: jax.Array, cfg: SegConfig) -> SegTrainState:
    kp, kr = jax.random.split(key)
    params, bn_state = init_upernet(kp, cfg.model)
    return SegTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        bn_state=bn_state,
        opt_state=optim.adamw_init(params),
        rng=kr,
    )


@partial(jax.jit, static_argnames=("cfg", "mesh"), donate_argnames=("state",))
def seg_train_step(
    state: SegTrainState,
    images: jnp.ndarray,  # (B, H, W, 3) normalized
    masks: jnp.ndarray,  # (B, H, W) int32
    lr: jnp.ndarray,
    weight_decay: jnp.ndarray,
    cfg: SegConfig,
    mesh=None,  # seq-axis > 1: sequence-parallel ViT backbone (ring attention)
) -> Tuple[SegTrainState, Dict[str, jnp.ndarray]]:
    rng, step_rng = jax.random.split(state.rng)

    def loss_fn(params):
        out = upernet_forward(
            params,
            state.bn_state,
            images,
            cfg.model,
            train=True,
            rng=step_rng,
            with_aux=cfg.use_aux_loss,
            mesh=mesh,
            # frozen backbone: cut grad at the pyramid so backward skips the
            # whole ViT (the optimizer mask alone keeps the weights fixed
            # but still pays the backbone backward)
            stop_backbone_grad=not cfg.train_backbone,
        )
        if cfg.use_aux_loss:
            logits, new_bn, aux_logits = out
            loss = dice_ce_loss(logits, masks, cfg.ignore_index)
            loss = loss + cfg.model.aux_loss_weight * cross_entropy_loss(
                aux_logits, masks, cfg.ignore_index
            )
        else:
            logits, new_bn = out
            loss = dice_ce_loss(logits, masks, cfg.ignore_index)
        return loss, (new_bn, logits)

    (loss, (new_bn, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )

    wd_m = optim.wd_mask(state.params)
    frozen_m = optim.path_mask(state.params, cfg.frozen_pred)
    new_params, new_opt = optim.adamw_update(
        grads, state.opt_state, state.params, lr, weight_decay, wd_m, frozen_mask=frozen_m
    )

    # Frozen backbone must also keep its BN state untouched if backbone had
    # any (ViT has none, but keep the invariant for convnet backbones later).
    new_state = SegTrainState(
        step=state.step + 1,
        params=new_params,
        bn_state=new_bn,
        opt_state=new_opt,
        rng=rng,
    )
    acc = (logits.argmax(-1) == masks).mean(dtype=jnp.float32)
    return new_state, {"loss": loss, "pixel_acc": acc, "lr": lr}


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def seg_predict(
    params: Params, bn_state: Params, images: jnp.ndarray, cfg: SegConfig, mesh=None
) -> jnp.ndarray:
    """Eval-mode logits (B, H, W, C) — 'whole' test mode. ``mesh`` with a
    ``seq`` axis > 1 spreads the token axis over chips (ring attention)."""
    logits, _ = upernet_forward(
        params, bn_state, images, cfg.model, train=False, mesh=mesh
    )
    return logits
