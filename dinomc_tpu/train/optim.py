"""Optimizers and gradient transforms for the DINO-MC stack.

Parity targets:
  * two param groups — regularized vs (bias | 1-D) with wd=0 — reference
    ``get_params_groups`` (``utils/utils.py:649-660``), expressed here as a
    weight-decay mask over the param pytree;
  * **per-tensor** gradient clipping (coef = clip / ||g_tensor||, applied
    tensor-wise, NOT global-norm) — reference ``clip_gradients``
    (``utils/utils.py:145-154``); this is intentional DINO behavior
    (SURVEY.md §7 "known bugs" notes parity requires matching it);
  * last-layer gradient cancellation during the first ``freeze_last_layer``
    epochs — reference ``cancel_gradients_last_layer``
    (``utils/utils.py:157-162``) — done with a traced 0/1 multiplier so the
    epoch threshold doesn't trigger recompiles;
  * AdamW (torch semantics: decoupled wd scaled by lr), SGD+momentum, and
    BarlowTwins-style LARS (``utils/utils.py:570-608``) with per-step lr/wd
    read from precomputed schedule arrays (core/schedules.py).

All transforms are pure pytree functions; optimizer state is a dict pytree.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Any
tree_map = jax.tree_util.tree_map


# ---------------------------------------------------------------------------
# param-group masks
# ---------------------------------------------------------------------------


def wd_mask(params: Params) -> Params:
    """1.0 for regularized leaves, 0.0 for bias / 1-D leaves.

    Matches reference ``get_params_groups``: anything named ``bias`` or with
    ``ndim <= 1`` is not weight-decayed (LN scales, BN scales, weight-norm
    ``g`` are all 1-D).
    """

    def is_path_bias(path) -> bool:
        last = path[-1]
        key = getattr(last, "key", getattr(last, "name", ""))
        return str(key) == "bias"

    return jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.asarray(
            0.0 if (is_path_bias(path) or x.ndim <= 1) else 1.0, jnp.float32
        ),
        params,
    )


def path_mask(params: Params, pred: Callable[[str], bool]) -> Params:
    """1.0 where the '/'-joined param path satisfies pred, else 0.0."""

    def fn(path, x):
        keys = []
        for p in path:
            keys.append(str(getattr(p, "key", getattr(p, "name", p))))
        return jnp.asarray(1.0 if pred("/".join(keys)) else 0.0, jnp.float32)

    return jax.tree_util.tree_map_with_path(fn, params)


# ---------------------------------------------------------------------------
# gradient transforms
# ---------------------------------------------------------------------------


def clip_gradients_per_tensor(grads: Params, clip: float) -> Params:
    """Reference ``clip_gradients`` (``utils/utils.py:145-154``): each tensor
    independently rescaled by min(1, clip / (||g|| + 1e-6))."""

    def clip_one(g):
        norm = jnp.linalg.norm(g.astype(jnp.float32))
        coef = jnp.minimum(1.0, clip / (norm + 1e-6))
        return (g * coef).astype(g.dtype)

    return tree_map(clip_one, grads)


def scale_by_mask(grads: Params, mask: Params, scale: jnp.ndarray) -> Params:
    """grad <- grad * (1 - mask) + grad * mask * scale  (traced scale)."""
    return tree_map(lambda g, m: g * (1.0 - m) + g * m * scale, grads, mask)


# ---------------------------------------------------------------------------
# AdamW
# ---------------------------------------------------------------------------


def adamw_init(params: Params) -> Dict[str, Any]:
    zeros = lambda p: tree_map(lambda x: jnp.zeros_like(x, jnp.float32), p)
    return {"mu": zeros(params), "nu": zeros(params), "count": jnp.zeros((), jnp.int32)}


def adamw_update(
    grads: Params,
    state: Dict[str, Any],
    params: Params,
    lr: jnp.ndarray,
    weight_decay: jnp.ndarray,
    wd_mask_tree: Params,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    frozen_mask: Optional[Params] = None,
) -> Tuple[Params, Dict[str, Any]]:
    """Torch-AdamW semantics: p -= lr * (mhat/(sqrt(vhat)+eps) + wd*p*mask).

    ``frozen_mask`` (1.0 = frozen) zeroes the update entirely — used to pin
    the weight-norm ``g`` when ``norm_last_layer=True`` (reference
    ``vision_transformer.py:279-282``).
    """
    count = state["count"] + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - b1**c
    bc2 = 1.0 - b2**c

    mu = tree_map(lambda m, g: b1 * m + (1 - b1) * g.astype(jnp.float32), state["mu"], grads)
    nu = tree_map(
        lambda v, g: b2 * v + (1 - b2) * jnp.square(g.astype(jnp.float32)),
        state["nu"],
        grads,
    )

    def step(p, m, v, wm):
        mhat = m / bc1
        vhat = v / bc2
        upd = mhat / (jnp.sqrt(vhat) + eps) + weight_decay * wm * p.astype(jnp.float32)
        return (p.astype(jnp.float32) - lr * upd).astype(p.dtype)

    new_params = tree_map(step, params, mu, nu, wd_mask_tree)
    if frozen_mask is not None:
        new_params = tree_map(
            lambda new, old, f: new * (1.0 - f) + old * f, new_params, params, frozen_mask
        )
    return new_params, {"mu": mu, "nu": nu, "count": count}


# ---------------------------------------------------------------------------
# SGD + momentum
# ---------------------------------------------------------------------------


def sgd_init(params: Params) -> Dict[str, Any]:
    return {"mu": tree_map(lambda x: jnp.zeros_like(x, jnp.float32), params)}


def sgd_update(
    grads: Params,
    state: Dict[str, Any],
    params: Params,
    lr: jnp.ndarray,
    weight_decay: jnp.ndarray,
    wd_mask_tree: Params,
    momentum: float = 0.9,
    frozen_mask: Optional[Params] = None,
) -> Tuple[Params, Dict[str, Any]]:
    def mom(m, g, p, wm):
        g = g.astype(jnp.float32) + weight_decay * wm * p.astype(jnp.float32)
        return momentum * m + g

    mu = tree_map(mom, state["mu"], grads, params, wd_mask_tree)
    new_params = tree_map(
        lambda p, m: (p.astype(jnp.float32) - lr * m).astype(p.dtype), params, mu
    )
    if frozen_mask is not None:
        new_params = tree_map(
            lambda new, old, f: new * (1.0 - f) + old * f, new_params, params, frozen_mask
        )
    return new_params, {"mu": mu}


# ---------------------------------------------------------------------------
# LARS (BarlowTwins flavor, reference utils/utils.py:570-608)
# ---------------------------------------------------------------------------


def lars_init(params: Params) -> Dict[str, Any]:
    return {"mu": tree_map(lambda x: jnp.zeros_like(x, jnp.float32), params)}


def lars_update(
    grads: Params,
    state: Dict[str, Any],
    params: Params,
    lr: jnp.ndarray,
    weight_decay: jnp.ndarray,
    wd_mask_tree: Params,
    momentum: float = 0.9,
    eta: float = 0.001,
    frozen_mask: Optional[Params] = None,
) -> Tuple[Params, Dict[str, Any]]:
    """LARS: wd + trust-ratio scaling applied only to regularized (non-1-D)
    params — the reference exempts bias/1-D via ``exclude_bias_and_norm``."""

    def adapt(g, p, wm):
        g32 = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        g32 = g32 + weight_decay * wm * p32
        p_norm = jnp.linalg.norm(p32)
        g_norm = jnp.linalg.norm(g32)
        q = jnp.where(
            (p_norm > 0.0) & (g_norm > 0.0), eta * p_norm / (g_norm + 1e-12), 1.0
        )
        # trust ratio applies only to regularized leaves (wm==1)
        return g32 * (wm * q + (1.0 - wm))

    adapted = tree_map(adapt, grads, params, wd_mask_tree)
    mu = tree_map(lambda m, g: momentum * m + g, state["mu"], adapted)
    new_params = tree_map(
        lambda p, m: (p.astype(jnp.float32) - lr * m).astype(p.dtype), params, mu
    )
    if frozen_mask is not None:
        new_params = tree_map(
            lambda new, old, f: new * (1.0 - f) + old * f, new_params, params, frozen_mask
        )
    return new_params, {"mu": mu}


OPTIMIZERS = {
    "adamw": (adamw_init, adamw_update),
    "sgd": (sgd_init, sgd_update),
    "lars": (lars_init, lars_update),
}
