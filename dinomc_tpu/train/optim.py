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
    # ``count`` is PER-LEAF (a pytree of int32 scalars), matching torch's
    # per-parameter ``state['step']``: a param whose grad is cancelled
    # (reference ``cancel_gradients_last_layer``, ``utils/utils.py:157-162``,
    # sets ``.grad = None`` and torch skips it entirely) must not advance
    # its bias-correction step count while frozen.
    return {
        "mu": zeros(params),
        "nu": zeros(params),
        "count": tree_map(lambda x: jnp.zeros((), jnp.int32), params),
    }


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

    ``frozen_mask`` (1.0 = frozen) reproduces torch's ``grad is None`` skip
    exactly: the param, its moments, AND its step count are all left
    untouched — used for the weight-norm ``g`` when ``norm_last_layer=True``
    (reference ``vision_transformer.py:279-282``) and for the last layer
    during the freeze epochs. (A frozen-then-unfrozen param therefore starts
    with zero moments and full bias correction, like the reference.)
    """
    if frozen_mask is None:
        live = tree_map(lambda x: jnp.ones((), jnp.float32), params)
    else:
        live = tree_map(lambda f: 1.0 - f, frozen_mask)

    count = tree_map(
        lambda c, a: c + a.astype(jnp.int32), state["count"], live
    )
    mu = tree_map(
        lambda m, g, a: m + a * ((1 - b1) * (g.astype(jnp.float32) - m)),
        state["mu"], grads, live,
    )
    nu = tree_map(
        lambda v, g, a: v
        + a * ((1 - b2) * (jnp.square(g.astype(jnp.float32)) - v)),
        state["nu"], grads, live,
    )

    def step(p, m, v, wm, c, a):
        cf = jnp.maximum(c, 1).astype(jnp.float32)  # avoid 0/0 while frozen
        mhat = m / (1.0 - b1**cf)
        vhat = v / (1.0 - b2**cf)
        upd = mhat / (jnp.sqrt(vhat) + eps) + weight_decay * wm * p.astype(jnp.float32)
        return (p.astype(jnp.float32) - a * lr * upd).astype(p.dtype)

    new_params = tree_map(step, params, mu, nu, wd_mask_tree, count, live)
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
    if frozen_mask is None:
        live = tree_map(lambda x: jnp.ones((), jnp.float32), params)
    else:
        live = tree_map(lambda f: 1.0 - f, frozen_mask)

    def mom(m, g, p, wm, a):
        g = g.astype(jnp.float32) + weight_decay * wm * p.astype(jnp.float32)
        # frozen (a=0): buffer untouched (torch skips grad-None params)
        return m + a * (momentum * m + g - m)

    mu = tree_map(mom, state["mu"], grads, params, wd_mask_tree, live)
    new_params = tree_map(
        lambda p, m, a: (p.astype(jnp.float32) - a * lr * m).astype(p.dtype),
        params, mu, live,
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

    if frozen_mask is None:
        live = tree_map(lambda x: jnp.ones((), jnp.float32), params)
    else:
        live = tree_map(lambda f: 1.0 - f, frozen_mask)

    adapted = tree_map(adapt, grads, params, wd_mask_tree)
    mu = tree_map(
        lambda m, g, a: m + a * (momentum * m + g - m), state["mu"], adapted, live
    )
    new_params = tree_map(
        lambda p, m, a: (p.astype(jnp.float32) - a * lr * m).astype(p.dtype),
        params, mu, live,
    )
    return new_params, {"mu": mu}


OPTIMIZERS = {
    "adamw": (adamw_init, adamw_update),
    "sgd": (sgd_init, sgd_update),
    "lars": (lars_init, lars_update),
}
