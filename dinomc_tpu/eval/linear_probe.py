"""Linear probe on frozen features (DINO eval protocol).

The reference reports EuroSAT linear-probe numbers (README tables; upstream
DINO's ``eval_linear``): a single linear classifier trained with SGD +
cosine schedule on features from the frozen backbone. Here features are
extracted once and the probe trains as a tiny jitted full-batch/minibatch
loop — seconds on TPU instead of a GPU-hours loop.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dinomc_tpu.core.schedules import cosine_scheduler


@partial(jax.jit, donate_argnums=(0,), static_argnums=())
def _probe_step(carry, feats, labels, lr, wd):
    params, mu = carry
    w, b = params

    def loss_fn(w, b):
        logits = feats @ w + b
        logp = jax.nn.log_softmax(logits)
        return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(w, b)
    gw = grads[0] + wd * w
    gb = grads[1]
    mu_w = 0.9 * mu[0] + gw
    mu_b = 0.9 * mu[1] + gb
    new_params = (w - lr * mu_w, b - lr * mu_b)
    return (new_params, (mu_w, mu_b)), loss


def train_linear_probe(
    train_feats: np.ndarray,  # (N, D)
    train_labels: np.ndarray,  # (N,)
    test_feats: np.ndarray,
    test_labels: np.ndarray,
    num_classes: int,
    epochs: int = 100,
    batch_size: int = 1024,
    base_lr: float = 0.01,
    weight_decay: float = 0.0,
    seed: int = 0,
    return_params: bool = False,
) -> Dict[str, float]:
    """Returns {'top1': %, 'loss': final}. SGD momentum 0.9 + cosine lr."""
    N, D = train_feats.shape
    niter = max(N // batch_size, 1)
    lrs = cosine_scheduler(base_lr, 1e-6, epochs, niter)
    key = jax.random.PRNGKey(seed)
    w = 0.01 * jax.random.normal(key, (D, num_classes), jnp.float32)
    b = jnp.zeros((num_classes,), jnp.float32)
    carry = ((w, b), (jnp.zeros_like(w), jnp.zeros_like(b)))

    tf = jnp.asarray(train_feats, jnp.float32)
    tl = jnp.asarray(train_labels, jnp.int32)
    rng = np.random.RandomState(seed)
    it = 0
    loss = jnp.zeros(())
    for ep in range(epochs):
        order = rng.permutation(N)
        for s in range(0, niter * batch_size, batch_size):
            idx = jnp.asarray(order[s : s + batch_size])
            carry, loss = _probe_step(
                carry, tf[idx], tl[idx], jnp.float32(lrs[min(it, len(lrs) - 1)]),
                jnp.float32(weight_decay),
            )
            it += 1
    (w, b), _ = carry
    logits = jnp.asarray(test_feats, jnp.float32) @ w + b
    top1 = float((logits.argmax(-1) == jnp.asarray(test_labels)).mean() * 100.0)
    out = {"top1": top1, "loss": float(loss)}
    if return_params:
        out["params"] = (np.asarray(w), np.asarray(b))
    return out


def dense_linear_probe(
    train_tokens: np.ndarray,  # (Nt, D) per-position frozen features
    train_labels: np.ndarray,  # (Nt,) int class per position
    test_tokens: np.ndarray,
    test_labels: np.ndarray,
    num_classes: int,
    epochs: int = 30,
    batch_size: int = 4096,
    base_lr: float = 0.05,
    seed: int = 0,
) -> Dict[str, float]:
    """Linear SEGMENTATION probe: a single shared (D, C) classifier
    applied independently to every token.

    The frozen-feature dense eval: every patch token is a sample, the label
    is the ground-truth mask class at that token's center. Backbone quality
    is the ONLY variable — a linear map cannot re-learn texture features
    the way a trained multi-layer decoder can, so pretrained-vs-random
    margins here measure representation quality, not decoder capacity
    (see scripts/full_chain.py for why the gate lives at this altitude).
    Returns {'top1', 'miou', 'loss'} on the test tokens.

    Features are standardized per dimension (train statistics): raw tap
    activations differ in scale by orders of magnitude across layers, and
    a single-lr SGD probe on the unstandardized concat underfits — the
    probe would measure conditioning, not representation.
    """
    mu = train_tokens.mean(axis=0, keepdims=True)
    sd = train_tokens.std(axis=0, keepdims=True) + 1e-6
    train_tokens = (train_tokens - mu) / sd
    test_tokens = (test_tokens - mu) / sd
    res = train_linear_probe(
        train_tokens, train_labels, test_tokens, test_labels, num_classes,
        epochs=epochs, batch_size=batch_size, base_lr=base_lr, seed=seed,
        return_params=True,
    )
    w, b = res.pop("params")
    pred = np.asarray(
        jnp.argmax(jnp.asarray(test_tokens, jnp.float32) @ w + b, axis=-1)
    )
    gt = np.asarray(test_labels)
    ious = []
    for c in range(num_classes):
        inter = float(((pred == c) & (gt == c)).sum())
        union = float(((pred == c) | (gt == c)).sum())
        if union > 0:
            ious.append(inter / union)
    res["miou"] = float(np.mean(ious)) if ious else 0.0
    return res
