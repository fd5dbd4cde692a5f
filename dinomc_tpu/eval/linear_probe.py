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
    return {"top1": top1, "loss": float(loss)}
