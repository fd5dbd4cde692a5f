"""Weighted k-NN evaluation on frozen features (DINO protocol).

The reference reports EuroSAT k-NN numbers (README tables; the protocol is
upstream DINO's ``eval_knn``): cosine-similarity top-k neighbors over the
training features, class votes weighted by exp(sim / T) with T=0.07,
default k=20. Implemented as one jitted similarity matmul — MXU-friendly.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def _l2n(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnames=("k", "num_classes"))
def knn_predict(
    train_feats: jnp.ndarray,  # (N, D)
    train_labels: jnp.ndarray,  # (N,)
    test_feats: jnp.ndarray,  # (M, D)
    k: int = 20,
    num_classes: int = 10,
    temperature: float = 0.07,
) -> jnp.ndarray:
    """Predicted labels (M,) via temperature-weighted cosine k-NN voting."""
    sims = _l2n(test_feats) @ _l2n(train_feats).T  # (M, N)
    topv, topi = jax.lax.top_k(sims, k)  # (M, k)
    weights = jnp.exp(topv / temperature)
    neighbor_labels = train_labels[topi]  # (M, k)
    one_hot = jax.nn.one_hot(neighbor_labels, num_classes)  # (M, k, C)
    votes = (one_hot * weights[..., None]).sum(axis=1)
    return votes.argmax(-1)


def knn_accuracy(
    train_feats,
    train_labels,
    test_feats,
    test_labels,
    ks: Sequence[int] = (10, 20),
    num_classes: int = 10,
    temperature: float = 0.07,
) -> Dict[int, float]:
    """Top-1 accuracy (percent) per k."""
    out = {}
    for k in ks:
        pred = knn_predict(
            train_feats, train_labels, test_feats,
            k=k, num_classes=num_classes, temperature=temperature,
        )
        out[k] = float((pred == test_labels).mean() * 100.0)
    return out


def extract_features(apply_fn, batches) -> tuple:
    """Run ``apply_fn(images) -> (B, D)`` over an iterable of
    (images, labels) batches; returns stacked (features, labels)."""
    import numpy as np

    feats, labels = [], []
    for images, y in batches:
        feats.append(np.asarray(apply_fn(images)))
        labels.append(np.asarray(y))
    return np.concatenate(feats), np.concatenate(labels)
