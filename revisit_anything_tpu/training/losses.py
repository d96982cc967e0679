"""Metric-learning losses in JAX: MultiSimilarity loss + miner.

Replaces pytorch_metric_learning (VLAD-BuFF/utils/losses.py:5-53) with
mask-based, statically-shaped implementations. Production config:
MultiSimilarityLoss(alpha=1, beta=50, base=0, dot-product distance) with
MultiSimilarityMiner(epsilon=0.1, cosine distance).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from revisit_anything_tpu.ops.vlad import l2_normalize

_NEG_INF = -1e30


def _pair_masks(labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(pos_mask, neg_mask) [B, B] — same-label pairs excluding self."""
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    return same & ~eye, ~same


def multi_similarity_miner_mask(embeddings: jnp.ndarray,
                                labels: jnp.ndarray,
                                epsilon: float = 0.1
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MultiSimilarityMiner: per anchor keep positives with
    cos < max_neg + eps and negatives with cos > min_pos - eps."""
    emb = l2_normalize(embeddings, axis=1)
    cos = jnp.dot(emb, emb.T, preferred_element_type=jnp.float32)
    pos_mask, neg_mask = _pair_masks(labels)

    max_neg = jnp.max(jnp.where(neg_mask, cos, _NEG_INF), axis=1)
    min_pos = jnp.min(jnp.where(pos_mask, cos, -_NEG_INF), axis=1)

    keep_pos = pos_mask & (cos < (max_neg + epsilon)[:, None])
    keep_neg = neg_mask & (cos > (min_pos - epsilon)[:, None])
    return keep_pos, keep_neg


@partial(jax.jit, static_argnames=("alpha", "beta", "base", "use_miner",
                                   "miner_epsilon"))
def multi_similarity_loss(embeddings: jnp.ndarray,
                          labels: jnp.ndarray,
                          alpha: float = 1.0,
                          beta: float = 50.0,
                          base: float = 0.0,
                          use_miner: bool = True,
                          miner_epsilon: float = 0.1) -> jnp.ndarray:
    """MS loss over dot-product similarities, averaged over anchors with at
    least one mined pair (pytorch_metric_learning semantics)."""
    sims = jnp.dot(embeddings, embeddings.T,
                   preferred_element_type=jnp.float32)
    if use_miner:
        pos_mask, neg_mask = multi_similarity_miner_mask(
            embeddings, labels, miner_epsilon)
    else:
        pos_mask, neg_mask = _pair_masks(labels)

    pos_exp = jnp.where(pos_mask, jnp.exp(-alpha * (sims - base)), 0.0)
    neg_exp = jnp.where(neg_mask, jnp.exp(beta * (sims - base)), 0.0)
    pos_loss = jnp.log1p(jnp.sum(pos_exp, axis=1)) / alpha
    neg_loss = jnp.log1p(jnp.sum(neg_exp, axis=1)) / beta

    per_anchor = pos_loss + neg_loss
    active = jnp.any(pos_mask, axis=1) | jnp.any(neg_mask, axis=1)
    denom = jnp.maximum(jnp.sum(active), 1)
    return jnp.sum(jnp.where(active, per_anchor, 0.0)) / denom
