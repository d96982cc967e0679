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
    """MS loss over dot-product similarities, averaged over ALL anchors
    (pytorch_metric_learning MultiSimilarityLoss uses MeanReducer: zero-
    loss anchors stay in the denominator).

    Embeddings are L2-normalized first: pytorch_metric_learning's
    DotProductSimilarity defaults normalize_embeddings=True, so the
    reference loss always sees unit vectors (un-normalized inputs would
    also overflow exp(beta·sims) at beta=50)."""
    embeddings = l2_normalize(embeddings, axis=1)
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
    return jnp.mean(per_anchor)


def _pairwise_l2(embeddings: jnp.ndarray) -> jnp.ndarray:
    d2 = (jnp.sum(embeddings ** 2, axis=1)[:, None]
          + jnp.sum(embeddings ** 2, axis=1)[None, :]
          - 2 * jnp.dot(embeddings, embeddings.T,
                        preferred_element_type=jnp.float32))
    return jnp.sqrt(jnp.maximum(d2, 1e-12))


@partial(jax.jit, static_argnames=("pos_margin", "neg_margin"))
def contrastive_loss(embeddings: jnp.ndarray, labels: jnp.ndarray,
                     pos_margin: float = 0.0,
                     neg_margin: float = 1.0) -> jnp.ndarray:
    """Contrastive loss over L2 distances (losses.py ContrastiveLoss
    config: pos_margin 0, neg_margin 1): positives pay max(d - pos_m, 0),
    negatives max(neg_m - d, 0). PML reduces the positive and negative
    pair sets SEPARATELY (AvgNonZeroReducer each) and sums the means.
    L2-normalized first (PML LpDistance normalize_embeddings=True)."""
    dist = _pairwise_l2(l2_normalize(embeddings, axis=1))
    pos_mask, neg_mask = _pair_masks(labels)
    pos_term = jnp.where(pos_mask,
                         jnp.maximum(dist - pos_margin, 0.0), 0.0)
    neg_term = jnp.where(neg_mask,
                         jnp.maximum(neg_margin - dist, 0.0), 0.0)
    pos_mean = jnp.sum(pos_term) / jnp.maximum(jnp.sum(pos_term > 0), 1)
    neg_mean = jnp.sum(neg_term) / jnp.maximum(jnp.sum(neg_term > 0), 1)
    return pos_mean + neg_mean


@partial(jax.jit, static_argnames=("margin",))
def triplet_margin_loss(embeddings: jnp.ndarray, labels: jnp.ndarray,
                        margin: float = 0.1) -> jnp.ndarray:
    """Batch-all triplet margin loss over L2 distances
    (losses.py TripletMarginLoss: margin 0.1, all triplets), averaged over
    violating triplets. L2-normalized first (PML LpDistance
    normalize_embeddings=True)."""
    dist = _pairwise_l2(l2_normalize(embeddings, axis=1))
    pos_mask, neg_mask = _pair_masks(labels)
    # loss[a, p, n] = max(d_ap - d_an + margin, 0) over valid triplets
    viol = dist[:, :, None] - dist[:, None, :] + margin
    valid = pos_mask[:, :, None] & neg_mask[:, None, :]
    viol = jnp.where(valid, jnp.maximum(viol, 0.0), 0.0)
    nonzero = jnp.sum(viol > 0)
    return jnp.sum(viol) / jnp.maximum(nonzero, 1)


@partial(jax.jit, static_argnames=("temperature",))
def ntxent_loss(embeddings: jnp.ndarray, labels: jnp.ndarray,
                temperature: float = 0.07) -> jnp.ndarray:
    """NT-Xent / InfoNCE over cosine similarities (losses.py NTXentLoss,
    temperature 0.07): per positive pair, -log softmax against that
    anchor's negatives."""
    emb = l2_normalize(embeddings, axis=1)
    sims = jnp.dot(emb, emb.T,
                   preferred_element_type=jnp.float32) / temperature
    pos_mask, neg_mask = _pair_masks(labels)
    neg_exp = jnp.sum(jnp.where(neg_mask, jnp.exp(sims), 0.0), axis=1)
    # loss per positive pair (a, p): -log exp(s_ap)/(exp(s_ap)+Σ_neg(a))
    denom = jnp.exp(sims) + neg_exp[:, None]
    per_pair = jnp.where(pos_mask, -(sims - jnp.log(denom)), 0.0)
    n_pos = jnp.maximum(jnp.sum(pos_mask), 1)
    return jnp.sum(per_pair) / n_pos


def get_loss(name: str):
    """Loss factory mirroring VLAD-BuFF utils/losses.py get_loss names."""
    table = {
        "MultiSimilarityLoss": multi_similarity_loss,
        "ContrastiveLoss": contrastive_loss,
        "TripletMarginLoss": triplet_margin_loss,
        "NTXentLoss": ntxent_loss,
    }
    try:
        return table[name]
    except KeyError:
        raise NotImplementedError(
            f"loss {name!r} not implemented; available: {sorted(table)}")
