"""KMeans on TPU (cosine or euclidean assignment) for VLAD vocabularies.

Replaces fast_pytorch_kmeans (utilities.py:766): assignment is one matmul +
argmax, the update is a segment-sum — both MXU/VPU friendly inside a
``lax.fori_loop``. Deterministic given the PRNG key (kmeans++-style seeding
by random choice of distinct points).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from revisit_anything_tpu.ops.vlad import l2_normalize


def _assign(x: jnp.ndarray, centers: jnp.ndarray, mode: str,
            x_normalized: bool = False) -> jnp.ndarray:
    if mode == "cosine":
        # argmax of cosine(x, c) does not depend on ||x|| — pass
        # x_normalized (or not) freely; centers must still be normalized
        xn = x if x_normalized else l2_normalize(x)
        sims = jnp.dot(xn, l2_normalize(centers).T,
                       preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        return jnp.argmax(sims, axis=1)
    # euclidean: argmin ||x-c||^2 = argmax (x·c - ||c||^2/2)
    scores = (jnp.dot(x, centers.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
              - 0.5 * jnp.sum(centers * centers, axis=1))
    return jnp.argmax(scores, axis=1)


def _sq_dist_to_center(x: jnp.ndarray, center: jnp.ndarray,
                       mode: str) -> jnp.ndarray:
    if mode == "cosine":
        sim = jnp.dot(l2_normalize(x), l2_normalize(center),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        return 1.0 - sim
    diff = x - center
    return jnp.sum(diff * diff, axis=1)


def _kmeanspp_init(x: jnp.ndarray, num_clusters: int, key: jax.Array,
                   mode: str) -> jnp.ndarray:
    """kmeans++ D²-sampling initialization (deterministic given key)."""
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centers = jnp.zeros((num_clusters, x.shape[1]), x.dtype)
    centers = centers.at[0].set(x[first])
    min_d = _sq_dist_to_center(x, x[first], mode)

    def body(i, carry):
        centers, min_d, key = carry
        key, sub = jax.random.split(key)
        probs = jnp.maximum(min_d, 0.0)
        probs = probs / jnp.maximum(jnp.sum(probs), 1e-30)
        idx = jax.random.categorical(sub, jnp.log(probs + 1e-30))
        c = x[idx]
        centers = centers.at[i].set(c)
        min_d = jnp.minimum(min_d, _sq_dist_to_center(x, c, mode))
        return centers, min_d, key

    centers, _, _ = jax.lax.fori_loop(1, num_clusters, body,
                                      (centers, min_d, key))
    return centers


@partial(jax.jit, static_argnames=("num_clusters", "num_iters", "mode",
                                   "assume_normalized"))
def kmeans_fit(x: jnp.ndarray,
               num_clusters: int,
               key: jax.Array,
               num_iters: int = 100,
               mode: str = "cosine",
               assume_normalized: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit kmeans; returns (centers [C, D], labels [N]).

    kmeans++ initialization; centers are updated as the arithmetic mean
    of assigned points. An EMPTY cluster's center becomes the zero
    vector, exactly like fast_pytorch_kmeans' full-batch fit_predict
    (c_grad starts at zeros, only matched clusters are filled, lr=1
    replaces the centroids outright) — a dead cluster stays dead there,
    and the zero center contributes a zero block to every reference
    VLAD, so keep-previous-center would diverge.

    ``assume_normalized``: skip the cosine-mode input normalization when
    the caller already L2-normalized ``x`` (saves a full HBM pass plus a
    second multi-GB copy on vocabulary-scale inputs).
    """
    n, d = x.shape
    x = x.astype(jnp.float32)
    centers0 = _kmeanspp_init(x, num_clusters, key, mode)
    # x is loop-invariant: normalize it ONCE for the cosine assignments
    # instead of re-normalizing the full matrix every iteration
    x_assign = (x if assume_normalized or mode != "cosine"
                else l2_normalize(x))

    def step(_, centers):
        labels = _assign(x_assign, centers, mode, x_normalized=True)
        onehot = jax.nn.one_hot(labels, num_clusters, dtype=jnp.float32)
        sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        counts = jnp.sum(onehot, axis=0)
        new_centers = sums / jnp.maximum(counts[:, None], 1.0)
        return jnp.where(counts[:, None] > 0, new_centers, 0.0)

    centers = jax.lax.fori_loop(0, num_iters, step, centers0)
    labels = _assign(x_assign, centers, mode, x_normalized=True)
    return centers, labels
