"""PCA (whitened) — apply as one matmul on TPU, fit via randomized SVD.

The reference fits sklearn ``PCA(1024, whiten=True, svd_solver='arpack')``
(place_rec_pca.py:339-342) and applies it on CPU per 100-image batch
(func_vpr.py:1419-1443). Here the transform is a device matmul, and fitting
runs on-TPU with a randomized range finder (Halko et al.) — all MXU matmuls,
no host round-trip. Existing sklearn pickles import losslessly.
"""

from __future__ import annotations

import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PCAParams(NamedTuple):
    mean: jnp.ndarray                # [D]
    components: jnp.ndarray          # [K, D]
    explained_variance: jnp.ndarray  # [K]
    whiten: bool


from functools import partial


@partial(jax.jit, static_argnames=("whiten",))
def _pca_apply(x, mean, components, explained_variance, whiten):
    y = jnp.dot(x - mean, components.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    if whiten:
        y = y / jnp.sqrt(explained_variance)
    return y


def pca_apply(x: jnp.ndarray, params: PCAParams) -> jnp.ndarray:
    """sklearn-compatible transform: ((x - mean) @ components^T) / sqrt(ev)."""
    return _pca_apply(x, params.mean, params.components,
                      params.explained_variance, bool(params.whiten))


def load_sklearn_pca_pickle(path: str) -> PCAParams:
    """Import a fitted sklearn PCA pickle into device-ready parameters."""
    with open(path, "rb") as f:
        pca = pickle.load(f)
    return PCAParams(
        mean=jnp.asarray(np.asarray(pca.mean_, dtype=np.float32)),
        components=jnp.asarray(np.asarray(pca.components_, dtype=np.float32)),
        explained_variance=jnp.asarray(
            np.asarray(pca.explained_variance_, dtype=np.float32)),
        whiten=bool(getattr(pca, "whiten", False)),
    )


def save_pca_npz(path: str, params: PCAParams) -> None:
    np.savez(path, mean=np.asarray(params.mean),
             components=np.asarray(params.components),
             explained_variance=np.asarray(params.explained_variance),
             whiten=np.asarray(params.whiten))


def load_pca_npz(path: str) -> PCAParams:
    z = np.load(path)
    return PCAParams(jnp.asarray(z["mean"]), jnp.asarray(z["components"]),
                     jnp.asarray(z["explained_variance"]),
                     bool(z["whiten"]))


def pca_fit(x: jnp.ndarray, num_components: int, whiten: bool = True,
            power_iters: int = 2, oversample: int = 16,
            seed: int = 0) -> PCAParams:
    """Fit PCA with a randomized range finder (top-k right singular vectors).

    Matches sklearn's model (components = top right singular vectors of the
    centered data, explained_variance = S^2/(N-1)) to the accuracy of the
    randomized approximation; deterministic given ``seed``. Signs are fixed
    so each component's max-|.| entry is positive (mirrors sklearn svd_flip
    determinism without depending on U).
    """
    n, d = x.shape
    k = num_components
    l = min(d, k + oversample)
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=0)
    xc = x - mean

    omega = jax.random.normal(jax.random.PRNGKey(seed), (d, l), jnp.float32)
    y = jnp.dot(xc, omega, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)        # [N, l]
    q, _ = jnp.linalg.qr(y)
    for _ in range(power_iters):
        z = jnp.dot(xc.T, q, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)      # [D, l]
        q, _ = jnp.linalg.qr(z)
        y = jnp.dot(xc, q, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)        # [N, l]
        q, _ = jnp.linalg.qr(y)
    b = jnp.dot(q.T, xc, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)          # [l, D]
    _, s, vt = jnp.linalg.svd(b, full_matrices=False)
    components = vt[:k]
    explained_variance = (s[:k] ** 2) / (n - 1)

    # Deterministic sign: largest-|.| coordinate of each component positive.
    idx = jnp.argmax(jnp.abs(components), axis=1)
    signs = jnp.sign(components[jnp.arange(k), idx])
    components = components * signs[:, None]

    return PCAParams(mean, components, explained_variance, whiten)
