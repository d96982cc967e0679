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
            power_iters: int = 7, oversample: int = 16,
            seed: int = 0) -> PCAParams:
    """Fit PCA with a randomized range finder (top-k right singular vectors).

    Matches sklearn's model (components = top right singular vectors of the
    centered data, explained_variance = S^2/(N-1)) to the accuracy of the
    randomized approximation; deterministic given ``seed``. Signs are fixed
    so each component's max-|.| entry is positive (mirrors sklearn svd_flip
    determinism without depending on U).

    ``power_iters`` defaults to 7 — sklearn's own randomized solver uses
    n_iter=7 whenever k < 0.1·min(shape) (the production regime: 1024 of
    49152 dims). The reference fits with near-exact arpack
    (place_rec_pca.py:339-342); whitening divides by sqrt(ev) of exactly
    the TRAILING components where randomized range-finder error
    concentrates, so under-iterating (the previous default of 2)
    measurably rotated/amplified the last ~100 whitened dimensions.
    Fitting is offline; the extra passes are cheap.
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


def pca_fit_full(x: jnp.ndarray) -> PCAParams:
    """Full-spectrum PCA (sklearn ``svd_solver='full'`` semantics): all
    min(N, D) components via exact SVD of the centered data, svd_flip
    sign determinism. Used by :func:`reduce_pca`'s split-spectrum mode,
    which needs the LOWEST-eigenvalue components too."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    mean = jnp.mean(x, axis=0)
    _, s, vt = jnp.linalg.svd(x - mean, full_matrices=False)
    idx = jnp.argmax(jnp.abs(vt), axis=1)
    signs = jnp.sign(vt[jnp.arange(vt.shape[0]), idx])
    components = vt * signs[:, None]
    return PCAParams(mean, components, (s ** 2) / (n - 1), False)


def reduce_pca(train_descs: np.ndarray, test_descs: np.ndarray,
               lower_dim: int, low_factor: float = 0.0,
               fallback: int = 256,
               whitening: bool = False) -> tuple:
    """Reduce train/test descriptors with PCA fit on the train set —
    the AnyLoc helper (utilities.py:522-589), TPU-native.

    ``low_factor`` > 0 takes that fraction of the ``lower_dim`` basis
    vectors from the BOTTOM of the spectrum (least eigenvalues) and the
    rest from the top; when the train set has fewer samples than
    features, both sets are first projected to ``fallback`` dims with a
    PCA fit on their concatenation (reference behavior).
    """
    assert 0.0 <= low_factor <= 1.0
    train = jnp.asarray(train_descs, jnp.float32)
    test = jnp.asarray(test_descs, jnp.float32)
    if low_factor == 0.0:
        params = pca_fit_full(train)
        params = PCAParams(params.mean, params.components[:lower_dim],
                           params.explained_variance[:lower_dim],
                           whitening)
        return (np.asarray(pca_apply(train, params)),
                np.asarray(pca_apply(test, params)))

    n_samples, n_feat = train.shape
    if n_samples < n_feat:
        both = jnp.concatenate([train, test])
        params = pca_fit_full(both)
        params = PCAParams(params.mean, params.components[:fallback],
                           params.explained_variance[:fallback], False)
        down = pca_apply(both, params)
        train, test = down[:n_samples], down[n_samples:]

    n_down = int(low_factor * lower_dim)
    n_up = lower_dim - n_down
    params = pca_fit_full(train)
    if n_down == 0:       # arr[-0:] would be the whole spectrum
        comps = params.components[:lower_dim]
    else:
        comps = jnp.concatenate([params.components[:n_up],
                                 params.components[-n_down:]])
    tf = PCAParams(params.mean, comps, jnp.ones((comps.shape[0],)), False)
    return (np.asarray(pca_apply(train, tf)),
            np.asarray(pca_apply(test, tf)))
