"""Vocabulary (kmeans centers) and PCA fitting stages — on TPU.

Mirrors vlad_c_centers_pt_gen.py:38-162 (sampling: >2000 images → 30% of
images and every-2nd pixel; L2-norm; cosine kmeans with 32 clusters) and
place_rec_pca.py:245-428 (≤50k segment sample ratio min(1, 50000/N); PCA
1024 whiten). fast_pytorch_kmeans and sklearn-arpack are replaced by the
jitted kmeans++/randomized-SVD kernels in revisit_anything_tpu.ops.
"""

from __future__ import annotations

from typing import Sequence

import h5py
import numpy as np

import jax
import jax.numpy as jnp

from revisit_anything_tpu.config import NUM_CLUSTERS, PCA_DIM
from revisit_anything_tpu.io.h5io import read_dino_features
from revisit_anything_tpu.ops.kmeans import kmeans_fit
from revisit_anything_tpu.ops.pca import PCAParams, pca_fit
from revisit_anything_tpu.ops.vlad import l2_normalize
from revisit_anything_tpu.pipeline.aggregate import SegmentBank


def sample_descriptors_from_h5(dino_h5_path: str,
                               image_keys: Sequence[str],
                               large_set_threshold: int = 2000,
                               image_fraction: float = 0.3,
                               pixel_stride: int = 2,
                               seed: int = 42) -> np.ndarray:
    """Collect dense descriptors for vocabulary training with the
    reference's subsampling policy (vlad_c_centers_pt_gen.py:86-114)."""
    rng = np.random.default_rng(seed)
    keys = list(image_keys)
    stride = 1
    if len(keys) > large_set_threshold:
        keys = [keys[i] for i in
                sorted(rng.choice(len(keys),
                                  int(len(keys) * image_fraction),
                                  replace=False))]
        stride = pixel_stride
    chunks = []
    with h5py.File(dino_h5_path, "r") as f:
        for key in keys:
            feats = read_dino_features(f, key)[0]          # [D, dh, dw]
            # every stride-th pixel in BOTH height and width (the
            # reference's original_data[:, :, ::2, ::2] — a 4x grid
            # subsample, not a flat 2x one)
            feats = feats[:, ::stride, ::stride]
            d = feats.shape[0]
            chunks.append(feats.reshape(d, -1).T)          # [P, D]
    return np.concatenate(chunks).astype(np.float32)


def fit_vocabulary(descriptors: np.ndarray,
                   num_clusters: int = NUM_CLUSTERS,
                   seed: int = 0,
                   num_iters: int = 100) -> np.ndarray:
    """Cosine kmeans over L2-normalized descriptors → [C, D] centers."""
    # stays on device: a host round-trip of a multi-GB descriptor matrix
    # costs seconds over the tunnel for nothing
    x = l2_normalize(jnp.asarray(descriptors), axis=1)
    centers, _ = kmeans_fit(x, num_clusters,
                            jax.random.PRNGKey(seed), num_iters=num_iters,
                            mode="cosine", assume_normalized=True)
    return np.asarray(centers)


def fit_vocabulary_from_h5(dino_h5_path: str,
                           image_keys: Sequence[str],
                           num_clusters: int = NUM_CLUSTERS,
                           seed: int = 42) -> np.ndarray:
    descs = sample_descriptors_from_h5(dino_h5_path, image_keys, seed=seed)
    return fit_vocabulary(descs, num_clusters, seed=seed)


def fit_pca_from_vlads(bank: SegmentBank,
                       num_components: int = PCA_DIM,
                       max_segments: int = 50000,
                       seed: int = 42,
                       whiten: bool = True) -> PCAParams:
    """Fit the whitened PCA on a ≤50k segment sample
    (place_rec_pca.py:332-342)."""
    n = len(bank.descriptors)
    x = bank.descriptors
    if n > max_segments:
        rng = np.random.default_rng(seed)
        # per-segment uniform sampling at ratio 50000/N, like the
        # reference's per-image ratio sampling in expectation
        sel = rng.random(n) < (max_segments / n)
        x = x[sel]
    k = min(num_components, x.shape[0] - 1, x.shape[1])
    return pca_fit(jnp.asarray(x), k, whiten=whiten, seed=seed)
