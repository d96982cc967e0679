"""Cluster / descriptor-space analysis — the minimal equivalent of the
reference's cluster_analysis.py (VLAD-BuFF/cluster_analysis.py, 1127 LoC
of t-SNE and cluster-visualization plumbing; low VPR-functional value so
this keeps only the quantitative core).

Provides: 2-D t-SNE embedding of descriptors, per-image cluster usage
histograms from hard assignments, and an optional scatter-plot writer.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def tsne_embed(descriptors: np.ndarray, perplexity: float = 30.0,
               seed: int = 0, max_points: int = 5000):
    """[N, D] → ([M, 2] t-SNE embedding, [M] selected indices), where
    M = min(N, max_points) (sklearn backend, subsampled like the
    reference's sampling). The indices let callers subset per-descriptor
    labels/colors to the embedded rows."""
    from sklearn.manifold import TSNE
    x = np.asarray(descriptors, np.float32)
    idx = np.arange(len(x))
    if len(x) > max_points:
        idx = np.sort(np.random.default_rng(seed).choice(
            len(x), max_points, replace=False))
        x = x[idx]
    if len(x) < 2:
        return np.zeros((len(x), 2), np.float32), idx
    # sklearn requires perplexity < n_samples; a fixed lower clamp of 2
    # raised for exactly the degenerate inputs it was meant to protect
    perplexity = min(perplexity, max(1.0, (len(x) - 1) / 3.0))
    pts = TSNE(n_components=2, perplexity=perplexity,
               random_state=seed, init="pca").fit_transform(x)
    return pts, idx


def cluster_usage(descriptors: np.ndarray, centers: np.ndarray,
                  image_indices: Optional[Sequence[int]] = None
                  ) -> np.ndarray:
    """Hard-assignment histograms: [n_images (or 1), n_clusters] counts of
    descriptors per cluster (the reference's per-cluster composition
    analysis)."""
    import jax.numpy as jnp
    from revisit_anything_tpu.ops.vlad import hard_assignment
    labels = np.asarray(hard_assignment(jnp.asarray(descriptors, jnp.float32),
                                        jnp.asarray(centers, jnp.float32)))
    c = centers.shape[0]
    if image_indices is None:
        return np.bincount(labels, minlength=c)[None]
    image_indices = np.asarray(image_indices)
    n_img = int(image_indices.max()) + 1
    out = np.zeros((n_img, c), np.int64)
    np.add.at(out, (image_indices, labels), 1)
    return out


def save_tsne_plot(points_2d: np.ndarray, labels: Optional[np.ndarray],
                   out_path: str) -> Optional[str]:
    """Scatter plot of a t-SNE embedding colored by label; returns the
    path, or None when matplotlib is unavailable (headless-safe)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(points_2d[:, 0], points_2d[:, 1], s=4,
               c=labels if labels is not None else None, cmap="tab20")
    ax.set_title("t-SNE of segment descriptors")
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
