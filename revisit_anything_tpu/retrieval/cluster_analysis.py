"""Cluster / descriptor-space analysis — the quantitative core of the
reference's cluster_analysis.py (VLAD-BuFF/cluster_analysis.py, 1127 LoC;
the interactive mpld3 tooltips and per-cluster image-grid plumbing are
deliberately out of scope).

Provides: 2-D t-SNE embedding of descriptors, per-image cluster usage
histograms from hard assignments, per-cluster triplet margins + the
cross-method cluster-rank-difference analysis (the HoPD burstiness
diagnostic), pairwise cosine-similarity maps, and headless-safe plot
writers (t-SNE scatter, HoD distance histograms).
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


def triplet_margin(query: np.ndarray, positive: np.ndarray,
                   negative: np.ndarray) -> np.ndarray:
    """Per-cluster triplet margin ‖q−n‖ − ‖q−p‖ over [C, D_c] per-cluster
    VLAD blocks (compute_triplet_margin,
    VLAD-BuFF/cluster_analysis.py:295-298). Positive margin = the cluster
    separates the negative further than the positive."""
    query = np.asarray(query, np.float64)
    return (np.linalg.norm(query - np.asarray(negative, np.float64), axis=1)
            - np.linalg.norm(query - np.asarray(positive, np.float64),
                             axis=1))


def rank_clusters(margins: np.ndarray) -> np.ndarray:
    """Cluster ids ordered by ascending margin (rank_clusters, :301-302):
    rank 0 = the cluster that discriminates WORST."""
    return np.argsort(np.asarray(margins))


def cluster_rank_difference(ranks_a: np.ndarray, ranks_b: np.ndarray):
    """Per-cluster rank shift between two methods' margin rankings
    (compute_cluster_rank_difference, :305-308).

    Returns (shifts, cluster): ``shifts[i]`` = rank of ``ranks_b[i]``'s
    cluster under method B minus its rank under method A (iterated in
    method-B order, as the reference does), and ``cluster`` = the id with
    the maximum shift — the cluster method A demotes hardest relative to
    B (the VLAD-BuFF-vs-NetVLAD burstiness diagnostic)."""
    ra, rb = list(np.asarray(ranks_a)), list(np.asarray(ranks_b))
    shifts = [rb.index(c) - ra.index(c) for c in rb]
    return np.asarray(shifts), int(rb[int(np.argmax(shifts))])


def pairwise_cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N, M] cosine-similarity map between row sets (the quantitative
    core of the reference's ``cs`` heatmaps, :657-705). Zero rows map to
    zero similarity instead of NaN."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    na = np.linalg.norm(a, axis=1, keepdims=True)
    nb = np.linalg.norm(b, axis=1, keepdims=True)
    na[na == 0] = 1.0
    nb[nb == 0] = 1.0
    return (a / na) @ (b / nb).T


def save_distance_histograms(dist_pos: np.ndarray, dist_neg: np.ndarray,
                             out_path: str, title: str = "") -> Optional[str]:
    """HoD-style histogram of query–positive vs query–negative distances
    (HoD, :311-368; one panel per call — the reference's two-method
    side-by-side is two calls). Returns the path, or None when matplotlib
    is unavailable (headless-safe)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    fig, ax = plt.subplots(figsize=(7.5, 7))
    ax.hist(np.asarray(dist_pos), bins=30, alpha=0.5, color="g",
            label="Query-Positive Distances")
    ax.hist(np.asarray(dist_neg), bins=30, alpha=0.5, color="r",
            label="Query-Negative Distances")
    ax.legend()
    ax.set_title(f"Histogram of Distances {title}".rstrip())
    ax.set_xlabel("Distance")
    ax.set_ylabel("Frequency")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
