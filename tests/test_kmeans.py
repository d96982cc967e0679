"""TPU kmeans sanity: recovers well-separated clusters; deterministic."""

import jax
import numpy as np

from revisit_anything_tpu.ops.kmeans import kmeans_fit


def make_blobs(rng, n_per=100, c=4, d=16, spread=0.05):
    centers = rng.standard_normal((c, d)) * 3
    x = np.concatenate([
        centers[i] + spread * rng.standard_normal((n_per, d))
        for i in range(c)])
    true = np.repeat(np.arange(c), n_per)
    return x.astype(np.float32), true, centers


def test_recovers_blobs_euclidean(rng):
    x, true, _ = make_blobs(rng)
    centers, labels = kmeans_fit(x, 4, jax.random.PRNGKey(0),
                                 num_iters=50, mode="euclidean")
    labels = np.asarray(labels)
    # Every true cluster maps to exactly one predicted label.
    mapped = [np.unique(labels[true == i]) for i in range(4)]
    assert all(len(u) == 1 for u in mapped)
    assert len({u[0] for u in mapped}) == 4


def test_cosine_mode_angular_blobs(rng):
    # Clusters separated in angle only.
    x, true, _ = make_blobs(rng, spread=0.02)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    centers, labels = kmeans_fit(x, 4, jax.random.PRNGKey(1),
                                 num_iters=50, mode="cosine")
    labels = np.asarray(labels)
    mapped = [np.unique(labels[true == i]) for i in range(4)]
    assert all(len(u) == 1 for u in mapped)


def test_deterministic(rng):
    x, _, _ = make_blobs(rng)
    c1, l1 = kmeans_fit(x, 4, jax.random.PRNGKey(7), num_iters=20)
    c2, l2 = kmeans_fit(x, 4, jax.random.PRNGKey(7), num_iters=20)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
