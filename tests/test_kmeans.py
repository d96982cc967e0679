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


def test_vocabulary_pixel_subsampling_is_grid_stride(tmp_path, rng):
    """Large-set pixel subsampling strides BOTH height and width
    (original_data[:, :, ::2, ::2], vlad_c_centers_pt_gen.py:105-110 —
    a 4x grid subsample), not the flattened raster."""
    import h5py

    from revisit_anything_tpu.io.h5io import write_dino_features
    from revisit_anything_tpu.pipeline.vocabulary import (
        sample_descriptors_from_h5)

    d, dh, dw = 6, 5, 7
    path = str(tmp_path / "dino.h5")
    feats = {}
    with h5py.File(path, "w") as f:
        for i in range(5):
            a = rng.standard_normal((1, d, dh, dw)).astype(np.float32)
            feats[f"im{i}"] = a
            write_dino_features(f, f"im{i}", a)
    keys = [f"im{i}" for i in range(5)]

    # small set: every pixel of every image
    out = sample_descriptors_from_h5(path, keys, large_set_threshold=2000)
    assert out.shape == (5 * dh * dw, d)

    # "large" set (threshold lowered): 30% of images, grid-strided pixels
    out = sample_descriptors_from_h5(path, keys, large_set_threshold=3,
                                     image_fraction=0.6, pixel_stride=2,
                                     seed=42)
    n_img = int(5 * 0.6)
    per_img = ((dh + 1) // 2) * ((dw + 1) // 2)      # ::2 on both axes
    assert out.shape == (n_img * per_img, d)
    # rows of each sampled image are exactly feats[:, ::2, ::2] flattened
    expected_rows = {tuple(np.round(r, 5)) for a in feats.values()
                     for r in a[0][:, ::2, ::2].reshape(d, -1).T}
    assert all(tuple(np.round(r, 5)) in expected_rows for r in out)
