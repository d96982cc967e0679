"""On-TPU kNN parity vs exact numpy search (faiss IndexFlat conventions)."""

import numpy as np

from revisit_anything_tpu.ops.knn import knn_inner_product, knn_l2


def numpy_l2_topk(q, d, k):
    dist = ((q[:, None, :] - d[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(dist, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(dist, idx, axis=1), idx


def assert_ranking_equivalent(q, d, idx, sq, ref_d, atol=1e-3):
    """The dot-product kNN formulation can permute near-tied neighbors
    (as FAISS does); assert the *distances* of the returned ranking match
    the exact ranking's distances, and returned sq values are consistent."""
    true_d_of_idx = ((q[:, None, :] - d[np.asarray(idx)]) ** 2).sum(-1)
    np.testing.assert_allclose(true_d_of_idx, ref_d, atol=atol)
    np.testing.assert_allclose(np.asarray(sq), true_d_of_idx, atol=atol)


def test_knn_l2_exact(rng):
    q = rng.standard_normal((37, 24)).astype(np.float32)
    d = rng.standard_normal((533, 24)).astype(np.float32)
    sq, idx = knn_l2(q, d, 9, db_tile=128)
    ref_d, _ = numpy_l2_topk(q, d, 9)
    assert_ranking_equivalent(q, d, idx, sq, ref_d)


def test_knn_l2_k_larger_than_tile(rng):
    q = rng.standard_normal((5, 8)).astype(np.float32)
    d = rng.standard_normal((300, 8)).astype(np.float32)
    sq, idx = knn_l2(q, d, 200, db_tile=128)
    ref_d, _ = numpy_l2_topk(q, d, 200)
    assert_ranking_equivalent(q, d, idx, sq, ref_d)


def test_knn_l2_small_db(rng):
    q = rng.standard_normal((4, 16)).astype(np.float32)
    d = rng.standard_normal((7, 16)).astype(np.float32)
    sq, idx = knn_l2(q, d, 20)  # k > n_db clamps to 7
    assert idx.shape == (4, 7)
    ref_d, _ = numpy_l2_topk(q, d, 7)
    assert_ranking_equivalent(q, d, idx, sq, ref_d)


def test_knn_inner_product(rng):
    q = rng.standard_normal((11, 32)).astype(np.float32)
    d = rng.standard_normal((257, 32)).astype(np.float32)
    s, idx = knn_inner_product(q, d, 5, db_tile=64)
    ref = q @ d.T
    ref_i = np.argsort(-ref, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), ref_i)
    np.testing.assert_allclose(
        np.asarray(s), np.take_along_axis(ref, ref_i, axis=1), atol=1e-4)


def test_padding_rows_never_returned(rng):
    q = rng.standard_normal((3, 4)).astype(np.float32)
    d = np.zeros((130, 4), dtype=np.float32)  # pads to 256 with tile 128
    _, idx = knn_l2(q, d, 130, db_tile=128)
    assert np.asarray(idx).max() < 130
