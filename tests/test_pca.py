"""PCA apply/fit parity vs sklearn."""

import pickle

import numpy as np
from sklearn.decomposition import PCA

from revisit_anything_tpu.ops.pca import (
    load_pca_npz, load_sklearn_pca_pickle, pca_apply, pca_fit, save_pca_npz)


def test_sklearn_pickle_roundtrip(rng, tmp_path):
    x = rng.standard_normal((500, 64)).astype(np.float64)
    pca = PCA(16, whiten=True, svd_solver="arpack").fit(x)
    pkl = tmp_path / "pca.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(pca, f)

    params = load_sklearn_pca_pickle(str(pkl))
    ours = np.asarray(pca_apply(x.astype(np.float32), params))
    ref = pca.transform(x)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_npz_roundtrip(rng, tmp_path):
    x = rng.standard_normal((200, 32)).astype(np.float32)
    params = pca_fit(x, 8)
    path = tmp_path / "pca.npz"
    save_pca_npz(str(path), params)
    loaded = load_pca_npz(str(path))
    np.testing.assert_allclose(np.asarray(pca_apply(x, params)),
                               np.asarray(pca_apply(x, loaded)), atol=1e-6)


def test_fit_matches_sklearn_subspace(rng):
    # Low-rank + noise data: randomized fit should recover sklearn's
    # leading components (up to sign, which both fix deterministically).
    basis = rng.standard_normal((8, 48))
    coef = rng.standard_normal((1000, 8)) * np.linspace(10, 3, 8)
    x = (coef @ basis + 0.01 * rng.standard_normal((1000, 48))).astype(np.float32)

    params = pca_fit(x, 8, whiten=True)
    ref = PCA(8, whiten=True).fit(np.asarray(x, dtype=np.float64))

    np.testing.assert_allclose(np.asarray(params.explained_variance),
                               ref.explained_variance_, rtol=1e-2)
    # components agree up to sign
    dots = np.abs(np.sum(np.asarray(params.components) * ref.components_,
                         axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-2)


def test_whitened_output_is_decorrelated(rng):
    x = rng.standard_normal((2000, 32)).astype(np.float32) @ \
        rng.standard_normal((32, 32)).astype(np.float32)
    params = pca_fit(x, 8, whiten=True)
    y = np.asarray(pca_apply(x, params))
    cov = np.cov(y.T)
    np.testing.assert_allclose(cov, np.eye(8), atol=0.15)


def test_reduce_pca_matches_sklearn(rng):
    from revisit_anything_tpu.ops.pca import reduce_pca
    train = rng.standard_normal((300, 48)).astype(np.float32)
    test = rng.standard_normal((40, 48)).astype(np.float32)
    ours_tr, ours_te = reduce_pca(train, test, 16)
    ref = PCA(16, svd_solver="full")
    ref_tr = ref.fit_transform(train)
    ref_te = ref.transform(test)
    np.testing.assert_allclose(ours_tr, ref_tr, atol=2e-3)
    np.testing.assert_allclose(ours_te, ref_te, atol=2e-3)


def test_reduce_pca_split_spectrum(rng):
    """low_factor mode: bottom-of-spectrum components are included
    (utilities.py:565-586 semantics)."""
    from revisit_anything_tpu.ops.pca import reduce_pca
    train = rng.standard_normal((300, 48)).astype(np.float32)
    test = rng.standard_normal((40, 48)).astype(np.float32)
    ours_tr, ours_te = reduce_pca(train, test, 10, low_factor=0.3)
    assert ours_tr.shape == (300, 10) and ours_te.shape == (40, 10)
    ref = PCA(48, svd_solver="full").fit(train)
    tf = np.concatenate([ref.components_[:7], ref.components_[-3:]])
    np.testing.assert_allclose(ours_tr, (train - ref.mean_) @ tf.T,
                               atol=2e-3)


def test_reduce_pca_fallback_few_samples(rng):
    from revisit_anything_tpu.ops.pca import reduce_pca
    train = rng.standard_normal((30, 64)).astype(np.float32)
    test = rng.standard_normal((10, 64)).astype(np.float32)
    out_tr, out_te = reduce_pca(train, test, 8, low_factor=0.25,
                                fallback=20)
    assert out_tr.shape == (30, 8) and out_te.shape == (10, 8)
