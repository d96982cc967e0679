"""Sharded kNN equals single-device kNN on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from revisit_anything_tpu.ops.knn import knn_l2
from revisit_anything_tpu.parallel import make_mesh, sharded_knn_l2


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh((8,), ("data",))


def test_sharded_equals_single_device(rng, mesh):
    q = rng.standard_normal((23, 32)).astype(np.float32)
    db = rng.standard_normal((1000, 32)).astype(np.float32)
    sq_s, idx_s = sharded_knn_l2(q, db, 17, mesh)
    sq_1, idx_1 = knn_l2(q, db, 17)
    # identical candidate sets + distances (ties may permute)
    true = lambda i: ((q[:, None, :] - db[np.asarray(i)]) ** 2).sum(-1)
    np.testing.assert_allclose(np.sort(sq_s, 1), np.sort(np.asarray(sq_1), 1),
                               atol=1e-3)
    np.testing.assert_allclose(true(idx_s), sq_s, atol=1e-3)


def test_sharded_uneven_db(rng, mesh):
    # db size not divisible by 8; padding rows must never be returned
    q = rng.standard_normal((5, 16)).astype(np.float32)
    db = rng.standard_normal((203, 16)).astype(np.float32)
    sq, idx = sharded_knn_l2(q, db, 50, mesh)
    assert idx.max() < 203
    sq1, _ = knn_l2(q, db, 50)
    np.testing.assert_allclose(np.sort(sq, 1), np.sort(np.asarray(sq1), 1),
                               atol=1e-3)


def test_sharded_small_db(rng, mesh):
    q = rng.standard_normal((3, 8)).astype(np.float32)
    db = rng.standard_normal((20, 8)).astype(np.float32)
    sq, idx = sharded_knn_l2(q, db, 10, mesh)
    assert idx.shape == (3, 10)
    assert idx.max() < 20


def test_data_parallel_apply_matches_single(rng, mesh):
    import jax
    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.parallel.data_parallel import (
        data_parallel_apply)
    cfg = dn.DinoV2Config(embed_dim=32, depth=2, num_heads=2, ffn="mlp",
                          pretrain_grid=(4, 4))
    params = dn.init_params(cfg, jax.random.PRNGKey(0))
    imgs = rng.standard_normal((11, 56, 56, 3)).astype(np.float32)  # pads to 16

    def fn(p, x):
        return dn.extract_dense(p, cfg, x, layer=1, facet="value")

    sharded = data_parallel_apply(fn, params, imgs, mesh)
    single = np.asarray(fn(params, imgs))
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, atol=1e-5)
