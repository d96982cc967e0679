"""Fused online-query path equals the staged pipeline."""

import numpy as np

import jax.numpy as jnp

from revisit_anything_tpu.ops.pca import pca_fit
from revisit_anything_tpu.ops.vlad import l2_normalize, segment_vlad
from revisit_anything_tpu.ops.knn import knn_l2
from revisit_anything_tpu.pipeline.query import pca_tuple, query_topk_images
from revisit_anything_tpu.retrieval.matching import get_matches_host


def test_fused_query_matches_staged(rng):
    P, D, C, M = 120, 48, 8, 10
    n_ref_imgs, segs_per = 12, 20
    nd = n_ref_imgs * segs_per

    desc = rng.standard_normal((P, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    centers = rng.standard_normal((C, D)).astype(np.float32)
    masks = rng.random((M, P)) > 0.7
    masks[-2:] = False                          # padding rows
    adj = rng.random((M, M)) > 0.5
    np.fill_diagonal(adj, True)
    adj[-2:] = adj[:, -2:] = False

    raw_db = rng.standard_normal((nd, C * D)).astype(np.float32)
    pca = pca_fit(jnp.asarray(raw_db), 16, whiten=True)
    from revisit_anything_tpu.ops.pca import pca_apply
    db = np.asarray(pca_apply(jnp.asarray(raw_db), pca))
    db = db / np.linalg.norm(db, axis=1, keepdims=True)
    db_ids = np.repeat(np.arange(n_ref_imgs), segs_per)

    # staged path
    vlads = np.asarray(segment_vlad(desc, centers, masks, jnp.asarray(adj),
                                    num_clusters=C))
    proj = np.asarray(pca_apply(jnp.asarray(vlads), pca))
    proj = proj / (np.linalg.norm(proj, axis=1, keepdims=True) + 1e-30)
    sq, idx = knn_l2(jnp.asarray(proj), jnp.asarray(db), 30, db_tile=128)
    sims = 2.0 - np.asarray(sq)[:, :20]
    # staged voting over VALID segments only (first 8 rows)
    preds = get_matches_host(np.asarray(idx)[:8, :20], sims[:8],
                             [np.arange(8)], db_ids, n=5)[0]

    # fused path
    mean, comps, var, whiten = pca_tuple(pca)
    top = np.asarray(query_topk_images(
        jnp.asarray(desc), jnp.asarray(masks), jnp.asarray(adj),
        jnp.asarray(centers), mean, comps, var,
        jnp.asarray(db), jnp.asarray(db_ids),
        num_clusters=C, num_ref_images=n_ref_imgs,
        knn_topk=30, borda_topk=20, top_images=5, db_tile=128))

    # The fused path normalizes sims over its own (valid-masked) matrix;
    # the winner set matches the staged path (tie order can differ).
    assert top[0] == preds[0]
    assert set(top.tolist()) == set(int(p) for p in preds)


def _tiny_query_setup(rng, n_ref_imgs=4, segs_per=6):
    P, D, C, M = 60, 32, 4, 8
    desc = rng.standard_normal((P, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    centers = rng.standard_normal((C, D)).astype(np.float32)
    masks = rng.random((M, P)) > 0.6
    adj = np.eye(M, dtype=bool)
    nd = n_ref_imgs * segs_per
    db = rng.standard_normal((nd, 16)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    db_ids = np.repeat(np.arange(n_ref_imgs), segs_per)
    mean = np.zeros((C * D,), np.float32)
    comps = (rng.standard_normal((16, C * D)) * 0.1).astype(np.float32)
    var = np.ones((16,), np.float32)
    return desc, centers, masks, adj, db, db_ids, mean, comps, var, C


def test_fused_query_padding_rows_do_not_shift_normalization(rng):
    """Invalid (all-false-mask) padding rows project to a real phantom
    vector; its sims must not enter the min-max statistics — the top-k
    must be IDENTICAL with and without extra padding rows."""
    (desc, centers, masks, adj, db, db_ids,
     mean, comps, var, C) = _tiny_query_setup(rng)
    kw = dict(num_clusters=C, num_ref_images=4, knn_topk=10,
              borda_topk=10, top_images=3, db_tile=128)
    top_plain = np.asarray(query_topk_images(
        jnp.asarray(desc), jnp.asarray(masks), jnp.asarray(adj),
        jnp.asarray(centers), mean, comps, var,
        jnp.asarray(db), jnp.asarray(db_ids), **kw))
    # same query padded with 4 extra all-false rows
    masks_pad = np.concatenate([masks, np.zeros((4, masks.shape[1]), bool)])
    adj_pad = np.zeros((12, 12), bool)
    adj_pad[:8, :8] = adj
    top_padded = np.asarray(query_topk_images(
        jnp.asarray(desc), jnp.asarray(masks_pad), jnp.asarray(adj_pad),
        jnp.asarray(centers), mean, comps, var,
        jnp.asarray(db), jnp.asarray(db_ids), **kw))
    np.testing.assert_array_equal(top_plain, top_padded)


def test_fused_query_never_matched_bins_emit_minus_one(rng):
    """Unused Borda headroom bins (incremental serving) and unmatched
    images must not fill the returned top-k — unfilled ranks are -1
    (mirrors retrieval.matching.weighted_borda_predict)."""
    (desc, centers, masks, adj, db, db_ids,
     mean, comps, var, C) = _tiny_query_setup(rng, n_ref_imgs=2,
                                              segs_per=4)
    top = np.asarray(query_topk_images(
        jnp.asarray(desc), jnp.asarray(masks), jnp.asarray(adj),
        jnp.asarray(centers), mean, comps, var,
        jnp.asarray(db), jnp.asarray(db_ids),
        num_clusters=C, num_ref_images=50,   # 48 nonexistent bins
        knn_topk=8, borda_topk=8, top_images=5, db_tile=128))
    assert set(top[top >= 0].tolist()) <= {0, 1}, top
    assert (top[2:] == -1).all(), top


def test_precomputed_db_norms_identical(rng):
    """query_topk_images(db_norms=...) must match the in-program norm
    recompute EXACTLY, on both the one-shot and streaming-tiled kNN
    paths (the serving swap keeps norms alongside the rows — r5 tail
    probe: the per-query recompute was a full extra database read)."""
    (desc, centers, masks, adj, db, db_ids,
     mean, comps, var, C) = _tiny_query_setup(rng, n_ref_imgs=12,
                                              segs_per=20)
    norms = jnp.sum(jnp.asarray(db).astype(jnp.float32) ** 2, axis=1)
    # cap=0 forces the streaming-tiled branch on this tiny db
    for cap in (256 * 1024 * 1024, 0):
        kw = dict(num_clusters=C, num_ref_images=12, knn_topk=30,
                  borda_topk=20, top_images=5, db_tile=128,
                  oneshot_cap_bytes=cap)
        a = np.asarray(query_topk_images(
            jnp.asarray(desc), jnp.asarray(masks), jnp.asarray(adj),
            jnp.asarray(centers), mean, comps, var,
            jnp.asarray(db), jnp.asarray(db_ids), **kw))
        b = np.asarray(query_topk_images(
            jnp.asarray(desc), jnp.asarray(masks), jnp.asarray(adj),
            jnp.asarray(centers), mean, comps, var,
            jnp.asarray(db), jnp.asarray(db_ids), db_norms=norms, **kw))
        np.testing.assert_array_equal(a, b)
