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
