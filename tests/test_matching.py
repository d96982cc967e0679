"""Rank fusion: host oracle parity + vectorized JAX path consistency."""

import numpy as np

from revisit_anything_tpu.retrieval.matching import (
    first_k_unique, get_matches_host, weighted_borda_predict)
from revisit_anything_tpu.retrieval.recall import calc_recall


def make_retrieval_case(rng, n_q_img=6, n_r_img=10, segs_per=5, R=8):
    n_q_segs = n_q_img * segs_per
    n_r_segs = n_r_img * segs_per
    matches = rng.integers(0, n_r_segs, size=(n_q_segs, R))
    sims = rng.random((n_q_segs, R)).astype(np.float64)
    seg_ranges = [np.arange(i * segs_per, (i + 1) * segs_per)
                  for i in range(n_q_img)]
    im_inds_ref = np.repeat(np.arange(n_r_img), segs_per)
    q_img_ids = np.repeat(np.arange(n_q_img), segs_per)
    return matches, sims, seg_ranges, im_inds_ref, q_img_ids, n_q_img, n_r_img


def oracle_wt_borda(matches, sims, seg_ranges, im_inds_ref, n):
    """Independent oracle: direct per-image score accumulation + argsort."""
    s_min, s_max = sims.min(), sims.max()
    norm = (sims - s_min) / (s_max - s_min)
    preds = []
    for rows in seg_ranges:
        scores = np.zeros(im_inds_ref.max() + 1)
        np.add.at(scores, im_inds_ref[matches[rows]].ravel(),
                  norm[rows].ravel())
        preds.append(np.argsort(-scores, kind="stable")[:n])
    return preds


def test_host_wt_borda_matches_oracle(rng):
    matches, sims, seg_ranges, im_inds_ref, *_ = make_retrieval_case(rng)
    ours = get_matches_host(matches, sims, seg_ranges, im_inds_ref, n=5)
    ref = oracle_wt_borda(matches, sims, seg_ranges, im_inds_ref, n=5)
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(a, b)


def test_jax_wt_borda_matches_host(rng):
    (matches, sims, seg_ranges, im_inds_ref,
     q_img_ids, n_q, n_r) = make_retrieval_case(rng)
    host = get_matches_host(matches, sims, seg_ranges, im_inds_ref, n=5)
    dev = np.asarray(weighted_borda_predict(
        sims.astype(np.float32), matches, q_img_ids, im_inds_ref,
        n_q, n_r, n=5))
    for a, b in zip(host, dev):
        np.testing.assert_array_equal(a, b)


def test_first_k_unique():
    assert first_k_unique([3, 1, 3, 2, 1, 5], 3) == [3, 1, 2]
    assert first_k_unique([1, 1, 1], 3) == [1]


def test_max_sim_and_topk_methods_run(rng):
    matches, sims, seg_ranges, im_inds_ref, *_ = make_retrieval_case(rng)
    for method in ("max_sim", "max_seg_topk"):
        preds = get_matches_host(matches, sims, seg_ranges, im_inds_ref,
                                 n=3, method=method)
        assert len(preds) == len(seg_ranges)
        assert all(len(p) <= 3 for p in preds)


def test_calc_recall_semantics():
    preds = [[1, 2, 3], [9, 9, 4], [0, 0, 0], [5, 6, 7]]
    gt = [[2], [4], [], [8]]
    # query0 hits at rank2, query1 at rank3, query2 skipped, query3 never.
    recalls = calc_recall(preds, gt, 3)
    np.testing.assert_allclose(recalls, [0.0, 1 / 3, 2 / 3])


def test_end_to_end_voting_recovers_planted_signal(rng):
    # Plant: each query image's segments match segments of db image (q+2)%n
    # with high sims. Voting must recover it.
    (matches, sims, seg_ranges, im_inds_ref,
     q_img_ids, n_q, n_r) = make_retrieval_case(rng, R=8)
    segs_per = 5
    for q in range(n_q):
        target = (q + 2) % n_r
        target_rows = np.where(im_inds_ref == target)[0]
        rows = seg_ranges[q]
        matches[rows, :3] = rng.choice(target_rows, size=(len(rows), 3))
        sims[rows, :3] = 10.0
    preds = get_matches_host(matches, sims, seg_ranges, im_inds_ref, n=1)
    got = [int(p[0]) for p in preds]
    assert got == [(q + 2) % n_r for q in range(n_q)]


def test_top_k_recall_one_percent(rng):
    from revisit_anything_tpu.retrieval.recall import top_k_recall
    db = rng.standard_normal((300, 16)).astype(np.float32)
    q = db[[5, 10]] + 0.001
    gt = [[5], [999]]
    recalls, idx, pct = top_k_recall(db, q, gt, k=5,
                                     return_one_percent=True)
    # threshold = 3 (300/100); query0 hit at rank 1 → counted; query1 never
    assert pct == 0.5
    assert recalls[0] == 0.5
