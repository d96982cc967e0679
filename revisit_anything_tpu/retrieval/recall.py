"""Recall@K and mAP metrics (func_vpr.py:352-422, :833-883)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from revisit_anything_tpu.ops.knn import knn_inner_product, knn_l2


def calc_recall(preds: Sequence[Sequence[int]],
                gt: Sequence[Sequence[int]],
                n: int) -> List[float]:
    """Cumulative first-hit Recall@1..n over queries with non-empty gt,
    exactly mirroring func_vpr.py:396-422."""
    hits = [0] * n
    num_eval = 0
    for pred_i, gt_i in zip(preds, gt):
        if len(gt_i) == 0:
            continue
        num_eval += 1
        gt_set = set(int(g) for g in gt_i)
        for j, p in enumerate(pred_i[:n]):
            if int(p) in gt_set:
                hits[j] += 1
                break
    if num_eval == 0:
        return [0.0] * n
    return (np.cumsum(hits) / float(num_eval)).tolist()


def calculate_map(preds: Sequence[Sequence[int]],
                  gt: Sequence[Sequence[int]]) -> float:
    """Mean average precision over queries (func_vpr.py:360-392).

    Empty-gt queries contribute AP=0 and stay in the denominator —
    the reference averages `calculate_ap` over ALL queries
    (func_vpr.py:391-392)."""
    ap_sum = 0.0
    num_eval = 0
    for pred_i, gt_i in zip(preds, gt):
        num_eval += 1
        gt_set = set(int(g) for g in gt_i)
        hits = 0
        precision_sum = 0.0
        for rank, p in enumerate(pred_i, start=1):
            if int(p) in gt_set:
                hits += 1
                precision_sum += hits / rank
        ap_sum += precision_sum / hits if hits else 0.0
    return ap_sum / max(1, num_eval)


def top_k_recall(db_desc: jnp.ndarray,
                 query_desc: jnp.ndarray,
                 gt: Sequence[Sequence[int]],
                 k: int = 5,
                 metric: str = "l2",
                 return_one_percent: bool = False,
                 sub_sample_db: int = 1,
                 sub_sample_qu: int = 1
                 ) -> Tuple[List[float], np.ndarray]:
    """Image-level Recall@1..k via on-TPU kNN over whole-image descriptors
    (the AnyLoc evaluation path — utilities.py:390-469 / func_vpr.py:833-883).

    ``sub_sample_db`` / ``sub_sample_qu``: when the descriptors are
    ``[::stride]`` sub-samples of the full sets but ``gt`` indexes the
    FULL sets, retrieved db indices are rescaled by ``sub_sample_db``
    and query ``i`` looks up ``gt[i * sub_sample_qu]`` before the gt
    comparison (utilities.py:455-466). The returned indices stay in the
    sub-sampled db space, like the reference's.

    Returns (recalls, indices [Nq, k]); with return_one_percent also the
    1%-recall (hit within the top max(n_db/100, 1) — capped at k like the
    reference, which intersects only the k retrieved neighbors)."""
    if metric == "l2":
        _, idx = knn_l2(query_desc, db_desc, k)
    else:
        _, idx = knn_inner_product(query_desc, db_desc, k)
    idx = np.asarray(idx)
    gt_eval = [gt[i * sub_sample_qu] for i in range(len(idx))]
    scaled = idx * sub_sample_db
    recalls = calc_recall([row.tolist() for row in scaled], gt_eval, k)
    if not return_one_percent:
        return recalls, idx
    threshold = min(max(int(round(len(np.asarray(db_desc)) / 100.0)), 1), k)
    hits, num_eval = 0, 0
    for qi, gt_q in enumerate(gt_eval):
        if len(gt_q) == 0:
            continue
        num_eval += 1
        if set(scaled[qi][:threshold].tolist()) & set(int(g) for g in gt_q):
            hits += 1
    return recalls, idx, hits / max(num_eval, 1)
