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
    if len(preds) < len(gt):
        # the reference indexes pred[i] over range(len(gt)) and would
        # IndexError; a silent zip-truncation here would shrink the
        # denominator and inflate recall (each query needs a prediction
        # row, empty or not)
        raise ValueError(
            f"preds covers {len(preds)} queries but gt has {len(gt)}")
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


def one_percent_recall(retrieved: np.ndarray,
                       gt: Sequence[Sequence[int]],
                       n_db: int,
                       k: int) -> float:
    """1%-recall: hit within the top max(round(n_db/100), 1) retrievals,
    capped at the k neighbors actually retrieved; empty-gt queries are
    skipped (func_vpr.py get_recall :852,855-878). Shared by
    ``top_k_recall`` and ``pipeline.evaluate.run_anyloc_retrieval``."""
    threshold = min(max(int(round(n_db / 100.0)), 1), k)
    hits, num_eval = 0, 0
    for qi, gt_q in enumerate(list(gt)[:len(retrieved)]):
        if len(gt_q) == 0:
            continue
        num_eval += 1
        if set(int(r) for r in retrieved[qi][:threshold]) \
                & set(int(g) for g in gt_q):
            hits += 1
    return hits / max(num_eval, 1)


def top_k_recall(db_desc: jnp.ndarray,
                 query_desc: jnp.ndarray,
                 gt: Sequence[Sequence[int]],
                 k: int = 5,
                 metric: str = "l2",
                 return_one_percent: bool = False,
                 sub_sample_db: int = 1,
                 sub_sample_qu: int = 1,
                 norm_descs: bool = True
                 ) -> Tuple[List[float], np.ndarray]:
    """Image-level Recall@1..k via on-TPU kNN over whole-image descriptors
    (utilities.py get_top_k_recall :390-469; the 1%-recall add-on mirrors
    func_vpr.py get_recall :833-883).

    ``norm_descs``: L2-normalize both sides before the search — the
    reference's default (utilities.py:436-438), making 'l2' and 'cosine'
    rank identically.

    Recall@K divides by ALL queries like the reference
    (``recalls[k] /= len(indices)``, utilities.py:465-466) — empty-gt
    queries count as guaranteed misses. (func_vpr.get_recall's AnyLoc
    convention of skipping them lives in
    ``pipeline.evaluate.run_anyloc_retrieval``; the 1%-recall returned
    here follows that skip convention, as only get_recall defines it.)

    ``sub_sample_db`` / ``sub_sample_qu``: when the descriptors are
    ``[::stride]`` sub-samples of the full sets but ``gt`` indexes the
    FULL sets, retrieved db indices are rescaled by ``sub_sample_db``
    and query ``i`` looks up ``gt[i * sub_sample_qu]`` before the gt
    comparison (utilities.py:455-466). The returned indices stay in the
    sub-sampled db space, like the reference's.

    Returns (recalls, indices [Nq, k]); with return_one_percent also the
    1%-recall."""
    if norm_descs:
        db_desc = db_desc / jnp.maximum(
            jnp.linalg.norm(db_desc, axis=-1, keepdims=True), 1e-12)
        query_desc = query_desc / jnp.maximum(
            jnp.linalg.norm(query_desc, axis=-1, keepdims=True), 1e-12)
    if metric == "l2":
        _, idx = knn_l2(query_desc, db_desc, k)
    else:
        _, idx = knn_inner_product(query_desc, db_desc, k)
    idx = np.asarray(idx)
    gt_eval = [gt[i * sub_sample_qu] for i in range(len(idx))]
    scaled = idx * sub_sample_db
    preds = [row.tolist() for row in scaled]
    recalls = calc_recall(preds, gt_eval, k)
    # reference denominator = ALL queries: rescale from calc_recall's
    # non-empty-gt denominator
    num_eval = sum(1 for g in gt_eval if len(g) > 0)
    if len(idx):
        recalls = [r * num_eval / len(idx) for r in recalls]
    if not return_one_percent:
        return recalls, idx
    pct = one_percent_recall(scaled, gt_eval, int(db_desc.shape[0]), k)
    return recalls, idx, pct
