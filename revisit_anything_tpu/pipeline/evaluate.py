"""Retrieval + evaluation driver — the place_rec_main.py equivalent.

Orchestrates: segment banks → (optional) PCA → on-TPU kNN → weighted-Borda
voting → Recall@K, mirroring recall_segloc (place_rec_main.py:44-96) with
the FAISS search replaced by revisit_anything_tpu.ops.knn.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from revisit_anything_tpu.config import (BORDA_TOPK, KNN_TOPK, RECALL_TOPK)
from revisit_anything_tpu.ops.knn import knn_l2
from revisit_anything_tpu.ops.pca import PCAParams, pca_apply
from revisit_anything_tpu.pipeline.aggregate import SegmentBank
from revisit_anything_tpu.retrieval.matching import get_matches_host
from revisit_anything_tpu.retrieval.recall import calc_recall, calculate_map
from revisit_anything_tpu.utils.profiling import stage_timer


@dataclasses.dataclass
class RetrievalResult:
    recalls: List[float]
    predictions: List[np.ndarray]
    matches: np.ndarray          # [n_query_segs, K] db segment ids
    sims: np.ndarray             # [n_query_segs, K] squared L2 (faiss conv.)
    map_value: Optional[float] = None
    # AnyLoc branch only: hit within the top max(n_db/100, 1) retrieved
    # neighbors (func_vpr.py get_recall :852,875-878)
    one_percent_recall: Optional[float] = None


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    """normalizeFeat (func_vpr.py:1673-1676): row L2 normalization."""
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def apply_pca_in_batches(bank: SegmentBank, pca: PCAParams,
                         batch_rows: int = 50000) -> SegmentBank:
    """PCA-project a segment bank on device, streamed in row batches."""
    out = []
    n = len(bank.descriptors)
    for s in range(0, n, batch_rows):
        out.append(np.asarray(pca_apply(
            jnp.asarray(bank.descriptors[s:s + batch_rows]), pca)))
    return SegmentBank(np.concatenate(out) if out else bank.descriptors,
                       bank.image_indices, num_images=bank.num_images)


def run_segloc_retrieval(db_bank: SegmentBank,
                         query_bank: SegmentBank,
                         gt: Sequence[Sequence[int]],
                         pca: Optional[PCAParams] = None,
                         knn_topk: int = KNN_TOPK,
                         borda_topk: int = BORDA_TOPK,
                         recall_topk: int = RECALL_TOPK,
                         map_calculate: bool = False,
                         device_voting: bool = True,
                         mesh="auto") -> RetrievalResult:
    """SegLoc retrieval: kNN of query segments over db segments + weighted
    Borda voting over db image bins (recall_segloc, place_rec_main.py:44-96).

    With PCA, descriptors are row-normalized before the L2 search
    (place_rec_main.py:55-57); raw VLADs are already unit-norm.

    device_voting=True (default) runs the Borda accumulation as one
    on-device segment_sum + top_k instead of the per-query host loop —
    identical predictions up to equal-score tie ordering.

    mesh: "auto" shards the kNN database over all local devices when more
    than one is visible (sharded_knn_l2); pass an explicit Mesh, or None
    to force the single-device path.
    """
    timer = stage_timer()
    db = db_bank.descriptors
    q = query_bank.descriptors
    if pca is not None:
        with timer.stage("retrieval.pca"):
            # streamed: million-segment 49152-d banks don't fit HBM at once
            db = apply_pca_in_batches(db_bank, pca).descriptors
            q = apply_pca_in_batches(query_bank, pca).descriptors
        db = _normalize_rows(db)
        q = _normalize_rows(q)

    from revisit_anything_tpu.parallel import resolve_mesh, sharded_knn_l2
    mesh = resolve_mesh(mesh)
    with timer.stage("retrieval.knn"):
        if mesh is not None and mesh.devices.size > 1:
            sq_l2, matches = sharded_knn_l2(
                np.asarray(q, np.float32), np.asarray(db, np.float32),
                knn_topk, mesh)
        else:
            sq_l2, matches = knn_l2(jnp.asarray(q), jnp.asarray(db),
                                    knn_topk)
        sq_l2 = np.asarray(sq_l2)
        matches = np.asarray(matches)

    with timer.stage("retrieval.vote"):
        sims = 2.0 - sq_l2[:, :borda_topk]
        m50 = matches[:, :borda_topk]
        # query/image counts must cover EVERY query in gt: a trailing
        # image with zero segments never appears in image_indices, and
        # silently dropping it would inflate recall (the reference
        # iterates range(len(gt)) — such a query counts as a miss)
        derived = (int(query_bank.image_indices.max()) + 1
                   if len(query_bank.image_indices) else 0)
        n_q = max(len(gt), query_bank.num_images or 0, derived)
        if device_voting:
            from revisit_anything_tpu.retrieval.matching import (
                weighted_borda_predict)
            n_r = int(db_bank.image_indices.max()) + 1
            preds_arr = np.asarray(weighted_borda_predict(
                jnp.asarray(sims), jnp.asarray(m50),
                jnp.asarray(query_bank.image_indices),
                jnp.asarray(db_bank.image_indices),
                n_q, n_r, n=recall_topk))
            preds = [row for row in preds_arr]
        else:
            ranges = query_bank.seg_ranges
            ranges += [np.zeros((0,), np.int64)
                       for _ in range(n_q - len(ranges))]
            preds = get_matches_host(m50, sims, ranges,
                                     db_bank.image_indices, n=recall_topk,
                                     method="max_seg_topk_wt_borda_Im")
    recalls = calc_recall(preds, gt, recall_topk)
    map_value = calculate_map(preds, gt) if map_calculate else None
    return RetrievalResult(recalls, preds, matches, sq_l2, map_value)


def run_anyloc_retrieval(db_vlads: np.ndarray,
                         query_vlads: np.ndarray,
                         gt: Sequence[Sequence[int]],
                         recall_topk: int = RECALL_TOPK) -> RetrievalResult:
    """AnyLoc baseline: whole-image VLAD kNN (place_rec_main.py:379-419 /
    func_vpr.py get_recall :833-883), reporting the reference's
    1%-recall alongside Recall@1..k."""
    sq_l2, matches = knn_l2(jnp.asarray(query_vlads), jnp.asarray(db_vlads),
                            recall_topk)
    matches = np.asarray(matches)
    preds = [row for row in matches]
    # get_recall iterates range(len(queries)) and indexes gt[i]
    # (func_vpr.py:855-862): gt entries beyond the query count are never
    # reached; a SHORTER gt still fails loudly (reference: IndexError,
    # here: calc_recall's length guard).
    recalls = calc_recall(preds, list(gt)[:len(preds)], recall_topk)
    # 1%-recall: threshold = max(round(n_db/100), 1), intersected with
    # the k retrieved neighbors only; the reference iterates
    # range(len(queries)) (func_vpr.py:852,855-878)
    from revisit_anything_tpu.retrieval.recall import one_percent_recall
    one_pct = one_percent_recall(matches, gt, len(db_vlads), recall_topk)
    return RetrievalResult(recalls, preds, matches, np.asarray(sq_l2),
                           one_percent_recall=one_pct)
