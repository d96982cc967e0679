"""Segment matches → image predictions (rank fusion).

The production method is ``max_seg_topk_wt_borda_Im`` (func_vpr.py:207-224):
per query image, min-max-normalize similarity scores (global min/max over the
whole sims matrix), accumulate each matched database segment's normalized
similarity into its database-IMAGE bin (weighted Borda count), then predict
the top-n database images by accumulated score.

Two implementations:
- ``weighted_borda_predict``: vectorized JAX — one scatter-add
  (segment_sum) over (query image × database image) bins + top_k. This is
  the production TPU path.
- ``get_matches_host``: per-query host reference covering the additional
  fusion methods (max_sim, max_seg_topk, borda variants) for parity and
  analysis, mirroring func_vpr.py:80-243 semantics.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def first_k_unique(values: Sequence[int], k: int) -> List[int]:
    """First K unique values, order-preserving (func_vpr.py:50-59)."""
    seen = set()
    out = []
    for v in values:
        if v not in seen:
            seen.add(v)
            out.append(v)
            if len(out) == k:
                break
    return out


def _weighted_borda_rank(pairs) -> List[int]:
    """Indices sorted by accumulated score, desc; insertion-order tie-break
    (func_vpr.py:61-77 dict semantics)."""
    scores = {}
    for index, score in pairs:
        scores[index] = scores.get(index, 0.0) + score
    return sorted(scores.keys(), key=lambda i: scores[i], reverse=True)


# The reference calls merge_ranked_lists / average_rank_method /
# average_similarity_scores (func_vpr.py:128,137,173,191,200,236) but never
# defines them anywhere in the tree — those get_matches branches raise
# NameError if exercised. We implement the standard rank-fusion semantics
# the names and call sites imply, keeping the surrounding branch structure
# (per-rank column lists, bincount tails) identical to the reference.

def merge_ranked_lists(*ranked_lists) -> List[int]:
    """Classic Borda-count merge: item at rank r in a list of length L
    scores L - r; items absent from a list score 0 there. Sorted by total
    score desc, insertion-order tie-break."""
    scores = {}
    for lst in ranked_lists:
        n = len(lst)
        for r, idx in enumerate(lst):
            idx = int(idx)
            scores[idx] = scores.get(idx, 0) + (n - r)
    return sorted(scores.keys(), key=lambda i: scores[i], reverse=True)


def average_rank_method(*ranked_lists) -> List[int]:
    """Mean-rank merge: items sorted by their average 0-based rank over the
    lists they appear in, ascending (best rank first)."""
    rank_sum = {}
    count = {}
    for lst in ranked_lists:
        for r, idx in enumerate(lst):
            idx = int(idx)
            rank_sum[idx] = rank_sum.get(idx, 0) + r
            count[idx] = count.get(idx, 0) + 1
    return sorted(rank_sum.keys(), key=lambda i: rank_sum[i] / count[i])


def average_similarity_scores(*ranked_lists_with_scores) -> List[int]:
    """Like weighted_borda_count but averaging an item's scores over its
    appearances instead of summing; sorted desc."""
    score_sum = {}
    count = {}
    for lst in ranked_lists_with_scores:
        for idx, score in lst:
            idx = int(idx)
            score_sum[idx] = score_sum.get(idx, 0.0) + score
            count[idx] = count.get(idx, 0) + 1
    return sorted(score_sum.keys(),
                  key=lambda i: score_sum[i] / count[i], reverse=True)


def _bincount_top(seg_ids: np.ndarray, im_inds_ref: np.ndarray,
                  n: int) -> np.ndarray:
    """The shared get_matches tail: bincount matched segments' image ids,
    return the top-n images by vote count (func_vpr.py:129-131 pattern:
    ``segIdx[flip(argsort(bincount[segIdx])[-n:])]``).

    kind="stable" like every other method here: the reference's default
    introsort leaves vote TIES in an unspecifiable order, so exact tie
    parity is impossible — a deterministic stable order is the
    documented deviation (README known deviations)."""
    counts = np.bincount(im_inds_ref[np.asarray(seg_ids, dtype=np.int64)])
    nonzero = np.where(counts > 0)[0]
    return nonzero[np.flip(np.argsort(counts[nonzero], kind="stable")[-n:])]


def get_matches_host(matches: np.ndarray,
                     sims: np.ndarray,
                     seg_range_query: Sequence[np.ndarray],
                     im_inds_ref: np.ndarray,
                     n: int = 5,
                     method: str = "max_seg_topk_wt_borda_Im"
                     ) -> List[np.ndarray]:
    """Host rank fusion over per-segment kNN results.

    Args:
      matches: [n_query_segs, R] database segment indices per query segment.
      sims: [n_query_segs, R] similarity scores (2 - L2², higher better).
      seg_range_query: per query image, the row indices of its segments.
      im_inds_ref: [n_db_segs] database image id per database segment.
      n: predictions per query image.
    """
    preds: List[np.ndarray] = []
    sims_max = float(np.max(sims))
    sims_min = float(np.min(sims))
    denom = (sims_max - sims_min) or 1.0

    for rows in seg_range_query:
        m = matches[rows]            # [S, R]
        s = sims[rows]               # [S, R]
        if method == "max_sim":
            order = np.flip(np.argsort(s.ravel(), kind="stable")[-50:])
            pred = im_inds_ref[m.ravel()[order]]
            preds.append(np.array(first_k_unique(pred.tolist(), n)))
        elif method == "max_seg":
            # top-n db images by segment-vote count, rank-1 matches only
            # (func_vpr.py:91-100)
            counts = np.bincount(im_inds_ref[m[:, 0]])
            nonzero = np.where(counts > 0)[0]
            top = nonzero[np.flip(
                np.argsort(counts[nonzero], kind="stable")[-n:])]
            preds.append(top)
        elif method == "max_seg_sim":
            # top-6 by vote count, re-ranked by each image's best similarity
            # (func_vpr.py:102-120)
            counts = np.bincount(im_inds_ref[m[:, 0]])
            nonzero = np.where(counts > 0)[0]
            cand = nonzero[np.flip(
                np.argsort(counts[nonzero], kind="stable")[-6:])]
            best = [np.max(s[:, 0][im_inds_ref[m[:, 0]] == c])
                    for c in cand]
            preds.append(cand[np.flip(np.argsort(best, kind="stable"))][:n])
        elif method == "max_seg_topk":
            counts = np.bincount(im_inds_ref[m.ravel()])
            nonzero = np.where(counts > 0)[0]
            top = nonzero[np.flip(np.argsort(counts[nonzero], kind="stable")[-n:])]
            preds.append(top)
        elif method == "max_seg_topk_wt_borda_Im":
            norm_s = (s - sims_min) / denom
            # Rank-major iteration (transpose) matches the reference's
            # per-rank ranked-lists construction (func_vpr.py:207-224).
            pairs = []
            ids = im_inds_ref[m]
            for rank in range(m.shape[1]):
                pairs.extend(zip(ids[:, rank].tolist(),
                                 norm_s[:, rank].tolist()))
            ranked = _weighted_borda_rank(pairs)
            preds.append(np.array(ranked[:n]))
        elif method == "max_seg_topk_wt_borda":
            # weighted Borda over SEGMENT ids, then top-n images by vote
            # count of the ranked segments (func_vpr.py:145-161)
            norm_s = (s - sims_min) / denom
            pairs = []
            for rank in range(m.shape[1]):
                pairs.extend(zip(m[:, rank].tolist(),
                                 norm_s[:, rank].tolist()))
            ranked = _weighted_borda_rank(pairs)
            preds.append(_bincount_top(ranked, im_inds_ref, n))
        elif method == "max_seg_topk_borda":
            # per-rank segment columns merged by Borda count, bincount tail
            # (func_vpr.py:126-134)
            ranked = merge_ranked_lists(*m.T.tolist())
            preds.append(_bincount_top(ranked, im_inds_ref, n))
        elif method == "max_seg_topk_avg":
            # mean-rank merge of segment columns (func_vpr.py:135-143)
            ranked = average_rank_method(*m.T.tolist())
            preds.append(_bincount_top(ranked, im_inds_ref, n))
        elif method == "max_seg_topk_avg_sim":
            # average normalized similarity per segment (func_vpr.py:162-178)
            norm_s = (s - sims_min) / denom
            pair_lists = [list(zip(m[:, r].tolist(), norm_s[:, r].tolist()))
                          for r in range(m.shape[1])]
            ranked = average_similarity_scores(*pair_lists)
            preds.append(_bincount_top(ranked, im_inds_ref, n))
        elif method == "max_seg_topk_borda_Im":
            # Borda merge directly over per-rank IMAGE-id columns
            # (func_vpr.py:190-198)
            ranked = merge_ranked_lists(*[im_inds_ref[m[:, r]].tolist()
                                          for r in range(m.shape[1])])
            preds.append(np.array(ranked[:n]))
        elif method == "max_seg_topk_avg_Im":
            # mean-rank merge over image-id columns (func_vpr.py:199-207)
            ranked = average_rank_method(*[im_inds_ref[m[:, r]].tolist()
                                           for r in range(m.shape[1])])
            preds.append(np.array(ranked[:n]))
        elif method == "max_seg_topk_avg_sim_Im":
            # average normalized similarity per image (func_vpr.py:225-243)
            norm_s = (s - sims_min) / denom
            pair_lists = [list(zip(im_inds_ref[m[:, r]].tolist(),
                                   norm_s[:, r].tolist()))
                          for r in range(m.shape[1])]
            ranked = average_similarity_scores(*pair_lists)
            preds.append(np.array(ranked[:n]))
        else:
            raise NotImplementedError(f"method {method!r}")
    return preds


def get_matches_for_single_image_pair(matches: np.ndarray,
                                      sims: np.ndarray,
                                      seg_range_query,
                                      top: int = 50):
    """Single query/reference image-pair qualitative analysis
    (func_vpr.py:247-315, max_sim branch — the only live one there):
    the query's segment rows sorted by similarity desc, with the matched
    database segment ids in the same order.

    Returns (sorted_query_segment_indices, sorted_db_segment_indices).
    """
    rows = seg_range_query[0]
    order = np.flip(np.argsort(sims[rows].ravel())[-top:])
    seg_idx, rank_idx = np.unravel_index(order, sims[rows].shape)
    return seg_idx, matches[rows][seg_idx, rank_idx]


@partial(jax.jit, static_argnames=("num_query_images", "num_ref_images", "n"))
def weighted_borda_predict(sims: jnp.ndarray,
                           matches: jnp.ndarray,
                           query_img_ids: jnp.ndarray,
                           ref_img_ids: jnp.ndarray,
                           num_query_images: int,
                           num_ref_images: int,
                           n: int = 5) -> jnp.ndarray:
    """Vectorized production fusion (max_seg_topk_wt_borda_Im) on device.

    Args:
      sims: [n_query_segs, R] similarities (2 - L2²).
      matches: [n_query_segs, R] db segment indices.
      query_img_ids: [n_query_segs] query image id per query segment.
      ref_img_ids: [n_db_segs] db image id per db segment.

    Returns:
      [num_query_images, n] predicted db image ids, best first. Query
      images with no segments in this sims matrix predict -1 rows — a
      miss, matching the host path which predicts nothing for them.
      (Voted-ness comes from segment OWNERSHIP, not the score maximum:
      a real query whose sims all tie the global minimum min-max
      normalizes to exactly 0 but must still predict, as
      get_matches_host does.)

    Scale note: votes live in a dense [num_query_images x
    num_ref_images] f32 bin space (vectorized scatter-add). For image
    counts where that exceeds int32 indexing this raises — use
    get_matches_host there.
    """
    if num_query_images * num_ref_images >= 2**31:
        raise ValueError(
            f"dense Borda bin space {num_query_images}x{num_ref_images} "
            "exceeds int32 indexing; use get_matches_host at this scale")
    sims = sims.astype(jnp.float32)
    s_min = jnp.min(sims)
    s_max = jnp.max(sims)
    norm = (sims - s_min) / jnp.maximum(s_max - s_min, 1e-30)

    ref_ids = ref_img_ids[matches]                      # [S, R]
    flat_bins = (query_img_ids[:, None] * num_ref_images
                 + ref_ids).reshape(-1)
    nbins = num_query_images * num_ref_images
    scores = jax.ops.segment_sum(norm.reshape(-1), flat_bins,
                                 num_segments=nbins)
    scores = scores.reshape(num_query_images, num_ref_images)
    # A query whose sims all tie the GLOBAL minimum has all-zero
    # normalized scores; dense top_k would then surface image ids that
    # never appeared in its matches. Rank such rows by appearance count
    # instead (the host path's zero-score tie-break is insertion order —
    # arbitrary).
    counts = jax.ops.segment_sum(
        jnp.ones((flat_bins.shape[0],), jnp.float32), flat_bins,
        num_segments=nbins).reshape(num_query_images, num_ref_images)
    has_score = jnp.max(scores, axis=1, keepdims=True) > 0.0
    ranked = jnp.where(has_score, scores, counts)
    # NEVER-matched bins must not fill prediction ranks: a query that
    # matched < n distinct db images would otherwise pad its row with
    # arbitrary low-id images, which can fake Recall hits the host path
    # (whose ranked list contains only matched ids,
    # first_k_unique_indices func_vpr.py:50-59) would score as misses.
    # Mask them to -inf and emit -1 for the unfilled ranks.
    ranked = jnp.where(counts > 0.0, ranked, -jnp.inf)
    vals, top = jax.lax.top_k(ranked, min(n, num_ref_images))
    top = jnp.where(jnp.isneginf(vals), -1, top)
    # voted-ness from segment ownership, not the score maximum (see
    # docstring)
    seg_counts = jax.ops.segment_sum(
        jnp.ones((sims.shape[0],), jnp.float32), query_img_ids,
        num_segments=num_query_images)
    voted = (seg_counts > 0.0)[:, None]
    return jnp.where(voted, top, -1)
