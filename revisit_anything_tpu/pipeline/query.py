"""Fused online-query path: one device dispatch from dense features to
top-k database images.

The staged pipeline (aggregate → PCA → kNN → vote) round-trips the host
between stages — fine for offline batch evaluation, but each round trip
costs a full dispatch+readback latency when serving single queries. This
fuses segment-VLAD aggregation, PCA projection, row normalization, the
kNN search and weighted-Borda voting into ONE jit; only the final top-k
image ids (tiny) leave the device.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from revisit_anything_tpu.config import BORDA_TOPK, KNN_TOPK, RECALL_TOPK
from revisit_anything_tpu.ops.knn import _knn_scores, _pad_rows
from revisit_anything_tpu.ops.vlad import l2_normalize, segment_vlad

# Magnitude of database guard rows (capacity/shard padding, removed
# entries): their kNN score (q·d − ||d||²/2) is hugely negative, so they
# can never surface, and their sims fall far below the [-2, 2] range of
# row-normalized vectors — the voting cutoff below detects them by that.
DB_GUARD = 1e6


def _segment_rows(desc, patch_masks, adjacency, centers, pca_mean,
                  pca_components, pca_variance, num_clusters: int,
                  whiten: bool):
    """Dense features + masks → PCA-projected, row-normalized segment
    descriptors [M, dim] and validity flags [M] (the shared front half of
    the fused query and of incremental index insertion). The VLAD math is
    ops/vlad.segment_vlad — ONE implementation serves both the offline
    bank build and this fused path, so they cannot drift."""
    flat = segment_vlad(desc, centers, patch_masks, adjacency,
                        num_clusters=num_clusters)

    proj = jnp.dot(flat - pca_mean, pca_components.T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    if whiten:
        proj = proj / jnp.sqrt(pca_variance)
    proj = l2_normalize(proj, axis=-1)

    # valid segments: any true patch (padded mask rows vote zero)
    valid = jnp.any(patch_masks, axis=1)
    return proj, valid


@partial(jax.jit, static_argnames=("num_clusters", "whiten"))
def query_segment_rows(desc: jnp.ndarray,
                       patch_masks: jnp.ndarray,
                       adjacency: Optional[jnp.ndarray],
                       centers: jnp.ndarray,
                       pca_mean: jnp.ndarray,
                       pca_components: jnp.ndarray,
                       pca_variance: jnp.ndarray,
                       num_clusters: int,
                       whiten: bool = True,
                       guard_value: float = DB_GUARD):
    """Database-insertable segment rows for ONE image: invalid (padding)
    rows are replaced by huge-norm guard vectors that can never surface
    in the kNN (score = q·d − ||d||²/2). Returns (rows [M, dim] f32,
    valid [M] bool) — valid rows come first (mask selection orders them
    score-descending with padding after)."""
    proj, valid = _segment_rows(desc, patch_masks, adjacency, centers,
                                pca_mean, pca_components, pca_variance,
                                num_clusters, whiten)
    rows = jnp.where(valid[:, None], proj, guard_value)
    return rows, valid


@partial(jax.jit, static_argnames=("num_clusters", "knn_topk", "borda_topk",
                                   "top_images", "num_ref_images",
                                   "db_tile", "whiten",
                                   "oneshot_cap_bytes"))
def query_topk_images(desc: jnp.ndarray,
                      patch_masks: jnp.ndarray,
                      adjacency: Optional[jnp.ndarray],
                      centers: jnp.ndarray,
                      pca_mean: jnp.ndarray,
                      pca_components: jnp.ndarray,
                      pca_variance: jnp.ndarray,
                      db: jnp.ndarray,
                      db_image_ids: jnp.ndarray,
                      num_clusters: int,
                      num_ref_images: int,
                      knn_topk: int = KNN_TOPK,
                      borda_topk: int = BORDA_TOPK,
                      top_images: int = RECALL_TOPK,
                      db_tile: int = 8192,
                      whiten: bool = True,
                      db_norms: Optional[jnp.ndarray] = None,
                      oneshot_cap_bytes: int = 256 * 1024 * 1024
                      ) -> jnp.ndarray:
    """One query image → top database image ids, fully on device.

    Args:
      desc: [P, D] L2-normalized dense patch descriptors.
      patch_masks: [M, P] bool (padded rows all-false).
      adjacency: [M, M] bool order-K adjacency (padded false) or None.
      centers: [C, D] VLAD vocabulary.
      pca_*: whitened-PCA parameters (projektion to the retrieval dim).
      db: [Nd, dim] PCA-projected, row-normalized database segments.
      db_image_ids: [Nd] database image id per segment.
      db_norms: optional PRECOMPUTED [Nd] f32 squared row norms.
        Recomputing them in-program costs a full extra database read
        per query (410 MB at 100k x 1024 f32 — measured ~1-2 ms of the
        tail); they only change when the database does, so serving
        keeps them alongside the rows (SegVLADServer._db_state).

    Returns [top_images] database image ids, best first.
    """
    proj, valid = _segment_rows(desc, patch_masks, adjacency, centers,
                                pca_mean, pca_components, pca_variance,
                                num_clusters, whiten)

    nd = db.shape[0]
    # The vote only consumes the top min(knn_topk, borda_topk) matches
    # per segment (the reference retrieves 200 then Bordas 50,
    # place_rec_main.py:56-84) — retrieving deeper is pure top-k cost.
    # Measured (BASELINE.md r3): the tail's entire ~12-15 ms was the
    # 13-step streaming top-k merge at k=200; a single top_k over the
    # full score matrix at k=50 measures at the RTT floor (~0 ms).
    k = min(min(knn_topk, borda_topk), nd)
    # One-shot path: materialize all scores ([M, Nd] f32) and run ONE
    # top_k — fastest by a wide margin while the score matrix is small
    # (128 segs x 1M rows = 512 MB; cap well below that). Beyond the cap,
    # fall back to the streaming tiled merge (unbounded Nd, sharded DBs).
    oneshot = proj.shape[0] * nd * 4 <= oneshot_cap_bytes
    if oneshot:
        if db.dtype == jnp.bfloat16:
            # same dtype discipline as the streaming path (_knn_scores):
            # bf16 x bf16 into the f32 accumulator
            s = jnp.dot(proj.astype(jnp.bfloat16), db.T,
                        preferred_element_type=jnp.float32)
        else:
            s = jnp.dot(proj, db.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        norms = (db_norms.astype(jnp.float32) if db_norms is not None
                 else jnp.sum(db.astype(jnp.float32)
                              * db.astype(jnp.float32), axis=1))
        scores, idx = jax.lax.top_k(s - 0.5 * norms[None, :], k)
    else:
        tile = min(db_tile, max(128, nd))
        db_p = _pad_rows(db, tile, 0.0)
        # f32 norms regardless of db storage dtype (bf16 dbs halve HBM;
        # their norms must still accumulate in f32 to match the kNN dot)
        if db_norms is not None:
            norms = jnp.pad(db_norms.astype(jnp.float32),
                            (0, db_p.shape[0] - nd))
        else:
            norms = jnp.sum(db_p.astype(jnp.float32)
                            * db_p.astype(jnp.float32), axis=1)
        if db_p.shape[0] > nd:
            pad_mask = jnp.arange(db_p.shape[0]) >= nd
            norms = jnp.where(pad_mask, jnp.inf, norms)
        scores, idx = _knn_scores(proj, db_p, norms, k, tile)
    q_norms = jnp.sum(proj * proj, axis=1, keepdims=True)
    sq_l2 = q_norms - 2.0 * scores

    kk = k
    sims = 2.0 - sq_l2[:, :kk]
    # Guard/padding rows (capacity or shard padding, removed entries)
    # carry huge norms; when the real database is smaller than the kNN
    # depth they reach the top-k with enormously negative sims and would
    # collapse the min-max normalization. Real sims of row-normalized
    # vectors lie in [-2, 2] — anything below is a guard hit. INVALID
    # query rows (all-false padding masks) also project to a real unit
    # vector (normalize(-pca_mean @ Wᵀ)) whose sims would shift
    # s_min/s_max — the reference's normalization only ever sees real
    # segments (func_vpr.py:207-224), so both are excluded from the
    # statistics and vote zero.
    real = (sims > -4.0) & valid[:, None]
    s_min = jnp.min(jnp.where(real, sims, jnp.inf))
    s_max = jnp.max(jnp.where(real, sims, -jnp.inf))
    norm_s = (sims - s_min) / jnp.maximum(s_max - s_min, 1e-30)
    norm_s = jnp.where(real, norm_s, 0.0)
    ref_ids = db_image_ids[idx[:, :kk]]
    votes = jax.ops.segment_sum(norm_s.reshape(-1), ref_ids.reshape(-1),
                                num_segments=num_ref_images)
    # NEVER-matched bins (zero real matches — unmatched or nonexistent
    # image ids, e.g. unused Borda headroom on an incremental server)
    # must not fill the top-k: emit -1 for unfilled ranks instead
    # (mirrors retrieval.matching.weighted_borda_predict).
    cnt = jax.ops.segment_sum(
        real.astype(jnp.float32).reshape(-1), ref_ids.reshape(-1),
        num_segments=num_ref_images)
    ranked = jnp.where(cnt > 0.0, votes, -jnp.inf)
    vals, top = jax.lax.top_k(ranked, min(top_images, num_ref_images))
    return jnp.where(jnp.isneginf(vals), -1, top)


def pca_tuple(pca) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, bool]:
    """PCAParams → (mean, components, variance, whiten) for the fused query."""
    return (pca.mean, pca.components, pca.explained_variance,
            bool(pca.whiten))
