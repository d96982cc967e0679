"""Exact brute-force kNN on TPU — the FAISS IndexFlat replacement.

The reference searches FAISS ``IndexFlatL2`` on CPU for the top-200 database
segments per query segment (place_rec_main.py:53-60) and ``IndexFlatIP/L2``
for image-level recall (utilities.py:440-450). Here the database stays in
device HBM and the search is a tiled ``Q @ D^T`` matmul with a streaming
top-k merge (``lax.top_k`` over [current | new-tile] candidates inside a
scan) — no host round-trip, MXU-bound, and shardable over a mesh
(see revisit_anything_tpu.parallel.sharded_knn).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _pad_rows(x: jnp.ndarray, multiple: int, value: float) -> jnp.ndarray:
    pad = (-x.shape[0]) % multiple
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], value, x.dtype)], axis=0)


@partial(jax.jit, static_argnames=("k", "db_tile", "varying_axis"))
def _knn_scores(query: jnp.ndarray, db: jnp.ndarray, db_norms: jnp.ndarray,
                k: int, db_tile: int,
                varying_axis: str = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming top-k of score = q·d - 0.5||d||² (db_norms=||d||²) or plain
    q·d (db_norms=0). Returns (scores [Nq,k], indices [Nq,k]) descending.

    ``varying_axis``: when called inside shard_map with device-varying db,
    the scan's init carry must be marked varying over that mesh axis.
    """
    nq = query.shape[0]
    nd = db.shape[0]
    num_tiles = nd // db_tile
    db_t = db.reshape(num_tiles, db_tile, db.shape[1])
    norms_t = db_norms.reshape(num_tiles, db_tile)

    init_scores = jnp.full((nq, k), -jnp.inf, jnp.float32)
    init_idx = jnp.zeros((nq, k), jnp.int32)
    if varying_axis is not None:
        init_scores = jax.lax.pcast(init_scores, (varying_axis,),
                                    to="varying")
        init_idx = jax.lax.pcast(init_idx, (varying_axis,), to="varying")

    def body(carry, tile):
        best_s, best_i = carry
        d_tile, n_tile, tile_no = tile
        if db.dtype == jnp.bfloat16:
            # half-memory database: bf16 x bf16 multiplies are exact into
            # the MXU's f32 accumulator; only the one-time bf16 rounding
            # of the operands applies (≤4e-3 relative per element)
            s = jnp.dot(query.astype(jnp.bfloat16), d_tile.T,
                        preferred_element_type=jnp.float32)
        else:
            s = jnp.dot(query, d_tile.T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        s = s - 0.5 * n_tile[None, :]
        idx = tile_no * db_tile + jnp.arange(db_tile, dtype=jnp.int32)
        cand_s = jnp.concatenate([best_s, s], axis=1)
        cand_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(idx, (nq, db_tile))], axis=1)
        top_s, top_pos = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i, top_pos, axis=1)
        return (top_s, top_i), None

    tiles = (db_t, norms_t, jnp.arange(num_tiles, dtype=jnp.int32))
    (scores, indices), _ = jax.lax.scan(body, (init_scores, init_idx), tiles)
    return scores, indices


def knn_l2(query: jnp.ndarray, db: jnp.ndarray, k: int,
           db_tile: int = 8192) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact L2 kNN (k is narrowed to min(k, n_db): unlike FAISS, which
    pads with -1/inf sentinels beyond ntotal, the output has
    min(k, n_db) columns — size k from the caller's view only when the
    database is at least that large). Returns (squared_l2 [Nq,k] ascending, indices [Nq,k]),
    matching faiss.IndexFlatL2.search output conventions."""
    query = query.astype(jnp.float32)
    db = db.astype(jnp.float32)
    nd = db.shape[0]
    k = min(k, nd)
    db_tile = min(db_tile, max(128, nd))
    db_p = _pad_rows(db, db_tile, 0.0)
    norms = jnp.sum(db_p * db_p, axis=1)
    # Padding rows: force -inf score so they never surface.
    pad = db_p.shape[0] - nd
    if pad:
        norms = norms.at[nd:].set(jnp.inf)
    scores, indices = _knn_scores(query, db_p, norms, k, db_tile)
    q_norms = jnp.sum(query * query, axis=1, keepdims=True)
    sq_l2 = q_norms - 2.0 * scores  # score = q·d - ||d||²/2
    return sq_l2, indices


def knn_inner_product(query: jnp.ndarray, db: jnp.ndarray, k: int,
                      db_tile: int = 8192) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact max-inner-product search (faiss.IndexFlatIP equivalent).
    Returns (dot products descending, indices)."""
    query = query.astype(jnp.float32)
    db = db.astype(jnp.float32)
    nd = db.shape[0]
    k = min(k, nd)
    db_tile = min(db_tile, max(128, nd))
    db_p = _pad_rows(db, db_tile, 0.0)
    norms = jnp.zeros(db_p.shape[0], jnp.float32)
    pad = db_p.shape[0] - nd
    if pad:
        norms = norms.at[nd:].set(jnp.inf)
    return _knn_scores(query, db_p, norms, k, db_tile)
