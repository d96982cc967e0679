"""Database-sharded exact kNN over a device mesh.

The FAISS replacement at scale (SURVEY §2.6): database rows are sharded
over the mesh's data axis (each chip holds N/d rows in HBM), queries are
replicated; every chip runs the local streaming top-k (ops/knn.py), then
an all_gather over ICI merges the per-shard candidates and a final top-k
selects globally — O(k·d) gathered per query instead of the full score
matrix.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from revisit_anything_tpu.ops.knn import _knn_scores, _pad_rows


def sharded_knn_l2(query: np.ndarray, db: np.ndarray, k: int,
                   mesh: Mesh, axis: str = "data",
                   db_tile: int = 8192) -> Tuple[np.ndarray, np.ndarray]:
    """Exact L2 kNN with the database sharded over ``axis``.

    Returns (squared_l2 [Nq, k] ascending, global indices [Nq, k]) matching
    faiss.IndexFlatL2 conventions; bitwise-equal ranking to the single-
    device knn_l2 up to score ties.
    """
    n_devices = mesh.shape[axis]
    nd = db.shape[0]
    k = min(k, nd)

    # Pad db rows so every shard has the same static size.
    shard_rows = -(-nd // n_devices)
    db_p = np.zeros((shard_rows * n_devices, db.shape[1]), np.float32)
    db_p[:nd] = db
    tile = min(db_tile, max(128, shard_rows))
    # per-shard padding is handled inside the mapped fn via norms=inf

    query_j = jnp.asarray(query, jnp.float32)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(axis, None)),
             out_specs=(P(None, axis), P(None, axis)))
    def local_topk(q, db_shard):
        rows = db_shard.shape[0]
        my = jax.lax.axis_index(axis)
        base = my * rows
        dbl = _pad_rows(db_shard, tile, 0.0)
        norms = jnp.sum(dbl * dbl, axis=1)
        # mask shard padding AND global padding rows
        ridx = base + jnp.arange(dbl.shape[0])
        norms = jnp.where((jnp.arange(dbl.shape[0]) >= rows)
                          | (ridx >= nd), jnp.inf, norms)
        scores, idx = _knn_scores(q, dbl, norms, min(k, rows), tile,
                                  varying_axis=axis)
        return scores, idx + base

    scores, indices = local_topk(query_j, jnp.asarray(db_p))
    # merged over the gathered candidate axis: [Nq, n_devices*k_local]
    top_s, pos = jax.lax.top_k(scores, k)
    top_i = jnp.take_along_axis(indices, pos, axis=1)
    q_norms = jnp.sum(query_j * query_j, axis=1, keepdims=True)
    sq_l2 = q_norms - 2.0 * top_s
    return np.asarray(sq_l2), np.asarray(top_i)
