"""Query-tail phase decomposition at the r4 production shapes (round-4
verdict item 4: tail measured 9.2 ms loaded vs the round-3 ≤8 ms target;
the r3 phase split predates the fused keys tail).

Phases (each its own SMALL jit program, async-loop timed, interleaved):

  pool        pool_masks_to_patch_grid   [kmax, 240, 320] → [kmax, 1530]
  vlad        segment_vlad               → [kmax, 49152]
  rows        _segment_rows (vlad + PCA proj + whiten + normalize)
  knn         one-shot score matmul + top_k(50)   (db 100k x 1024)
  full        pool + query_topk_images   (exactly bench.py's query_tail)

Derived: pca ≈ rows − vlad, borda ≈ full − pool − rows − knn.

Holds NO model params (no SAM/DINO) — safe to run alongside nothing else
per the one-TPU-process rule, and its working set is ~0.6 GB (db +
descriptors), far from the shared-HBM cliff that killed the r4 maskhead
probe. Encode canary is replaced by a fixed 4k³ matmul MFU reference so
box weather is still visible without holding SAM.
"""
import sys
import time

import numpy as np

from _ab_common import retry


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.config import (DINO_G_DIM, NUM_CLUSTERS,
                                             PCA_DIM, get_dataset)
    from revisit_anything_tpu.ops.masks import (mask_pool_matrices,
                                                pool_masks_to_patch_grid)
    from revisit_anything_tpu.ops.vlad import segment_vlad
    from revisit_anything_tpu.pipeline.query import (_segment_rows,
                                                     query_topk_images)

    ds = get_dataset("17places")
    H, W = ds.size.hw
    sam_hw = ds.sam_size.hw
    kmax = 128
    n_db = 100_000
    dh, dw = H // 14, W // 14
    p = dh * dw

    pool_a, pool_b = mask_pool_matrices(sam_hw, (H, W))
    pool_a, pool_b = jnp.asarray(pool_a), jnp.asarray(pool_b)

    # synthetic state generated ON DEVICE (uploads through the tunnel
    # dominate otherwise — CLAUDE.md)
    @jax.jit
    def _state(k):
        ks = jax.random.split(k, 6)
        masks = jax.random.uniform(ks[0], (kmax, sam_hw[0], sam_hw[1])) < 0.1
        desc = jax.random.normal(ks[1], (p, DINO_G_DIM), jnp.float32)
        desc = desc / jnp.linalg.norm(desc, axis=1, keepdims=True)
        centers = jax.random.normal(ks[2], (NUM_CLUSTERS, DINO_G_DIM),
                                    jnp.float32)
        comps = jax.random.normal(
            ks[3], (PCA_DIM, NUM_CLUSTERS * DINO_G_DIM), jnp.float32) * 0.01
        db = jax.random.normal(ks[4], (n_db, PCA_DIM), jnp.float32)
        db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
        return masks, desc, centers, comps, db

    print("[tail] generating device state...", flush=True)
    masks, desc, centers, comps, db = retry(
        "state", lambda: jax.block_until_ready(_state(jax.random.PRNGKey(0))))
    pmean = jnp.zeros((NUM_CLUSTERS * DINO_G_DIM,), jnp.float32)
    pvar = jnp.ones((PCA_DIM,), jnp.float32)
    db_ids = jnp.asarray(np.repeat(np.arange(n_db // 50), 50
                                   ).astype(np.int32))
    adj = jnp.asarray(np.eye(kmax, dtype=bool))

    vlad_fn = jax.jit(lambda d, pm, a, c: segment_vlad(
        d, c, pm, a, num_clusters=NUM_CLUSTERS))
    rows_fn = jax.jit(lambda d, pm, a, c, m0, co, v0: _segment_rows(
        d, pm, a, c, m0, co, v0, NUM_CLUSTERS, True))

    @jax.jit
    def knn_fn(proj, dbx):
        s = jnp.dot(proj, dbx.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        norms = jnp.sum(dbx * dbx, axis=1)
        return jax.lax.top_k(s - 0.5 * norms[None, :], 50)

    @jax.jit
    def dot_fn(proj, dbx):
        """scores WITHOUT norms or top_k — isolates the matmul read."""
        s = jnp.dot(proj, dbx.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(s, axis=1)

    @jax.jit
    def knn_pre_fn(proj, dbx, norms):
        """precomputed-norms variant: saves the per-query 410 MB db
        re-read + reduce (db rows are unit-norm by construction)."""
        s = jnp.dot(proj, dbx.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        return jax.lax.top_k(s - 0.5 * norms[None, :], 50)

    @jax.jit
    def knn_2stage_fn(proj, dbx, norms):
        """precomputed norms + exact two-stage top-k: per-tile top-50
        then top-50 of the tile winners (the global top-50 is a subset
        of the union — exact)."""
        s = jnp.dot(proj, dbx.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        s = s - 0.5 * norms[None, :]
        m = s.shape[0]
        tile = 12_500                     # 100k -> 8 tiles
        st = s.reshape(m, -1, tile)
        v, i = jax.lax.top_k(st, 50)      # [m, T, 50]
        base = (jnp.arange(st.shape[1]) * tile)[None, :, None]
        v2, i2 = jax.lax.top_k(v.reshape(m, -1), 50)
        flat = (i + base).reshape(m, -1)
        return v2, jnp.take_along_axis(flat, i2, axis=1)

    kw = dict(num_clusters=NUM_CLUSTERS, num_ref_images=n_db // 50,
              knn_topk=200, borda_topk=50, top_images=5, whiten=True)

    def full():
        pm2 = pool_masks_to_patch_grid(masks, pool_a, pool_b)
        return query_topk_images(desc, pm2, adj, centers, pmean, comps,
                                 pvar, db, db_ids, **kw)

    # canary: large-matmul MFU (box-weather visibility without SAM)
    n4 = 4096
    a4 = jnp.zeros((n4, n4), jnp.bfloat16)
    mm = jax.jit(lambda x: x @ x)

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        float(jnp.ravel(leaf)[0].astype(jnp.float32))

    def loop(fn, n=24):
        out = retry("warm", fn)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / n

    pm = retry("pool warm", lambda: pool_masks_to_patch_grid(
        masks, pool_a, pool_b))
    sync(pm)
    proj = retry("rows warm", lambda: rows_fn(
        desc, pm, adj, centers, pmean, comps, pvar))[0]
    sync(proj)
    db_norms = jnp.sum(db * db, axis=1)
    sync(db_norms)

    # parity: the two-stage exact top-k must match the one-shot
    v1, i1 = knn_fn(proj, db)
    v2, i2 = knn_2stage_fn(proj, db, db_norms)
    import numpy as _np
    dv = float(_np.abs(_np.asarray(v1) - _np.asarray(v2)).max())
    same = float(_np.mean(_np.asarray(i1) == _np.asarray(i2)))
    print(f"[tail] 2stage parity: val max|d|={dv:.2e} idx match={same:.4f}"
          f" (ties may permute)", flush=True)

    for rnd in range(3):
        t_mm = loop(lambda: mm(a4), n=40)
        mfu = 2 * n4**3 / t_mm / 197e12
        t_pool = loop(lambda: pool_masks_to_patch_grid(masks, pool_a,
                                                       pool_b))
        t_vlad = loop(lambda: vlad_fn(desc, pm, adj, centers))
        t_rows = loop(lambda: rows_fn(desc, pm, adj, centers, pmean,
                                      comps, pvar)[0])
        t_dot = loop(lambda: dot_fn(proj, db))
        t_knn = loop(lambda: knn_fn(proj, db)[0])
        t_kpre = loop(lambda: knn_pre_fn(proj, db, db_norms)[0])
        t_k2 = loop(lambda: knn_2stage_fn(proj, db, db_norms)[0])
        t_full = loop(full)
        print(f"[tail] round{rnd} mm_mfu={mfu:.3f} "
              f"pool={1000*t_pool:.2f} vlad={1000*t_vlad:.2f} "
              f"rows={1000*t_rows:.2f} (pca≈{1000*(t_rows-t_vlad):.2f}) "
              f"dot={1000*t_dot:.2f} knn={1000*t_knn:.2f} "
              f"knn_pre={1000*t_kpre:.2f} knn_2stage={1000*t_k2:.2f} "
              f"full={1000*t_full:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
