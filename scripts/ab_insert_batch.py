"""Interleaved A/B: batched serving inserts (ONE db copy per chunk,
_compact_insert_many) vs per-image inserts (_db_insert), at serving scale
(100k x 1024 f32 database).

Two measurements:
  1. insert-tail isolation: rows already prepared, time ONLY the
     device-side insert path (copy count is the whole difference);
  2. end-to-end add_reference_images wall clock (front-dominated — the
     per-image AMG+DINO+VLAD compute is ~200 ms; reported for honesty).
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.config import (DINO_G_DIM, NUM_CLUSTERS,
                                             PCA_DIM, get_dataset)
    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.models.sam import SAM_VIT_H, init_sam_params
    from revisit_anything_tpu.models.sam.amg import AmgConfig
    from revisit_anything_tpu.pipeline.serve import (SegVLADServer,
                                                     ServingIndex,
                                                     _compact_insert_many,
                                                     _db_insert)
    from revisit_anything_tpu.utils.packing import packed_init

    rng = np.random.default_rng(0)
    ds = get_dataset("17places")
    H, W = ds.size.hw
    sam_hw = ds.sam_size.hw

    n_db = 100_000
    cap = n_db + 20_000

    @jax.jit
    def _device_index(k):
        k1, k2 = jax.random.split(k)
        dbx = jax.random.normal(k1, (n_db, PCA_DIM), jnp.float32)
        dbx = dbx / jnp.linalg.norm(dbx, axis=1, keepdims=True)
        comps = jax.random.normal(
            k2, (PCA_DIM, NUM_CLUSTERS * DINO_G_DIM), jnp.float32) * 0.01
        return dbx, comps

    db_dev, comps_dev = _device_index(jax.random.PRNGKey(7))

    # ---- 1. insert-tail isolation (synthetic rows, real shapes) ----
    kmax = 128
    cap_db = jnp.pad(db_dev, ((0, cap - n_db), (0, 0)),
                     constant_values=1e6)
    cap_ids = jnp.pad(jnp.asarray(
        np.repeat(np.arange(n_db // 50), 50).astype(np.int32)),
        (0, cap - n_db))
    bsz = 16
    rows_b = jnp.asarray(
        rng.standard_normal((bsz, kmax, PCA_DIM)).astype(np.float32))
    kept = jnp.asarray(
        rng.integers(20, kmax, size=bsz).astype(np.int32))
    ids_b = jnp.asarray(np.arange(bsz, dtype=np.int32) + 2000)

    def per_image():
        db, ids = cap_db, cap_ids
        cur = np.int32(n_db)
        for i in range(bsz):
            db, ids = _db_insert(db, ids, rows_b[i], cur,
                                 np.int32(2000 + i))
            cur = cur + kept[i].astype(np.int32)
        return db

    def batched():
        db, ids = _compact_insert_many(cap_db, cap_ids, rows_b, kept,
                                       ids_b, np.int32(n_db))
        return db

    def sync(x):
        float(jnp.ravel(x)[0])

    def loop(fn, n=8):
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / n

    for rnd in range(4):
        tp = loop(per_image)
        tb = loop(batched)
        print(f"[ins] round{rnd} tail-only per-image={1000*tp:.2f}ms "
              f"batched={1000*tb:.2f}ms ({tp/tb:.2f}x) for {bsz} images "
              f"(db {cap}x{PCA_DIM})", flush=True)

    # ---- 2. end-to-end add_reference_images (front-dominated) ----
    sam_params = packed_init(
        lambda k: init_sam_params(SAM_VIT_H, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    dino_params = packed_init(
        lambda k: dn.init_params(dn.VIT_G14, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(1))
    index = ServingIndex(
        centers=rng.standard_normal(
            (NUM_CLUSTERS, DINO_G_DIM)).astype(np.float32),
        pca_mean=np.zeros((NUM_CLUSTERS * DINO_G_DIM,), np.float32),
        pca_components=comps_dev,
        pca_variance=np.ones((PCA_DIM,), np.float32),
        pca_whiten=True, db=db_dev,
        db_image_ids=np.repeat(np.arange(n_db // 50), 50),
        num_ref_images=n_db // 50 + 4000, order=3)
    amg = AmgConfig(points_per_batch=128,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)

    imgs = [rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            for _ in range(8)]

    def build(chunk):
        return SegVLADServer(
            sam_params=sam_params, sam_cfg=SAM_VIT_H,
            dino_params=dino_params, dino_cfg=dn.VIT_G14, index=index,
            full_hw=(H, W), sam_hw=sam_hw, amg=amg, mesh=None,
            db_capacity=cap, insert_chunk=chunk)

    servers = {1: build(1), 8: build(8)}
    for srv in servers.values():
        srv.add_reference_images(imgs[:1])          # warm compiles
    # INTERLEAVED rounds (the box fluctuates ~1.9x under co-tenant load;
    # back-to-back single runs confound chunking with weather)
    for rnd in range(3):
        for chunk, srv in servers.items():
            t0 = time.perf_counter()
            srv.add_reference_images(imgs)
            dt = time.perf_counter() - t0
            print(f"[ins] e2e round{rnd} chunk={chunk}: "
                  f"{len(imgs)/dt:.2f} inserts/s "
                  f"({1000*dt/len(imgs):.1f} ms/img)", flush=True)


if __name__ == "__main__":
    main()
