"""Interleaved A/B: fused single-dispatch query front vs the old
multi-dispatch chain, at query_many(w=6), plus load canaries.
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
    from revisit_anything_tpu.models.sam.encoder import encode_image
    from revisit_anything_tpu.pipeline.query import query_topk_images
    from revisit_anything_tpu.pipeline.serve import (
        SegVLADServer, ServingIndex, _dino_desc_device,
        _sam_preprocess_fused)
    from revisit_anything_tpu.utils.packing import packed_init

    rng = np.random.default_rng(0)
    ds = get_dataset("17places")
    H, W = ds.size.hw
    sam_hw = ds.sam_size.hw

    sam_params = packed_init(
        lambda k: init_sam_params(SAM_VIT_H, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    dino_params = packed_init(
        lambda k: dn.init_params(dn.VIT_G14, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(1))

    n_db_segs = 100_000

    @jax.jit
    def _device_index(k):
        k1, k2 = jax.random.split(k)
        dbx = jax.random.normal(k1, (n_db_segs, PCA_DIM), jnp.float32)
        dbx = dbx / jnp.linalg.norm(dbx, axis=1, keepdims=True)
        comps = jax.random.normal(
            k2, (PCA_DIM, NUM_CLUSTERS * DINO_G_DIM), jnp.float32) * 0.01
        return dbx, comps

    db_dev, comps_dev = _device_index(jax.random.PRNGKey(7))
    index = ServingIndex(
        centers=rng.standard_normal(
            (NUM_CLUSTERS, DINO_G_DIM)).astype(np.float32),
        pca_mean=np.zeros((NUM_CLUSTERS * DINO_G_DIM,), np.float32),
        pca_components=comps_dev,
        pca_variance=np.ones((PCA_DIM,), np.float32),
        pca_whiten=True, db=db_dev,
        db_image_ids=np.repeat(np.arange(n_db_segs // 50), 50),
        num_ref_images=n_db_segs // 50, order=3)

    amg = AmgConfig(points_per_batch=128,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    server = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_VIT_H,
        dino_params=dino_params, dino_cfg=dn.VIT_G14, index=index,
        full_hw=(H, W), sam_hw=sam_hw, amg=amg, mesh=None)

    img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    print("[ab] warmup fused...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    out_fused = server.query(img)
    print(f"[ab] fused warmup {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    # old-style query (the round-2 path) for the B arm
    def query_old(img_uint8):
        img_dev = jax.device_put(img_uint8)
        masks_dev, stats = server._amg_device(img_dev)
        desc = _dino_desc_device(dino_params, dn.VIT_G14, img_dev,
                                 31, "value", server._crop)
        stats_np = np.asarray(stats)
        adj, _ = server._adjacency(stats_np)
        pm = server._pool(masks_dev, server._pool_a, server._pool_b)
        top = query_topk_images(
            desc, pm, jnp.asarray(adj), server._centers, server._pca_mean,
            server._pca_comps, server._pca_var, server._db, server._db_ids,
            num_clusters=NUM_CLUSTERS,
            num_ref_images=index.num_ref_images, knn_topk=200,
            borda_topk=50, top_images=5, whiten=True)
        return np.asarray(top)

    t0 = time.perf_counter()
    out_old = query_old(img)
    print(f"[ab] old warmup {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    print(f"[ab] outputs match: {np.array_equal(out_fused, out_old)} "
          f"fused={out_fused} old={out_old}", flush=True)

    trivial = jax.jit(lambda x: x + 1.0)
    xtriv = jnp.zeros((8, 8))
    float(jnp.ravel(trivial(xtriv))[0])

    def rtt():
        t0 = time.perf_counter()
        float(jnp.ravel(trivial(xtriv))[0])
        return time.perf_counter() - t0

    n_iters = 16
    imgs = [rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            for _ in range(n_iters)]

    from concurrent.futures import ThreadPoolExecutor

    def many_old(w=6):
        with ThreadPoolExecutor(max_workers=w) as pool:
            return list(pool.map(query_old, imgs))

    img_dev0 = jax.device_put(img)
    pre = _sam_preprocess_fused(img_dev0, server._rh, server._rw,
                                SAM_VIT_H, SAM_VIT_H.image_size)

    for rnd in range(3):
        r = float(np.median([rtt() for _ in range(5)]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            e = encode_image(sam_params, SAM_VIT_H, pre)[0]
            float(jnp.ravel(e)[0])
            ts.append(time.perf_counter() - t0)
        enc = float(np.median(ts)) - r
        # fused single-query latency
        lat = []
        for im in imgs[:4]:
            t0 = time.perf_counter()
            server.query(im)
            lat.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        server.query_many(imgs, workers=6)
        qps_f = n_iters / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        many_old(6)
        qps_o = n_iters / (time.perf_counter() - t0)
        print(f"[ab] round{rnd} enc={1000*enc:.1f}ms rtt={1000*r:.1f}ms "
              f"fused={qps_f:.2f} q/s old={qps_o:.2f} q/s "
              f"fused_p50={1000*sorted(lat)[len(lat)//2]:.0f}ms",
              flush=True)


if __name__ == "__main__":
    main()
