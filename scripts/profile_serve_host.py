"""Profile the HOST-side phases of SegVLADServer.query through the tunnel.

Where do the per-query milliseconds go when the device stages sum to
~116 ms but query_many measures only ~4.2 q/s (≈238 ms/query)?
Phases timed (single-threaded, so no overlap — upper bounds):
  upload      device_put of the uint8 query image
  amg_disp    dispatch of preprocess+encode+8 decode batches+select
  dino_disp   dispatch of the DINO extract
  sync1       np.asarray(stats) — waits for the AMG chain
  delaunay    host Qhull adjacency
  tail_disp   pool + query_topk_images dispatch
  sync2       np.asarray(top)
Then query_many at several worker counts, interleaved.
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
    from revisit_anything_tpu.pipeline.query import query_topk_images
    from revisit_anything_tpu.pipeline.serve import (
        SegVLADServer, ServingIndex, _dino_desc_device)
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
    print("[prof] warmup...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    server.query(img)
    print(f"[prof] warmup {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    trivial = jax.jit(lambda x: x + 1.0)
    xtriv = jnp.zeros((8, 8))
    float(jnp.ravel(trivial(xtriv))[0])

    def rtt():
        t0 = time.perf_counter()
        float(jnp.ravel(trivial(xtriv))[0])
        return time.perf_counter() - t0

    # --- phase breakdown, single-threaded (5 reps, median) ---
    for rep in range(5):
        ph = {}
        t = time.perf_counter()
        img_dev = jax.device_put(img)
        ph["upload_disp"] = time.perf_counter() - t
        # force the upload to be complete before next phase timing
        t = time.perf_counter()
        float(jnp.ravel(trivial(xtriv))[0])
        ph["upload_sync"] = time.perf_counter() - t
        t = time.perf_counter()
        masks_dev, stats = server._amg_device(img_dev)
        ph["amg_disp"] = time.perf_counter() - t
        t = time.perf_counter()
        desc = _dino_desc_device(dino_params, dn.VIT_G14, img_dev,
                                 31, "value", server._crop)
        ph["dino_disp"] = time.perf_counter() - t
        t = time.perf_counter()
        stats_np = np.asarray(stats)
        ph["sync1"] = time.perf_counter() - t
        t = time.perf_counter()
        adj, _ = server._adjacency(stats_np)
        ph["delaunay"] = time.perf_counter() - t
        t = time.perf_counter()
        pm = server._pool(masks_dev, server._pool_a, server._pool_b)
        top = query_topk_images(
            desc, pm, jnp.asarray(adj), server._centers,
            server._pca_mean, server._pca_comps, server._pca_var,
            server._db, server._db_ids, num_clusters=NUM_CLUSTERS,
            num_ref_images=index.num_ref_images, knn_topk=200,
            borda_topk=50, top_images=5, whiten=True)
        ph["tail_disp"] = time.perf_counter() - t
        t = time.perf_counter()
        np.asarray(top)
        ph["sync2"] = time.perf_counter() - t
        total = sum(ph.values())
        print(f"[prof] rep{rep} total={1000*total:.0f}ms " +
              " ".join(f"{k}={1000*v:.0f}" for k, v in ph.items()),
              flush=True)

    print(f"[prof] rtt={1000*np.median([rtt() for _ in range(7)]):.1f}ms",
          flush=True)

    # --- throughput at several worker counts, interleaved, 2 rounds ---
    n_iters = 16
    imgs = [rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            for _ in range(n_iters)]
    for rnd in range(2):
        for w in (4, 6, 8, 10):
            t0 = time.perf_counter()
            server.query_many(imgs, workers=w)
            qps = n_iters / (time.perf_counter() - t0)
            print(f"[prof] round{rnd} workers={w}: {qps:.2f} q/s",
                  flush=True)
        # canary: encode stage
        from revisit_anything_tpu.models.sam.encoder import encode_image
        from revisit_anything_tpu.pipeline.serve import _sam_preprocess_fused
        img_dev = jax.device_put(img)
        pre = _sam_preprocess_fused(img_dev, server._rh, server._rw,
                                    SAM_VIT_H, SAM_VIT_H.image_size)
        r = rtt()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            e = encode_image(sam_params, SAM_VIT_H, pre)[0]
            float(jnp.ravel(e)[0])
            ts.append(time.perf_counter() - t0)
        print(f"[prof] round{rnd} encode_canary={1000*(np.median(ts)-r):.1f}ms"
              f" rtt={1000*r:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
