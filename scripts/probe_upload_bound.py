"""Isolate the serving throughput cap: upload bandwidth vs device compute.

U: 16 x device_put of distinct query images + one sync -> MB/s and
   ms/query of pure upload.
D: the full fused front+tail chain over ONE device-resident image
   (no per-query uploads, fixed adjacency) -> pure device+dispatch q/s.
A: same chain but with 16 distinct uploaded images (the real serving
   transfer pattern).
Interleaved x3.
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
    from revisit_anything_tpu.pipeline.serve import (SegVLADServer,
                                                     ServingIndex)
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
    print("[upl] warmup...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    server.query(img)
    print(f"[upl] warmup {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    trivial = jax.jit(lambda x: x + 1.0)
    xtriv = jnp.zeros((8, 8))
    float(jnp.ravel(trivial(xtriv))[0])

    n_iters = 16
    imgs = [rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            for _ in range(n_iters)]
    adj_fix = np.zeros((server.kmax, server.kmax), dtype=bool)
    np.fill_diagonal(adj_fix, True)
    adj_dev = jnp.asarray(adj_fix)
    mb = H * W * 3 / 1e6

    def chain(img_dev):
        pm, stats, desc = server._front(img_dev)
        return query_topk_images(
            desc, pm, adj_dev, server._centers, server._pca_mean,
            server._pca_comps, server._pca_var, server._db, server._db_ids,
            num_clusters=NUM_CLUSTERS,
            num_ref_images=index.num_ref_images, knn_topk=200,
            borda_topk=50, top_images=5, whiten=True)

    np.asarray(chain(jax.device_put(img)))
    img_dev0 = jax.device_put(img)

    for rnd in range(3):
        # U: pure upload
        t0 = time.perf_counter()
        devs = [jax.device_put(im) for im in imgs]
        float(jnp.ravel(trivial(xtriv))[0])
        dt = time.perf_counter() - t0
        print(f"[upl] round{rnd} U(upload): {n_iters*mb/dt:.1f} MB/s "
              f"({1000*dt/n_iters:.0f} ms/q)", flush=True)

        # D: chain over ONE resident image (no uploads)
        t0 = time.perf_counter()
        tops = [chain(img_dev0) for _ in range(n_iters)]
        np.asarray(tops[-1])
        dt = time.perf_counter() - t0
        print(f"[upl] round{rnd} D(no-upload chain): {n_iters/dt:.2f} q/s "
              f"({1000*dt/n_iters:.0f} ms/q)", flush=True)

        # A: chain over the 16 uploaded images
        t0 = time.perf_counter()
        tops = [chain(d) for d in devs]
        np.asarray(tops[-1])
        dt = time.perf_counter() - t0
        print(f"[upl] round{rnd} A(upload+chain): {n_iters/dt:.2f} q/s "
              f"({1000*dt/n_iters:.0f} ms/q)", flush=True)


if __name__ == "__main__":
    main()
