"""Steady-state per-stage device times via async loops (N back-to-back
dispatches, ONE final sync) — immune to the per-sync RTT noise that
corrupted sync-minus-rtt stage readings (a 12 ms rtt estimate error
times 8 decode batches mis-read decode by ~95 ms)."""
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
    from revisit_anything_tpu.models.sam.amg import AmgConfig, _decode_batch
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
    print("[st] warmup...", file=sys.stderr, flush=True)
    server.query(img)

    img_dev = jax.device_put(img)
    pre = _sam_preprocess_fused(img_dev, server._rh, server._rw,
                                SAM_VIT_H, SAM_VIT_H.image_size)
    emb = encode_image(sam_params, SAM_VIT_H, pre)[0]
    pts0 = server._pts_dev[:server._bsz]
    n_b = server._pts_dev.shape[0] // server._bsz
    masks_dev, stats = server._amg_device(img_dev)
    adj = np.eye(server.kmax, dtype=bool)
    adj_dev = jnp.asarray(adj)
    desc = _dino_desc_device(dino_params, dn.VIT_G14, img_dev, 31, "value",
                             server._crop)
    pm = server._pool(masks_dev, server._pool_a, server._pool_b)
    float(jnp.ravel(desc)[0])

    def sync(x):
        float(jnp.ravel(x)[0]) if hasattr(x, "ravel") else None

    def loop(fn, n=12):
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / n

    def tail():
        p2 = server._pool(masks_dev, server._pool_a, server._pool_b)
        return query_topk_images(
            desc, p2, adj_dev, server._centers, server._pca_mean,
            server._pca_comps, server._pca_var, server._db, server._db_ids,
            num_clusters=NUM_CLUSTERS,
            num_ref_images=index.num_ref_images, knn_topk=200,
            borda_topk=50, top_images=5, whiten=True)

    for rnd in range(3):
        enc = loop(lambda: encode_image(sam_params, SAM_VIT_H, pre)[0])
        dec1 = loop(lambda: _decode_batch(
            sam_params, SAM_VIT_H, emb, server._image_pe, pts0,
            server.input_hw, sam_hw, amg)[1])
        dino = loop(lambda: _dino_desc_device(
            dino_params, dn.VIT_G14, img_dev, 31, "value", server._crop))
        frt = loop(lambda: server._front(img_dev)[1], n=6)
        tl = loop(tail)
        print(f"[st] round{rnd} enc={1000*enc:.1f} "
              f"dec8={1000*dec1*n_b:.1f} dino={1000*dino:.1f} "
              f"front={1000*frt:.1f} tail={1000*tl:.1f} "
              f"sum(front+tail)={1000*(frt+tl):.1f}ms", flush=True)


if __name__ == "__main__":
    main()
