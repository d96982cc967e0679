"""Is query_many device-bound or orchestration-bound?

A: back-to-back async dispatch of the full per-query device chain from
   ONE thread, fixed adjacency, no per-query syncs (only a final one).
   This measures device + dispatch + intermediate-buffer overhead
   without GIL/thread/sync effects.
B: the stage-sum (encode + decode*8 + dino + tail) in the SAME window.
C: query_many (the production path) in the SAME window.
Interleaved A/C rounds bracket B so load changes are visible.
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
    print("[probe] warmup...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    server.query(img)
    print(f"[probe] warmup {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

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
    adj_fix = np.zeros((server.kmax, server.kmax), dtype=bool)
    np.fill_diagonal(adj_fix, True)
    adj_dev = jnp.asarray(adj_fix)

    def chain(img_dev):
        masks_dev, stats = server._amg_device(img_dev)
        desc = _dino_desc_device(dino_params, dn.VIT_G14, img_dev,
                                 31, "value", server._crop)
        pm = server._pool(masks_dev, server._pool_a, server._pool_b)
        return query_topk_images(
            desc, pm, adj_dev, server._centers, server._pca_mean,
            server._pca_comps, server._pca_var, server._db, server._db_ids,
            num_clusters=NUM_CLUSTERS,
            num_ref_images=index.num_ref_images, knn_topk=200,
            borda_topk=50, top_images=5, whiten=True)

    # warm the fixed-adj tail compile
    np.asarray(chain(jax.device_put(img)))

    # stage timing helper (window-local device speed)
    img_dev0 = jax.device_put(img)
    pre = _sam_preprocess_fused(img_dev0, server._rh, server._rw,
                                SAM_VIT_H, SAM_VIT_H.image_size)
    emb = encode_image(sam_params, SAM_VIT_H, pre)[0]
    pts0 = server._pts_dev[:server._bsz]
    n_batches = server._pts_dev.shape[0] // server._bsz

    def stage_sum():
        r = float(np.median([rtt() for _ in range(5)]))

        def timed(fn, n=3):
            fn()
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                out = fn()
                float(jnp.ravel(out)[0])
                ts.append(time.perf_counter() - t0)
            return max(float(np.median(ts)) - r, 0.0)

        enc = timed(lambda: encode_image(sam_params, SAM_VIT_H, pre)[0])
        dec = timed(lambda: _decode_batch(
            sam_params, SAM_VIT_H, emb, server._image_pe, pts0,
            server.input_hw, sam_hw, amg)[1]) * n_batches
        dino = timed(lambda: _dino_desc_device(
            dino_params, dn.VIT_G14, img_dev0, 31, "value", server._crop))
        return enc, dec, dino, r

    for rnd in range(3):
        enc, dec, dino, r = stage_sum()
        print(f"[probe] round{rnd} stages: enc={1000*enc:.1f} "
              f"dec={1000*dec:.1f} dino={1000*dino:.1f} "
              f"sum={1000*(enc+dec+dino):.1f}ms rtt={1000*r:.1f}ms",
              flush=True)

        # A: single-thread async chain, no per-query syncs
        devs = [jax.device_put(im) for im in imgs]
        float(jnp.ravel(trivial(xtriv))[0])   # flush uploads
        t0 = time.perf_counter()
        tops = [chain(d) for d in devs]
        np.asarray(tops[-1])
        dt = time.perf_counter() - t0
        print(f"[probe] round{rnd} A(async-chain): {n_iters/dt:.2f} q/s "
              f"({1000*dt/n_iters:.0f} ms/q)", flush=True)

        # C: production query_many
        t0 = time.perf_counter()
        server.query_many(imgs, workers=6)
        dt = time.perf_counter() - t0
        print(f"[probe] round{rnd} C(query_many w=6): {n_iters/dt:.2f} q/s "
              f"({1000*dt/n_iters:.0f} ms/q)", flush=True)


if __name__ == "__main__":
    main()
