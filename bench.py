"""End-to-end SegVLAD query throughput benchmark (one TPU chip).

Measures the full per-query compute path of the production pipeline at the
17places configuration (480x640, SAM at half res — BASELINE.md):
  SAM ViT-H automatic mask generation (32x32 grid, multimask)
  + DINOv2 ViT-g/14 layer-31 value dense features
  + order-3 SuperSegment VLAD aggregation (49152-d)
  + PCA projection to 1024-d
  + top-200 kNN against a 100k-segment database
  + weighted-Borda voting
with random weights (checkpoints are not downloadable here; FLOPs and
memory traffic are identical to real weights).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
We use 0.45 queries/s as the baseline estimate for the same path on the
reference's single-GPU stack (SAM ViT-H AMG dominating at ~2s/image on a
V100-class card, per widely reported SAM timings), so vs_baseline is
value / 0.45.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_QPS = 0.45


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.config import (DINO_G_DIM, NUM_CLUSTERS,
                                             PCA_DIM, get_dataset)
    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.models.sam import (SAM_VIT_H, init_sam_params)
    from revisit_anything_tpu.models.sam.amg import AmgConfig, generate_masks
    from revisit_anything_tpu.ops import (knn_l2, l2_normalize,
                                          mask_pool_matrices)
    from revisit_anything_tpu.ops.pca import PCAParams, pca_apply
    from revisit_anything_tpu.pipeline.aggregate import image_segment_vlad
    from revisit_anything_tpu.retrieval.matching import weighted_borda_predict

    rng = np.random.default_rng(0)
    ds = get_dataset("17places")
    H, W = ds.size.hw                       # 480, 640 (DINO res)
    sam_hw = ds.sam_size.hw                 # 240, 320
    dh, dw = ds.size.patch_grid

    print("[bench] init models...", file=sys.stderr, flush=True)
    sam_params = init_sam_params(SAM_VIT_H, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    dino_cfg = dn.VIT_G14
    dino_params = dn.init_params(dino_cfg, jax.random.PRNGKey(1),
                                 dtype=jnp.bfloat16)

    centers = rng.standard_normal((NUM_CLUSTERS, DINO_G_DIM)).astype(
        np.float32)
    pool_a, pool_b = mask_pool_matrices(sam_hw, (H, W))
    pca = PCAParams(
        mean=jnp.zeros((NUM_CLUSTERS * DINO_G_DIM,), jnp.float32),
        components=jnp.asarray(rng.standard_normal(
            (PCA_DIM, NUM_CLUSTERS * DINO_G_DIM)).astype(np.float32) * 0.01),
        explained_variance=jnp.ones((PCA_DIM,), jnp.float32),
        whiten=True)

    n_db_segs = 100_000
    db = rng.standard_normal((n_db_segs, PCA_DIM)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    db_dev = jnp.asarray(db)
    db_img_ids = jnp.asarray(np.repeat(np.arange(n_db_segs // 50), 50))

    amg = AmgConfig(points_per_batch=256,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)

    from revisit_anything_tpu.models.sam.amg import _pack_bits  # noqa
    from revisit_anything_tpu.ops.adjacency import delaunay_adjacency
    from revisit_anything_tpu.ops.masks import (mask_centroids,
                                                pool_masks_to_patch_grid)
    from revisit_anything_tpu.pipeline.aggregate import _bucket
    from revisit_anything_tpu.pipeline.query import (pca_tuple,
                                                     query_topk_images)

    pca_args = pca_tuple(pca)
    pool_a_dev = jnp.asarray(pool_a)
    pool_b_dev = jnp.asarray(pool_b)

    def one_query(img_uint8):
        # SAM masks at half resolution (place_rec_SAM_DINO.py:51-63)
        import cv2
        sam_img = cv2.resize(img_uint8, (sam_hw[1], sam_hw[0]),
                             interpolation=cv2.INTER_LINEAR)
        records = generate_masks(sam_params, SAM_VIT_H, sam_img, amg)
        masks = (np.stack([r.segmentation for r in records])
                 if records else np.zeros((1,) + sam_hw, bool))

        # DINOv2 dense features at full resolution (stay on device — the
        # 9.4 MB readback would dominate through the tunnel)
        x = dn.preprocess(img_uint8[None])
        feats = dn.extract_dense(dino_params, dino_cfg,
                                 jnp.asarray(x, jnp.bfloat16), 31, "value")
        desc = l2_normalize(feats[0].astype(jnp.float32), axis=1)  # [P, D]

        # host: pad masks to a bucket + Delaunay adjacency (Qhull)
        m = len(masks)
        mb = _bucket(m)
        padded = np.zeros((mb,) + masks.shape[1:], bool)
        padded[:m] = masks
        adj = np.zeros((mb, mb), bool)
        adj[:m, :m] = delaunay_adjacency(mask_centroids(masks), 3)

        # fused device pipeline: pool → VLAD → PCA → kNN → Borda,
        # ONE dispatch + one tiny readback
        patch_masks = pool_masks_to_patch_grid(
            jnp.asarray(padded), pool_a_dev, pool_b_dev)
        preds = query_topk_images(
            desc, patch_masks, jnp.asarray(adj), jnp.asarray(centers),
            *pca_args[:3], db_dev, db_img_ids,
            num_clusters=NUM_CLUSTERS, num_ref_images=n_db_segs // 50,
            knn_topk=200, borda_topk=50, top_images=5,
            whiten=pca_args[3])
        return np.asarray(preds), len(records)

    img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    print("[bench] warmup (compiles)...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    preds, n_masks = one_query(img)
    print(f"[bench] warmup done in {time.perf_counter() - t0:.1f}s, "
          f"{n_masks} masks", file=sys.stderr, flush=True)

    # Throughput: two in-flight queries — host phases (image decode, PIL,
    # record assembly, adjacency) of one query overlap device compute of
    # the other. Device work still serializes on the single chip.
    from concurrent.futures import ThreadPoolExecutor
    n_iters = 8
    imgs = [rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            for _ in range(n_iters)]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=2) as pool:
        list(pool.map(one_query, imgs))
    dt = time.perf_counter() - t0
    qps = n_iters / dt

    print(json.dumps({
        "metric": "segvlad_e2e_query_throughput",
        "value": round(qps, 4),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
