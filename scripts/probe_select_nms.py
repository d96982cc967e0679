"""Steady-state cost of _select_masks_centroids (incl. the sequential
3072-step greedy-NMS fori_loop) and of nms_keep_mask alone."""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.config import get_dataset
    from revisit_anything_tpu.models.sam.amg import AmgConfig
    from revisit_anything_tpu.ops.nms import nms_keep_mask

    rng = np.random.default_rng(0)
    ds = get_dataset("17places")
    sam_hw = ds.sam_size.hw
    n = 3072
    kmax = 128

    from revisit_anything_tpu.pipeline.serve import _select_masks_centroids
    amg = AmgConfig(points_per_batch=128,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)

    # synthetic candidates on device
    masks = jnp.asarray(rng.random((n, sam_hw[0], sam_hw[1])) < 0.2)
    iou = jnp.asarray(rng.random(n).astype(np.float32))
    stab = jnp.asarray(rng.random(n).astype(np.float32))
    wh = rng.integers(5, 60, (n, 2)).astype(np.float32)
    xy = rng.integers(0, 250, (n, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], axis=1))
    valid = jnp.asarray(np.ones(n, bool))
    scores = iou

    def sync(x):
        float(jnp.ravel(x)[0])

    def loop(fn, n_it=10):
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n_it):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / n_it

    for rnd in range(3):
        t_nms = loop(lambda: nms_keep_mask(boxes, scores, 0.7))
        t_sel = loop(lambda: _select_masks_centroids(
            masks, iou, stab, boxes, valid, amg, kmax)[1])
        print(f"[sel] round{rnd} nms={1000*t_nms:.2f}ms "
              f"select_total={1000*t_sel:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
