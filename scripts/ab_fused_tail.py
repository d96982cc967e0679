"""Interleaved A/B: fused decode tail (ops/decode_fused.py) vs the r3
split per-consumer kernels, at production shapes on real TPU.

_FUSED_TAIL is a trace-time flag and decode_masks/_decode_batch are
module-jitted, so each variant is traced into its OWN jit wrapper with
the inner caches cleared first; after tracing, the flag is irrelevant and
the two executables are timed interleaved (async loops, one sync),
BASELINE.md methodology.
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.config import get_dataset
    from revisit_anything_tpu.models.sam import SAM_VIT_H, init_sam_params
    from revisit_anything_tpu.models.sam import decoder as dec_mod
    from revisit_anything_tpu.models.sam.amg import (AmgConfig,
                                                     _decode_batch,
                                                     build_point_grid,
                                                     resize_longest_side)
    from revisit_anything_tpu.models.sam.decoder import decode_masks
    from revisit_anything_tpu.models.sam.encoder import encode_image
    from revisit_anything_tpu.models.sam.prompt import (
        dense_positional_embedding)
    from revisit_anything_tpu.ops.resize import bilinear_weight_matrix
    from revisit_anything_tpu.pipeline.serve import _sam_preprocess_fused
    from revisit_anything_tpu.utils.packing import packed_init

    rng = np.random.default_rng(0)
    ds = get_dataset("17places")
    H, W = ds.size.hw
    sam_hw = ds.sam_size.hw
    cfg = SAM_VIT_H

    sam_params = packed_init(
        lambda k: init_sam_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))

    input_hw = resize_longest_side(sam_hw[0], sam_hw[1], cfg.image_size)
    img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    img_dev = jax.device_put(img)
    down_h = bilinear_weight_matrix(sam_hw[0], H)
    down_w = bilinear_weight_matrix(sam_hw[1], W)
    up_h = bilinear_weight_matrix(input_hw[0], sam_hw[0])
    up_w = bilinear_weight_matrix(input_hw[1], sam_hw[1])
    rh = jnp.asarray(up_h @ down_h)
    rw = jnp.asarray(up_w @ down_w)
    pre = _sam_preprocess_fused(img_dev, rh, rw, cfg, cfg.image_size)
    emb = encode_image(sam_params, cfg, pre)[0]
    image_pe = dense_positional_embedding(sam_params, cfg)[0]

    grid = build_point_grid(32)
    pts_orig = grid * np.array([sam_hw[1], sam_hw[0]], np.float32)
    scale = np.array([input_hw[1] / sam_hw[1], input_hw[0] / sam_hw[0]],
                     np.float32)
    pts = jnp.asarray((pts_orig * scale).astype(np.float32)[:128])
    amg = AmgConfig(points_per_batch=128,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)

    def make_variant(flag):
        dec_mod._FUSED_TAIL = flag
        decode_masks.clear_cache()
        _decode_batch.clear_cache()
        fn = jax.jit(lambda e, pe, p: _decode_batch(
            sam_params, cfg, e, pe, p, input_hw, sam_hw, amg))
        out = fn(emb, image_pe, pts)           # trace + compile NOW
        jax.block_until_ready(out)
        float(jnp.ravel(out[1])[0])
        return fn, out

    print("[ab] tracing split...", file=sys.stderr, flush=True)
    f_split, o_split = make_variant("off")
    print("[ab] tracing fused...", file=sys.stderr, flush=True)
    f_fused, o_fused = make_variant("auto")
    dec_mod._FUSED_TAIL = "auto"

    # ---- parity ----
    m_s, iou_s = np.asarray(o_split[0]), np.asarray(o_split[1], np.float32)
    m_f, iou_f = np.asarray(o_fused[0]), np.asarray(o_fused[1], np.float32)
    mism = int((m_s != m_f).sum())
    diou = float(np.abs(iou_s - iou_f).max())
    dstab = float(np.abs(np.asarray(o_split[2], np.float32)
                         - np.asarray(o_fused[2], np.float32)).max())
    print(f"[ab] parity: mask-bit mismatches {mism}/{m_s.size} "
          f"({100*mism/m_s.size:.4f}%), max|d iou|={diou:.2e}, "
          f"max|d stab|={dstab:.2e}", flush=True)

    def sync(x):
        float(jnp.ravel(x)[0])

    def loop(fn, n=10):
        out = fn(emb, image_pe, pts)[1]
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(emb, image_pe, pts)[1]
        sync(out)
        return (time.perf_counter() - t0) / n

    for rnd in range(4):
        ts = loop(f_split)
        tf = loop(f_fused)
        print(f"[ab] round{rnd} split={1000*ts:.2f}ms "
              f"fused={1000*tf:.2f}ms ({ts/tf:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
