"""Maskside decomposition v2: SUB-BATCH standalones (the full-batch
probe OOM'd under co-tenant HBM pressure — keys_syn alone is 786 MB at
b=1024; at b=256 the whole working set is ~0.6 GB) plus a mask-head
block-size A/B (the probs-path A/B found the largest legal block wins;
the keys-mode default is still 2048 → blk 1600, 2 steps/prompt).

Phases (print-early, production-first):
  P1  decode_batch (full production, warm cache) — the anchor
  P2  mask_head b=256, block 2048 (prod) vs 4096 (→ blk 3200, 1 step)
  P3  resize b=256
  P4  stats on synthetic flags (full 3072 masks — tiny uint8)

Scale sub-batch numbers x(bsz/256) for the per-query estimate; grid
work is per-prompt so the scaling is exact up to fixed per-dispatch
cost (~1 ms).
"""
import sys
import time

import numpy as np

from _ab_common import point_grid, retry, sam_setup, sync_tree


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.models.sam import decoder as dec_mod
    from revisit_anything_tpu.models.sam.amg import (AmgConfig,
                                                     _decode_batch,
                                                     resize_mats_and_rows)
    from revisit_anything_tpu.ops.maskhead import fused_mask_head
    from revisit_anything_tpu.ops.maskresize import fused_resize_flags
    from revisit_anything_tpu.utils.packing import maybe_unpack

    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    sub = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    s = sam_setup()
    cfg = s.cfg
    wh, ww, mask_rows = resize_mats_and_rows(cfg, s.input_hw, s.sam_hw,
                                             on_tpu=True)
    content = mask_rows * cfg.grid
    h, w = s.sam_hw
    pts = point_grid(s)[:bsz]
    amg = AmgConfig(points_per_batch=bsz,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)

    dec_mod._FUSED_TAIL = "auto"
    dec_mod._TAIL_KEYS = "on"
    dec_mod._TAIL_LOGITS = "off"

    def loop(fn, n=8):
        out = fn()
        sync_tree(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync_tree(out)
        return (time.perf_counter() - t0) / n

    # ---- P1: production anchor ----
    db = lambda: _decode_batch(s.sam_params, cfg, s.emb, s.image_pe,  # noqa
                               pts, s.input_hw, s.sam_hw, amg)[1]
    retry("compile decode_batch", lambda: sync_tree(db()))
    t_db = min(loop(db) for _ in range(3))
    print(f"[m2] P1 decode_batch={1000*t_db:.2f}ms (bsz={bsz})", flush=True)

    dec = maybe_unpack(s.sam_params)["decoder"]
    up1_w, up1_b = dec["up1_w"], dec["up1_b"]
    ln_s, ln_b = dec["up_ln"]["scale"], dec["up_ln"]["bias"]
    up2_w, up2_b = dec["up2_w"], dec["up2_b"]
    scale = bsz / sub

    # ---- P2: mask head at sub-batch, block A/B ----
    key = jax.random.PRNGKey(0)
    keys_syn = jax.random.normal(key, (sub, content, up1_w.shape[0]),
                                 jnp.bfloat16)
    hyper_syn = jax.random.normal(jax.random.fold_in(key, 1),
                                  (sub, 3, up2_w.shape[1] // 4),
                                  jnp.bfloat16)

    def mh(block):
        return jax.jit(lambda k, hy: fused_mask_head(
            k, hy, up1_w, up1_b, ln_s, ln_b, up2_w, up2_b,
            eps=cfg.eps, content=content, block=block))

    mh2048, mh4096 = mh(2048), mh(4096)
    try:
        retry("compile mh2048",
              lambda: sync_tree(mh2048(keys_syn, hyper_syn)),
              attempts=2, sleep_s=30)
        retry("compile mh4096",
              lambda: sync_tree(mh4096(keys_syn, hyper_syn)),
              attempts=2, sleep_s=30)
        o2 = mh2048(keys_syn, hyper_syn)
        o4 = mh4096(keys_syn, hyper_syn)
        d = float(jnp.max(jnp.abs(o2.astype(jnp.float32)
                                  - o4.astype(jnp.float32))))
        for rnd in range(3):
            t2 = loop(lambda: mh2048(keys_syn, hyper_syn))
            t4 = loop(lambda: mh4096(keys_syn, hyper_syn))
            print(f"[m2] P2 round{rnd} mask_head x{scale:.0f}: "
                  f"blk2048={1000*t2*scale:.2f}ms "
                  f"blk4096={1000*t4*scale:.2f}ms "
                  f"(max|d|={d:.1e})", flush=True)
    except Exception as e:                                   # noqa: BLE001
        print(f"[m2] P2 FAILED: {str(e).splitlines()[0][:120]}", flush=True)

    # ---- P3: resize at sub-batch ----
    blk_syn = jax.random.normal(jax.random.fold_in(key, 2),
                                (sub, content, 16, 3), jnp.bfloat16)
    thr, off = cfg.mask_threshold, amg.stability_score_offset
    resize = jax.jit(lambda x: fused_resize_flags(
        x, wh, ww, thr, off, grid_hw=(mask_rows, cfg.grid)))
    try:
        retry("compile resize", lambda: sync_tree(resize(blk_syn)),
              attempts=2, sleep_s=30)
        t_rs = min(loop(lambda: resize(blk_syn)) for _ in range(3))
        print(f"[m2] P3 resize x{scale:.0f}={1000*t_rs*scale:.2f}ms",
              flush=True)
    except Exception as e:                                   # noqa: BLE001
        print(f"[m2] P3 FAILED: {str(e).splitlines()[0][:120]}", flush=True)

    # ---- P4: XLA stats/boxes tail on full-size synthetic flags ----
    rng = np.random.default_rng(0)
    flags_syn = jnp.asarray(rng.integers(0, 8, (bsz * 3, h, w),
                                         dtype=np.uint8))

    @jax.jit
    def stats(flags):
        hi = jnp.sum(flags >> 2, axis=(1, 2), dtype=jnp.int32
                     ).astype(jnp.float32)
        lo = jnp.sum(flags & 1, axis=(1, 2), dtype=jnp.int32
                     ).astype(jnp.float32)
        stability = hi / jnp.maximum(lo, 1.0)
        masks_bool = (flags & 2).astype(bool)
        rows = jnp.any(masks_bool, axis=2)
        cols = jnp.any(masks_bool, axis=1)
        ridx = jnp.arange(h)
        cidx = jnp.arange(w)
        top = jnp.min(jnp.where(rows, ridx, h), axis=1)
        bottom = jnp.max(jnp.where(rows, ridx, -1), axis=1)
        left = jnp.min(jnp.where(cols, cidx, w), axis=1)
        right = jnp.max(jnp.where(cols, cidx, -1), axis=1)
        empty = ~jnp.any(rows, axis=1)
        boxes = jnp.stack([left, top, right, bottom], axis=1)
        boxes = jnp.where(empty[:, None], 0, boxes).astype(jnp.float32)
        return masks_bool, stability, boxes
    try:
        retry("compile stats", lambda: sync_tree(stats(flags_syn)[1]),
              attempts=2, sleep_s=30)
        t_st = min(loop(lambda: stats(flags_syn)[1]) for _ in range(3))
        print(f"[m2] P4 stats={1000*t_st:.2f}ms", flush=True)
    except Exception as e:                                   # noqa: BLE001
        print(f"[m2] P4 FAILED: {str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
