"""Decompose the decode batch's MASK-HEAD SIDE at the production config
(1024 prompts, keys-emission tail, 17places 240x320, content=3200).

The r5 breakdown pinned two_way at ~36% of decode_batch and "mask head +
resize + stats + glue" at ~63%, but the sub-split was lost to a tunnel
compile drop. This probe times each component STANDALONE with synthetic
operands (no cross-phase dependencies, print-early, smallest compiles
first after the production baseline):

  P1  decode_batch      full production stage (warm cache)
  P2  mask_head         fused_mask_head alone, b=1024, synthetic keys
  P3  resize            fused_resize_flags alone, b=1024
  P4  stats             the XLA stability/boxes tail on synthetic flags
  P5  two_way           keys-emission transformer (for the identity)

Identity check: P1 =~ P5 + P2 + P3 + P4 + glue (hyper MLPs, iou head,
XLA scheduling). The biggest standalone number is the next lever.

Working set ~4 GB incl. packed SAM params — run ALONE (CLAUDE.md HBM
sharing + reclamation-lag gotchas).
"""
import sys
import time

import numpy as np

from _ab_common import point_grid, prompt_tokens, retry, sam_setup, \
    sync_tree


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.models.sam import decoder as dec_mod
    from revisit_anything_tpu.models.sam.amg import (AmgConfig,
                                                     _decode_batch,
                                                     resize_mats_and_rows)
    from revisit_anything_tpu.models.sam.decoder import _run_two_way_probs
    from revisit_anything_tpu.ops.maskhead import fused_mask_head
    from revisit_anything_tpu.ops.maskresize import fused_resize_flags

    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

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

    # ---- P1: production baseline (warm cache) ----
    db = lambda: _decode_batch(s.sam_params, cfg, s.emb, s.image_pe,  # noqa
                               pts, s.input_hw, s.sam_hw, amg)[1]
    retry("compile decode_batch", lambda: sync_tree(db()))
    t_db = min(loop(db) for _ in range(3))
    print(f"[ms] P1 decode_batch={1000*t_db:.2f}ms (bsz={bsz})", flush=True)

    dec, tokens, shared_src, src_pe_one = prompt_tokens(s, pts)
    up1_w, up1_b = dec["up1_w"], dec["up1_b"]
    ln_s, ln_b = dec["up_ln"]["scale"], dec["up_ln"]["bias"]
    up2_w, up2_b = dec["up2_w"], dec["up2_b"]

    # ---- P2: standalone mask head at FULL batch, synthetic keys ----
    key = jax.random.PRNGKey(0)
    keys_syn = jax.random.normal(key, (bsz, content, up1_w.shape[0]),
                                 jnp.bfloat16)
    hyper_syn = jax.random.normal(jax.random.fold_in(key, 1),
                                  (bsz, 3, up2_w.shape[1] // 4),
                                  jnp.bfloat16)
    mask_head = jax.jit(lambda k, hy: fused_mask_head(
        k, hy, up1_w, up1_b, ln_s, ln_b, up2_w, up2_b,
        eps=cfg.eps, content=content))
    try:
        retry("compile mask_head",
              lambda: sync_tree(mask_head(keys_syn, hyper_syn)),
              attempts=3, sleep_s=45)
        t_mh = min(loop(lambda: mask_head(keys_syn, hyper_syn))
                   for _ in range(3))
        print(f"[ms] P2 mask_head={1000*t_mh:.2f}ms", flush=True)
    except Exception as e:                                   # noqa: BLE001
        t_mh = float("nan")
        print(f"[ms] P2 mask_head FAILED: {str(e).splitlines()[0][:120]}",
              flush=True)

    # ---- P3: standalone resize at FULL batch ----
    blk_syn = jax.random.normal(jax.random.fold_in(key, 2),
                                (bsz, content, 16, 3), jnp.bfloat16)
    thr, off = cfg.mask_threshold, amg.stability_score_offset
    resize = jax.jit(lambda x: fused_resize_flags(
        x, wh, ww, thr, off, grid_hw=(mask_rows, cfg.grid)))
    try:
        retry("compile resize", lambda: sync_tree(resize(blk_syn)),
              attempts=3, sleep_s=45)
        t_rs = min(loop(lambda: resize(blk_syn)) for _ in range(3))
        print(f"[ms] P3 resize={1000*t_rs:.2f}ms", flush=True)
    except Exception as e:                                   # noqa: BLE001
        t_rs = float("nan")
        print(f"[ms] P3 resize FAILED: {str(e).splitlines()[0][:120]}",
              flush=True)

    # ---- P4: the XLA stats/boxes tail on synthetic flags ----
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
              attempts=3, sleep_s=45)
        t_st = min(loop(lambda: stats(flags_syn)[1]) for _ in range(3))
        print(f"[ms] P4 stats={1000*t_st:.2f}ms", flush=True)
    except Exception as e:                                   # noqa: BLE001
        t_st = float("nan")
        print(f"[ms] P4 stats FAILED: {str(e).splitlines()[0][:120]}",
              flush=True)

    # ---- P5: two_way (keys emission), output sliced tiny ----
    @jax.jit
    def two_way(tk, ss, pe):
        q, _, k2 = _run_two_way_probs(dec, tk, ss, pe, cfg)
        return q, k2[:1, :1]
    try:
        retry("compile two_way",
              lambda: sync_tree(two_way(tokens, shared_src,
                                        src_pe_one)[0]),
              attempts=3, sleep_s=45)
        t_tw = min(loop(lambda: two_way(tokens, shared_src,
                                        src_pe_one)[0])
                   for _ in range(3))
        print(f"[ms] P5 two_way={1000*t_tw:.2f}ms", flush=True)
    except Exception as e:                                   # noqa: BLE001
        t_tw = float("nan")
        print(f"[ms] P5 two_way FAILED: {str(e).splitlines()[0][:120]}",
              flush=True)

    parts = t_tw + t_mh + t_rs + t_st
    print(f"[ms] identity decode_batch={1000*t_db:.2f} vs "
          f"tw+mh+rs+st={1000*parts:.2f} "
          f"(glue+sched={1000*(t_db - parts):.2f}ms)", flush=True)


if __name__ == "__main__":
    main()
