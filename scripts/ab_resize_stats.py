"""Resize stats-emission A/B: [kernel + XLA flag-image stats] vs
[kernel(emit_stats) + tiny per-axis reductions].

The AMG stats pass re-reads the whole [B·3, H, W] uint8 flag image
(236 MB/query; probe_maskside2 P4 ≈ 4 ms loaded). emit_stats accumulates
the per-axis reductions in-kernel while the logits are live. Parity is
integer-exact by construction (tests/test_maskresize.py pins it);
this script measures the wall win and confirms Mosaic lowering at
production shapes. Sub-batch methodology (b=256, x4).
"""
import sys
import time

from _ab_common import retry, sam_setup, sync_tree


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.models.sam.amg import resize_mats_and_rows
    from revisit_anything_tpu.ops.maskresize import fused_resize_flags

    sub = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    scale = 1024 / sub

    s = sam_setup()
    cfg = s.cfg
    wh, ww, mask_rows = resize_mats_and_rows(cfg, s.input_hw, s.sam_hw,
                                             on_tpu=True)
    hgt, wid = s.sam_hw
    thr, off = cfg.mask_threshold, 1.0

    key = jax.random.PRNGKey(0)
    blk_syn = jax.random.normal(key, (sub, mask_rows * cfg.grid, 16, 3),
                                jnp.bfloat16)

    @jax.jit
    def split(x):
        flags = fused_resize_flags(x, wh, ww, thr, off,
                                   grid_hw=(mask_rows, cfg.grid))
        flags = flags.reshape(-1, hgt, wid)
        hi = jnp.sum(flags >> 2, axis=(1, 2), dtype=jnp.int32
                     ).astype(jnp.float32)
        lo = jnp.sum(flags & 1, axis=(1, 2), dtype=jnp.int32
                     ).astype(jnp.float32)
        stability = hi / jnp.maximum(lo, 1.0)
        masks_bool = (flags & 2).astype(bool)
        rows = jnp.any(masks_bool, axis=2)
        cols = jnp.any(masks_bool, axis=1)
        ridx = jnp.arange(hgt)
        cidx = jnp.arange(wid)
        top = jnp.min(jnp.where(rows, ridx, hgt), axis=1)
        bottom = jnp.max(jnp.where(rows, ridx, -1), axis=1)
        left = jnp.min(jnp.where(cols, cidx, wid), axis=1)
        right = jnp.max(jnp.where(cols, cidx, -1), axis=1)
        empty = ~jnp.any(rows, axis=1)
        boxes = jnp.stack([left, top, right, bottom], axis=1)
        boxes = jnp.where(empty[:, None], 0, boxes).astype(jnp.float32)
        return flags, stability, boxes

    @jax.jit
    def fused(x):
        flags, rowst, colst = fused_resize_flags(
            x, wh, ww, thr, off, grid_hw=(mask_rows, cfg.grid),
            emit_stats=True)
        n_m = flags.shape[1]
        flags = flags.reshape(-1, hgt, wid)
        hi = jnp.sum(rowst[:, :, 4:4 + n_m], axis=1).reshape(-1)
        lo = jnp.sum(rowst[:, :, 8:8 + n_m], axis=1).reshape(-1)
        stability = hi / jnp.maximum(lo, 1.0)
        rows = rowst[:, :, :n_m] > 0.0
        cols = colst[:, :n_m, :] > 0.0
        ridx = jnp.arange(hgt)[None, :, None]
        cidx = jnp.arange(wid)[None, None, :]
        top = jnp.min(jnp.where(rows, ridx, hgt), axis=1).reshape(-1)
        bottom = jnp.max(jnp.where(rows, ridx, -1), axis=1).reshape(-1)
        left = jnp.min(jnp.where(cols, cidx, wid), axis=2).reshape(-1)
        right = jnp.max(jnp.where(cols, cidx, -1), axis=2).reshape(-1)
        empty = ~jnp.any(rows, axis=1).reshape(-1)
        boxes = jnp.stack([left, top, right, bottom], axis=1)
        boxes = jnp.where(empty[:, None], 0, boxes).astype(jnp.float32)
        return flags, stability, boxes

    # production (split) compiles FIRST (CLAUDE.md compile-drop gotcha)
    retry("compile split", lambda: sync_tree(split(blk_syn)),
          attempts=3, sleep_s=45)
    retry("compile fused", lambda: sync_tree(fused(blk_syn)),
          attempts=3, sleep_s=45)

    import numpy as np
    oa = split(blk_syn)
    ob = fused(blk_syn)
    for name, a, b in zip(("flags", "stability", "boxes"), oa, ob):
        d = int(np.sum(np.asarray(a) != np.asarray(b)))
        print(f"[rzs] parity {name}: mismatches {d}", flush=True)

    def loop(fn, n=12):
        out = fn(blk_syn)
        sync_tree(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(blk_syn)
        sync_tree(out)
        return (time.perf_counter() - t0) / n

    for rnd in range(4):
        ta = loop(split)
        tb = loop(fused)
        print(f"[rzs] round{rnd} x{scale:.0f}: split={1000*ta*scale:.2f}ms "
              f"fused={1000*tb*scale:.2f}ms ({ta/tb:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
