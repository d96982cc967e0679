"""Interleaved A/B: logits-emission fused tail (mask head + hypernetwork
MLPs INSIDE the tail kernel — the [M, D] branch never touches HBM) vs
the r4 keys-emission two-kernel path. Measures the full `_decode_batch`
at the production 1024-prompt batch plus `decode_masks` alone, with
candidate-stat parity at 128 prompts.

What the mode saves per 1024-prompt query: keys2 [4096, 256] bf16 write
(2.1 GB) + mask-head read (2.1 GB) + one kernel launch — ~6 ms of HBM
time at the 700 GB/s effective rate, more under co-tenant HBM pressure
(the loaded-window decode stretch is bandwidth-driven, BASELINE.md).

Methodology: BASELINE.md rules — production variant compiled first,
retries for tunnel-dropped compiles, async loops, one process.
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
                                                     _decode_batch)
    from revisit_anything_tpu.models.sam.encoder import encode_image

    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    s = sam_setup()
    cfg = s.cfg
    pts = point_grid(s)[:bsz]
    amg = AmgConfig(points_per_batch=bsz,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    dec_mod._FUSED_TAIL = "auto"
    dec_mod._TAIL_KEYS = "on"

    # _TAIL_LOGITS is a TRACE-time flag and _decode_batch/decode_masks
    # are module-jitted: tracing each mode into its OWN AOT executable
    # (jit().lower().compile()) pins the two variants so the interleaved
    # loops never retrace, and neither mode can silently reuse the
    # other's cached computation. Params stay jit ARGUMENTS (CLAUDE.md:
    # a closed-over model becomes an HLO constant).
    raw_db = _decode_batch.__wrapped__
    pts_dev = jnp.asarray(pts)

    def make_db(tail_logits, label):
        dec_mod._TAIL_LOGITS = tail_logits
        # raw_db is unjitted, but it CALLS the module-jitted decode_masks
        # whose cache key ignores the trace-time flag — without clearing,
        # the second variant silently reuses the first's computation and
        # the A/B compares keys-vs-keys (caught r5: "compiled logits in
        # 1s" + bit-identical parity across different kernel layouts).
        from revisit_anything_tpu.models.sam.decoder import decode_masks
        decode_masks.clear_cache()
        fn = jax.jit(lambda prm, e, pe, p: raw_db(
            prm, cfg, e, pe, p, s.input_hw, s.sam_hw, amg))
        print(f"[ab] compiling _decode_batch[{label}]...",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        exe = retry(f"compile _decode_batch[{label}]",
                    lambda: fn.lower(s.sam_params, s.emb, s.image_pe,
                                     pts_dev).compile())
        out = exe(s.sam_params, s.emb, s.image_pe, pts_dev)
        sync_tree(out)
        print(f"[ab] compiled {label} in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
        return (lambda: exe(s.sam_params, s.emb, s.image_pe, pts_dev)), out

    # production (cached) FIRST, then the candidate
    db_keys, out_keys = make_db("off", "keys")
    db_log, out_log = make_db("on", "logits")

    mb_k, io_k, st_k, bx_k = (np.asarray(x) for x in out_keys)
    mb_l, io_l, st_l, bx_l = (np.asarray(x) for x in out_log)
    flip = float(np.mean(mb_k != mb_l))
    dio = float(np.abs(io_k.astype(np.float32)
                       - io_l.astype(np.float32)).max())
    dst = float(np.abs(st_k.astype(np.float32)
                       - st_l.astype(np.float32)).max())
    print(f"[ab] parity: mask-bit flip rate={flip:.2e} "
          f"iou max|d|={dio:.2e} stability max|d|={dst:.2e} "
          f"(bf16-rounding class expected with random weights — "
          f"probe_bsz_parity.py)", flush=True)

    def loop(fn, n=8):
        out = fn()
        sync_tree(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync_tree(out)
        return (time.perf_counter() - t0) / n

    for rnd in range(4):
        enc = loop(lambda: encode_image(s.sam_params, cfg, s.pre)[0], n=6)
        t_keys = loop(lambda: db_keys()[1])
        t_log = loop(lambda: db_log()[1])
        print(f"[ab] round{rnd} enc={1000*enc:.1f}ms bsz={bsz} | "
              f"decode_batch keys={1000*t_keys:.2f}ms "
              f"logits={1000*t_log:.2f}ms ({t_keys/t_log:.3f}x)",
              flush=True)


if __name__ == "__main__":
    main()
