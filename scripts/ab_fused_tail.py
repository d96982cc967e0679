"""Interleaved A/B: fused decode tail (ops/decode_fused.py) vs the r3
split per-consumer kernels, at production shapes on real TPU.

_FUSED_TAIL is a trace-time flag and the decode fns are module-jitted, so
each variant is traced with the inner caches cleared first; after tracing
the flag is irrelevant and the two executables are timed interleaved
(async loops, one sync — BASELINE.md methodology).

Compiles are the expensive part through the tunnel (the compile server
drops long compiles under co-tenant load — observed Broken pipe at ~35
min on the full _decode_batch HLO), so the A/B compares at the
``two_way + mask-head inputs`` level (much smaller programs), compiles
the PRODUCTION (fused) variant first, and retries dropped compiles.
The full fused _decode_batch is then timed on its own for the stage
number, with encode/dino canaries for the load context.
"""
import sys
import time

import numpy as np

from _ab_common import point_grid, prompt_tokens, retry, sam_setup, sync_tree


def main():
    import jax

    from revisit_anything_tpu.models.sam import decoder as dec_mod
    from revisit_anything_tpu.models.sam.amg import AmgConfig, _decode_batch
    from revisit_anything_tpu.models.sam.decoder import _run_two_way_probs
    from revisit_anything_tpu.models.sam.encoder import encode_image

    s = sam_setup()
    pts = point_grid(s)[:128]
    amg = AmgConfig(points_per_batch=128,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    dec, tokens, shared_src, src_pe_one = prompt_tokens(s, pts)

    def make_two_way(flag):
        dec_mod._FUSED_TAIL = flag
        # this A/B compares the r4 fused tail vs the r3 split kernels at
        # the PROBS-output level; keys-emission (r4 late) is a separate
        # A/B (ab_tail_keys.py)
        dec_mod._TAIL_KEYS = "off"
        # params enter as jit ARGUMENTS (CLAUDE.md: closing over device
        # params embeds them as HLO constants — forces a device→host
        # readback at trace time and bloats the uploaded program)
        fn = jax.jit(lambda dc, tk, ss, pe: _run_two_way_probs(
            dc, tk, ss, pe, s.cfg))
        out = retry(f"compile two_way[{flag}]",
                    lambda: fn(dec, tokens, shared_src, src_pe_one))
        sync_tree(out)
        return fn, out

    # production variant FIRST (its executable matters even if the
    # split's compile keeps getting dropped)
    print("[ab] compiling fused two_way...", file=sys.stderr, flush=True)
    f_fused, o_fused = make_two_way("auto")
    print("[ab] compiling split two_way...", file=sys.stderr, flush=True)
    f_split, o_split = make_two_way("off")
    dec_mod._FUSED_TAIL = "auto"

    # ---- parity (queries + p1/p2/c2m feed everything downstream) ----
    q_f, (p1_f, c1_f, p2_f, c2_f, _), _ = o_fused
    q_s, (p1_s, c1_s, p2_s, c2_s, _), _ = o_split
    for name, a, b in (("queries", q_f, q_s), ("p1", p1_f, p1_s),
                       ("p2", p2_f, p2_s), ("c2m", c2_f, c2_s)):
        da = np.asarray(a, np.float32)
        db_ = np.asarray(b, np.float32)
        print(f"[ab] parity {name}: max|d|={np.abs(da - db_).max():.2e}",
              flush=True)

    def loop(fn, *args, n=10):
        out = fn(*args)
        sync_tree(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync_tree(out)
        return (time.perf_counter() - t0) / n

    for rnd in range(4):
        enc = loop(lambda: encode_image(s.sam_params, s.cfg, s.pre)[0], n=6)
        ts = loop(f_split, dec, tokens, shared_src, src_pe_one)
        tf = loop(f_fused, dec, tokens, shared_src, src_pe_one)
        print(f"[ab] round{rnd} enc={1000*enc:.1f}ms "
              f"two_way split={1000*ts:.2f}ms fused={1000*tf:.2f}ms "
              f"({ts/tf:.3f}x)", flush=True)

    # ---- full fused decode batch (the production stage number) ----
    db_fn = lambda: _decode_batch(s.sam_params, s.cfg, s.emb, s.image_pe,  # noqa
                                  pts, s.input_hw, s.sam_hw, amg)[1]
    retry("compile fused _decode_batch", db_fn)
    for rnd in range(3):
        enc = loop(lambda: encode_image(s.sam_params, s.cfg, s.pre)[0], n=6)
        tdb = loop(db_fn, n=8)
        print(f"[ab] round{rnd} enc={1000*enc:.1f}ms "
              f"decode_batch fused={1000*tdb:.2f}ms "
              f"(x8 batches = {8000*tdb:.1f}ms/query)", flush=True)


if __name__ == "__main__":
    main()
