"""Interleaved A/B: AMG decode prompt-batch size 128 (production, 8
scan steps/query) vs 256 (4 steps). Bigger batches amortize per-batch
fixed costs (kernel launches, XLA glue between the tail kernel / mask
head / resize passes) and raise matmul M-dims in the XLA portions; VMEM
per Pallas grid step is unchanged (all per-prompt blocks).

Methodology: BASELINE.md rules — async loops, one process, production
variant compiled first, retries for tunnel-dropped compiles. The
signal is ms/query = loop(decode_batch(bsz)) * (1024 / bsz).
"""
import sys
import time

import numpy as np

from _ab_common import point_grid, retry, sam_setup, sync_tree


def main():
    from revisit_anything_tpu.models.sam.amg import AmgConfig, _decode_batch
    from revisit_anything_tpu.models.sam.encoder import encode_image

    s = sam_setup()
    pts_all = point_grid(s)                               # [1024, 2]

    sizes = tuple(int(a) for a in sys.argv[1:]) or (128, 256)
    # the parity check below slices the LARGER batch's first n prompts
    # against the smaller batch (io2[:n]); a descending invocation would
    # silently compare mismatched prompt sets (ADVICE r4)
    assert sizes == tuple(sorted(sizes)), \
        f"pass batch sizes in ascending order, got {sizes}"
    fns = {}
    for bsz in sizes:                       # production (cached) FIRST
        amg = AmgConfig(points_per_batch=bsz,
                        pred_iou_thresh=-1e9, stability_score_thresh=0.0)
        pts = pts_all[:bsz]

        def fn(p=pts, a=amg):
            return _decode_batch(s.sam_params, s.cfg, s.emb, s.image_pe, p,
                                 s.input_hw, s.sam_hw, a)
        print(f"[ab] compiling _decode_batch bsz={bsz}...",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        retry(f"compile bsz={bsz}", lambda: sync_tree(fn()))
        print(f"[ab] compiled bsz={bsz} in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
        fns[bsz] = fn

    # parity: candidate stats must agree between batch splits (the larger
    # batch is the smaller batches' prompts in one dispatch). NOTE on the
    # flag-diff count: with RANDOM-INIT weights every mask logit sits
    # within ~0.03 of the 0.0 threshold (probe_bsz_parity.py: 100% of
    # pixels, vs 0% within 1e-3 of the ±1 stability levels), so bf16-
    # rounding deltas (~3e-4) flip ~0.26% of pixels. Real checkpoints
    # produce saturated logits; the same delta flips ~nothing.
    b_lo, b_hi = sizes[0], sizes[-1]
    mb1, io1, st1, bx1 = fns[b_lo]()
    mb2, io2, st2, bx2 = fns[b_hi]()
    n = io1.shape[0]
    dio = np.abs(np.asarray(io2[:n], np.float32)
                 - np.asarray(io1, np.float32)).max()
    dst_ = np.abs(np.asarray(st2[:n], np.float32)
                  - np.asarray(st1, np.float32)).max()
    dmb = int(np.sum(np.asarray(mb2[:n]) != np.asarray(mb1)))
    print(f"[ab] parity first-128-prompts: iou max|d|={dio:.2e} "
          f"stab max|d|={dst_:.2e} mask flag diffs={dmb}", flush=True)

    def loop(fn, n=8):
        out = fn()
        sync_tree(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync_tree(out)
        return (time.perf_counter() - t0) / n

    for rnd in range(4):
        enc = loop(lambda: encode_image(s.sam_params, s.cfg, s.pre)[0], n=6)
        parts = [f"round{rnd} enc={1000*enc:.1f}ms"]
        per_q = {}
        for bsz in sizes:
            t = loop(fns[bsz])
            per_q[bsz] = (1024 // bsz) * t
            parts.append(f"bsz{bsz}: {1000*t:.2f}ms/batch -> "
                         f"{1000*per_q[bsz]:.1f}ms/q")
        parts.append(f"({per_q[sizes[0]]/per_q[sizes[-1]]:.3f}x "
                     f"{sizes[0]}->{sizes[-1]})")
        print("[ab] " + " | ".join(parts), flush=True)


if __name__ == "__main__":
    main()
