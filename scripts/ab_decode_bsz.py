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


def _retry(label, fn, attempts=4, sleep_s=60):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:                       # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            print(f"[ab] {label} attempt {i + 1} failed: {msg}",
                  file=sys.stderr, flush=True)
            if i == attempts - 1:
                raise
            time.sleep(sleep_s)


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.config import get_dataset
    from revisit_anything_tpu.models.sam import SAM_VIT_H, init_sam_params
    from revisit_anything_tpu.models.sam.amg import (AmgConfig,
                                                     _decode_batch,
                                                     build_point_grid,
                                                     resize_longest_side)
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
    pts_all = jnp.asarray((pts_orig * scale).astype(np.float32))  # [1024,2]

    def sync_tree(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(jnp.ravel(leaf)[0].astype(jnp.float32))

    sizes = tuple(int(a) for a in sys.argv[1:]) or (128, 256)
    fns = {}
    for bsz in sizes:                       # production (cached) FIRST
        amg = AmgConfig(points_per_batch=bsz,
                        pred_iou_thresh=-1e9, stability_score_thresh=0.0)
        pts = pts_all[:bsz]

        def fn(p=pts, a=amg):
            return _decode_batch(sam_params, cfg, emb, image_pe, p,
                                 input_hw, sam_hw, a)
        print(f"[ab] compiling _decode_batch bsz={bsz}...",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        _retry(f"compile bsz={bsz}", lambda: sync_tree(fn()))
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
        enc = loop(lambda: encode_image(sam_params, cfg, pre)[0], n=6)
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
