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


def _retry(label, fn, attempts=4, sleep_s=45):
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
    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.models.sam import SAM_VIT_H, init_sam_params
    from revisit_anything_tpu.models.sam import decoder as dec_mod
    from revisit_anything_tpu.models.sam.amg import (AmgConfig,
                                                     _decode_batch,
                                                     build_point_grid,
                                                     resize_longest_side)
    from revisit_anything_tpu.models.sam.decoder import (_run_two_way_probs,
                                                         decode_masks)
    from revisit_anything_tpu.models.sam.encoder import encode_image
    from revisit_anything_tpu.models.sam.prompt import (
        dense_positional_embedding, embed_points, no_mask_dense_embedding)
    from revisit_anything_tpu.ops.resize import bilinear_weight_matrix
    from revisit_anything_tpu.pipeline.serve import (_dino_desc_device,
                                                     _sam_preprocess_fused)
    from revisit_anything_tpu.utils.packing import maybe_unpack, packed_init

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

    up = maybe_unpack(sam_params)
    dec = up["decoder"]
    bsz = pts.shape[0]
    sparse = embed_points(up, cfg, pts[:, None, :],
                          jnp.ones((bsz, 1), jnp.int32), pad=True)
    dense = no_mask_dense_embedding(up, cfg, 1)
    g, d = cfg.grid, cfg.prompt_dim
    out_tokens = jnp.concatenate([dec["iou_token"], dec["mask_tokens"]],
                                 axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens[None], (bsz,) + out_tokens.shape),
         sparse.astype(out_tokens.dtype)], axis=1)
    shared_src = (emb[None] + dense[:1]).reshape(1, g * g, d)
    src_pe_one = image_pe.reshape(1, g * g, d).astype(shared_src.dtype)

    def sync_tree(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(jnp.ravel(leaf)[0].astype(jnp.float32))

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
            dc, tk, ss, pe, cfg))
        out = _retry(f"compile two_way[{flag}]",
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
        enc = loop(lambda: encode_image(sam_params, cfg, pre)[0], n=6)
        ts = loop(f_split, dec, tokens, shared_src, src_pe_one)
        tf = loop(f_fused, dec, tokens, shared_src, src_pe_one)
        print(f"[ab] round{rnd} enc={1000*enc:.1f}ms "
              f"two_way split={1000*ts:.2f}ms fused={1000*tf:.2f}ms "
              f"({ts/tf:.3f}x)", flush=True)

    # ---- full fused decode batch (the production stage number) ----
    db_fn = lambda: _decode_batch(sam_params, cfg, emb, image_pe, pts,  # noqa
                                  input_hw, sam_hw, amg)[1]
    _retry("compile fused _decode_batch", db_fn)
    for rnd in range(3):
        enc = loop(lambda: encode_image(sam_params, cfg, pre)[0], n=6)
        tdb = loop(db_fn, n=8)
        print(f"[ab] round{rnd} enc={1000*enc:.1f}ms "
              f"decode_batch fused={1000*tdb:.2f}ms "
              f"(x8 batches = {8000*tdb:.1f}ms/query)", flush=True)


if __name__ == "__main__":
    main()
