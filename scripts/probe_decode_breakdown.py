"""Async-loop timing of the decode batch's constituent phases at
production shapes (128 prompts, 4096 positions, ViT-H dims):

  decode_batch   full _decode_batch (transformer+maskhead+resize+stats)
  decode_masks   transformer + hyper MLPs + fused mask head (no resize)
  two_way        _run_two_way_probs alone (the 2-layer transformer)
  mask_head      fused_mask_head_probs alone (captured pstate)
  resize+stats   ≈ decode_batch − decode_masks
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.config import get_dataset
    from revisit_anything_tpu.models.sam import SAM_VIT_H, init_sam_params
    from revisit_anything_tpu.models.sam.amg import AmgConfig, _decode_batch
    from revisit_anything_tpu.models.sam.decoder import (
        _mlp, _run_two_way_probs, decode_masks)
    from revisit_anything_tpu.models.sam.encoder import encode_image
    from revisit_anything_tpu.models.sam.prompt import (
        dense_positional_embedding, embed_points, no_mask_dense_embedding)
    from revisit_anything_tpu.ops.maskhead import fused_mask_head_probs
    from revisit_anything_tpu.pipeline.serve import _sam_preprocess_fused
    from revisit_anything_tpu.ops.resize import bilinear_weight_matrix
    from revisit_anything_tpu.utils.packing import packed_init, maybe_unpack

    rng = np.random.default_rng(0)
    ds = get_dataset("17places")
    H, W = ds.size.hw
    sam_hw = ds.sam_size.hw
    cfg = SAM_VIT_H

    sam_params = packed_init(
        lambda k: init_sam_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))

    from revisit_anything_tpu.models.sam.amg import (build_point_grid,
                                                     resize_longest_side)
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

    # materialize the transformer inputs once (for two_way / mask_head)
    up = maybe_unpack(sam_params)
    dec = up["decoder"]
    bsz = pts.shape[0]
    sparse = embed_points(up, cfg, pts[:, None, :],
                          jnp.ones((bsz, 1), jnp.int32), pad=True)
    dense = no_mask_dense_embedding(up, cfg, 1)
    g = cfg.grid
    d = cfg.prompt_dim
    out_tokens = jnp.concatenate([dec["iou_token"], dec["mask_tokens"]],
                                 axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens[None], (bsz,) + out_tokens.shape),
         sparse.astype(out_tokens.dtype)], axis=1)
    shared_src = (emb[None] + dense[:1]).reshape(1, g * g, d)
    src_pe_one = image_pe.reshape(1, g * g, d).astype(shared_src.dtype)

    # the probs-consuming phase split (this probe predates the r4 keys-
    # emission mode; force the probs outputs it decomposes)
    from revisit_anything_tpu.models.sam import decoder as dec_mod
    dec_mod._TAIL_KEYS = "off"
    two_way = jax.jit(lambda tk, ss, pe: _run_two_way_probs(
        dec, tk, ss, pe, cfg))
    queries, pstate, _ = two_way(tokens, shared_src, src_pe_one)
    p1, c1m, p2, c2m, branch_rows = pstate
    mask_tokens_out = queries[:, 1:1 + cfg.num_mask_tokens]
    hyper = jnp.stack(
        [_mlp(mask_tokens_out[:, i], dec["hyper_mlps"][i])
         for i in (1, 2, 3)], axis=1)

    mask_head = jax.jit(lambda ss, a, b, cc, dd, br, hy: fused_mask_head_probs(
        ss, a, b, cc, dd, br, hy,
        dec["up1_w"], dec["up1_b"], dec["up_ln"]["scale"],
        dec["up_ln"]["bias"], dec["up2_w"], dec["up2_b"],
        eps=cfg.eps, ln_eps=cfg.eps, interpret=False))

    dmasks = jax.jit(lambda e, pe, sp, de: decode_masks(
        sam_params, cfg, e, pe, sp, de, multimask=True,
        dense_shared=True, block_layout=True))

    def sync(x):
        float(jnp.ravel(x)[0])

    def loop(fn, n=10):
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / n

    # smallest standalone compiles first; decode_masks (the biggest fresh
    # HLO) last — the tunnel compile server can drop long compiles under
    # heavy co-tenant load, so each stage is non-fatal
    stages = {
        "decode_batch": lambda: _decode_batch(
            sam_params, cfg, emb, image_pe, pts, input_hw, sam_hw, amg)[1],
        "mask_head": lambda: mask_head(shared_src, p1, c1m, p2, c2m,
                                       branch_rows, hyper),
        "two_way": lambda: two_way(tokens, shared_src, src_pe_one)[0],
        "decode_masks": lambda: dmasks(emb, image_pe, sparse, dense)[1],
    }
    for rnd in range(3):
        t = {}
        for name, fn in stages.items():
            try:
                t[name] = loop(fn)
            except Exception as e:                        # noqa: BLE001
                print(f"[dec] round{rnd} {name} FAILED: {e}", flush=True)
                continue
            print(f"[dec] round{rnd} {name}={1000*t[name]:.2f}ms",
                  flush=True)
        if "decode_masks" in t:
            print(f"[dec] round{rnd} resize+stats≈"
                  f"{1000*(t['decode_batch']-t['decode_masks']):.2f}ms",
                  flush=True)


if __name__ == "__main__":
    main()
