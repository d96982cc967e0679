"""Interleaved A/B: keys-emission decode tail (the fused tail stores
keys2 once, the mask head runs its plain non-recon path) vs the r4
probs-consuming mask head (the tail emits p1/p2/c2m and the mask head
reconstructs the branch twice, paying 2 f32 LayerNorms per prompt).

The work MOVES between the two phases (tail kernel gains a [M, D] store
+ transpose; mask head loses 2 recon matmuls + 2 LNs), so the signal is
the SUM two_way + mask_head, timed per phase with async loops in one
process (BASELINE.md methodology). Programs are small (phase-level) and
the production variant compiles first (CLAUDE.md compile-server rule).
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
    from revisit_anything_tpu.models.sam import SAM_VIT_H, init_sam_params
    from revisit_anything_tpu.models.sam import decoder as dec_mod
    from revisit_anything_tpu.models.sam.amg import (AmgConfig,
                                                     _decode_batch,
                                                     build_point_grid,
                                                     resize_longest_side,
                                                     resize_mats_and_rows)
    from revisit_anything_tpu.models.sam.decoder import (_mlp,
                                                         _run_two_way_probs)
    from revisit_anything_tpu.models.sam.encoder import encode_image
    from revisit_anything_tpu.models.sam.prompt import (
        dense_positional_embedding, embed_points, no_mask_dense_embedding)
    from revisit_anything_tpu.ops.maskhead import (fused_mask_head,
                                                   fused_mask_head_probs)
    from revisit_anything_tpu.ops.resize import bilinear_weight_matrix
    from revisit_anything_tpu.pipeline.serve import _sam_preprocess_fused
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
    _, _, mask_rows = resize_mats_and_rows(cfg, input_hw, sam_hw)
    content = mask_rows * cfg.grid

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
        leaf = [x for x in jax.tree_util.tree_leaves(o) if x is not None][0]
        float(jnp.ravel(leaf)[0].astype(jnp.float32))

    def make_two_way(tail_keys):
        dec_mod._FUSED_TAIL = "auto"
        dec_mod._TAIL_KEYS = tail_keys
        fn = jax.jit(lambda dc, tk, ss, pe: _run_two_way_probs(
            dc, tk, ss, pe, cfg))
        out = _retry(f"compile two_way[keys={tail_keys}]",
                     lambda: fn(dec, tokens, shared_src, src_pe_one))
        sync_tree(out)
        return fn, out

    # production variant FIRST
    print("[ab] compiling keys two_way...", file=sys.stderr, flush=True)
    f_keys, o_keys = make_two_way("on")
    print("[ab] compiling probs two_way...", file=sys.stderr, flush=True)
    f_probs, o_probs = make_two_way("off")
    dec_mod._TAIL_KEYS = "auto"

    q_k, _, keys2 = o_keys
    q_p, pstate, _ = o_probs
    p1, c1m, p2, c2m, branch_rows = pstate
    print(f"[ab] parity queries: max|d|="
          f"{np.abs(np.asarray(q_k, np.float32) - np.asarray(q_p, np.float32)).max():.2e}",
          flush=True)

    # hypernetwork weights (shared by both mask-head variants)
    token_ids = list(range(1, cfg.num_mask_tokens))
    mask_tokens_out = q_k[:, 1:1 + cfg.num_mask_tokens]
    hyper = jnp.stack(
        [_mlp(mask_tokens_out[:, i], dec["hyper_mlps"][i])
         for i in token_ids], axis=1)

    mh_kw = dict(eps=cfg.eps, content=content, interpret=False)

    def mh_keys(blk):
        fn = jax.jit(lambda k, h: fused_mask_head(
            k, h, dec["up1_w"], dec["up1_b"], dec["up_ln"]["scale"],
            dec["up_ln"]["bias"], dec["up2_w"], dec["up2_b"],
            block=blk, **mh_kw))
        _retry(f"compile mask_head[keys,blk={blk}]",
               lambda: sync_tree(fn(keys2, hyper)))
        return fn

    def mh_probs():
        fn = jax.jit(lambda s, a, b, c, e, br, h: fused_mask_head_probs(
            s, a, b, c, e, br, h, dec["up1_w"], dec["up1_b"],
            dec["up_ln"]["scale"], dec["up_ln"]["bias"], dec["up2_w"],
            dec["up2_b"], ln_eps=cfg.eps, **mh_kw))
        _retry("compile mask_head[probs]",
               lambda: sync_tree(fn(shared_src, p1, c1m, p2, c2m,
                                    branch_rows, hyper)))
        return fn

    print("[ab] compiling keys mask heads...", file=sys.stderr, flush=True)
    f_mh_k2048 = mh_keys(2048)
    f_mh_k4096 = mh_keys(4096)
    print("[ab] compiling probs mask head...", file=sys.stderr, flush=True)
    f_mh_p = mh_probs()

    m_k = np.asarray(f_mh_k4096(keys2, hyper), np.float32)
    m_p = np.asarray(f_mh_p(shared_src, p1, c1m, p2, c2m, branch_rows,
                            hyper), np.float32)
    print(f"[ab] parity mask logits: max|d|={np.abs(m_k - m_p).max():.2e} "
          f"mean|d|={np.abs(m_k - m_p).mean():.2e}", flush=True)

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
        tw_p = loop(f_probs, dec, tokens, shared_src, src_pe_one)
        tw_k = loop(f_keys, dec, tokens, shared_src, src_pe_one)
        mh_p = loop(f_mh_p, shared_src, p1, c1m, p2, c2m, branch_rows,
                    hyper)
        mh_k2 = loop(f_mh_k2048, keys2, hyper)
        mh_k4 = loop(f_mh_k4096, keys2, hyper)
        tot_p = tw_p + mh_p
        tot_k = tw_k + min(mh_k2, mh_k4)
        print(f"[ab] round{rnd} enc={1000*enc:.1f}ms | "
              f"probs: tw={1000*tw_p:.2f} mh={1000*mh_p:.2f} "
              f"sum={1000*tot_p:.2f} | "
              f"keys: tw={1000*tw_k:.2f} mh2048={1000*mh_k2:.2f} "
              f"mh4096={1000*mh_k4:.2f} sum={1000*tot_k:.2f} "
              f"({tot_p/tot_k:.3f}x)", flush=True)

    # ---- full decode batch under each mode (the stage number) ----
    def make_db(tail_keys):
        dec_mod._TAIL_KEYS = tail_keys
        from revisit_anything_tpu.models.sam.decoder import decode_masks
        decode_masks.clear_cache()
        fn = lambda: _decode_batch(sam_params, cfg, emb, image_pe, pts,  # noqa
                                   input_hw, sam_hw, amg)[1]
        _retry(f"compile _decode_batch[keys={tail_keys}]", fn)
        return fn

    print("[ab] compiling keys _decode_batch...", file=sys.stderr,
          flush=True)
    db_k = make_db("on")
    for rnd in range(3):
        enc = loop(lambda: encode_image(sam_params, cfg, pre)[0], n=6)
        tdb = loop(db_k, n=8)
        print(f"[ab] round{rnd} enc={1000*enc:.1f}ms "
              f"decode_batch keys={1000*tdb:.2f}ms "
              f"(x8 = {8000*tdb:.1f}ms/query)", flush=True)


if __name__ == "__main__":
    main()
