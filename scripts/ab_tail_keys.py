"""Interleaved A/B: keys-emission fused tail (kernel emits keys2 [M, D],
mask head runs its plain non-recon path) vs the probs handoff (mask head
reconstructs the branch from P1/P2). Measures two_way + mask head
separately and the full _decode_batch, with parity checks.

Methodology: BASELINE.md rules — production variant compiled first,
retries for tunnel-dropped compiles, async loops, one process.
"""
import sys
import time

import numpy as np

from _ab_common import point_grid, prompt_tokens, retry, sam_setup, sync_tree


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.models.sam import decoder as dec_mod
    from revisit_anything_tpu.models.sam.amg import (AmgConfig,
                                                     _decode_batch,
                                                     resize_mats_and_rows)
    from revisit_anything_tpu.models.sam.decoder import (_mlp,
                                                         _run_two_way_probs)
    from revisit_anything_tpu.models.sam.encoder import encode_image
    from revisit_anything_tpu.ops.maskhead import (fused_mask_head,
                                                   fused_mask_head_probs)

    s = sam_setup()
    cfg = s.cfg
    _, _, mask_rows = resize_mats_and_rows(cfg, s.input_hw, s.sam_hw,
                                           on_tpu=True)
    content = mask_rows * cfg.grid

    pts = point_grid(s)[:128]
    amg = AmgConfig(points_per_batch=128,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    dec, tokens, shared_src, src_pe_one = prompt_tokens(s, pts)

    def make_two_way(tail_keys):
        dec_mod._FUSED_TAIL = "auto"
        dec_mod._TAIL_KEYS = tail_keys
        fn = jax.jit(lambda dc, tk, ss, pe: _run_two_way_probs(
            dc, tk, ss, pe, cfg))
        out = retry(f"compile two_way[keys={tail_keys}]",
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
        retry(f"compile mask_head[keys,blk={blk}]",
              lambda: sync_tree(fn(keys2, hyper)))
        return fn

    def mh_probs():
        fn = jax.jit(lambda s_, a, b, c, e, br, h: fused_mask_head_probs(
            s_, a, b, c, e, br, h, dec["up1_w"], dec["up1_b"],
            dec["up_ln"]["scale"], dec["up_ln"]["bias"], dec["up2_w"],
            dec["up2_b"], ln_eps=cfg.eps, **mh_kw))
        retry("compile mask_head[probs]",
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
        enc = loop(lambda: encode_image(s.sam_params, cfg, s.pre)[0], n=6)
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
        fn = lambda: _decode_batch(s.sam_params, cfg, s.emb, s.image_pe,  # noqa
                                   pts, s.input_hw, s.sam_hw, amg)[1]
        retry(f"compile _decode_batch[keys={tail_keys}]", fn)
        return fn

    print("[ab] compiling keys _decode_batch...", file=sys.stderr,
          flush=True)
    db_k = make_db("on")
    for rnd in range(3):
        enc = loop(lambda: encode_image(s.sam_params, cfg, s.pre)[0], n=6)
        tdb = loop(db_k, n=8)
        print(f"[ab] round{rnd} enc={1000*enc:.1f}ms "
              f"decode_batch keys={1000*tdb:.2f}ms "
              f"(x8 = {8000*tdb:.1f}ms/query)", flush=True)


if __name__ == "__main__":
    main()
