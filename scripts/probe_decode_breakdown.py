"""Async-loop timing of the decode batch's constituent phases at
PRODUCTION shapes (default: the r4 config — 1024 prompts in one
dispatch, keys-emission fused tail; pass a batch size as argv[1]):

  decode_batch   full _decode_batch (transformer+maskhead+resize+stats)
  two_way        the 2-layer transformer alone (keys mode: emits keys2)
  decode_masks   transformer + hyper MLPs + fused mask head (no resize)
  mask_head      fused_mask_head alone (sub-batch, scaled)
  resize+stats   ≈ decode_batch − decode_masks

STAGED STRUCTURE (r5 hardening): one RESOURCE_EXHAUSTED poisons every
subsequent dispatch in this client (observed 4/4 attempts: the
standalone mask-head compile OOMs under co-tenant HBM pressure, then
even previously-working programs fail). So each phase compiles, times,
and PRINTS before the next, ordered production-critical-first — partial
results always survive.
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
    from revisit_anything_tpu.ops.maskhead import fused_mask_head

    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

    s = sam_setup()
    cfg = s.cfg
    _, _, mask_rows = resize_mats_and_rows(cfg, s.input_hw, s.sam_hw,
                                           on_tpu=True)
    content = mask_rows * cfg.grid
    pts = point_grid(s)[:bsz]
    amg = AmgConfig(points_per_batch=bsz,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)

    # production tail mode: keys emission (r4)
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

    # ---- phase 1: the production stage number (cached compile) ----
    db = lambda: _decode_batch(s.sam_params, cfg, s.emb, s.image_pe,  # noqa
                               pts, s.input_hw, s.sam_hw, amg)[1]
    retry("compile decode_batch", lambda: sync_tree(db()))
    t_db = [loop(db) for _ in range(3)]
    for r, t in enumerate(t_db):
        print(f"[dec] P1 round{r} bsz={bsz} decode_batch={1000*t:.2f}ms",
              flush=True)

    # ---- phase 2: two_way (keys emission) vs decode_batch ----
    # keys2 [B, 4096, 256] (2.15 GB at B=1024) never leaves the program:
    # exposing it as a jit OUTPUT let several in-flight async copies
    # coexist during the timing loop and is probe-only overhead (in
    # production it is consumed in-program) — slice it down in-trace.
    dec, tokens, shared_src, src_pe_one = prompt_tokens(s, pts)
    mh_bsz = min(128, bsz)

    @jax.jit
    def two_way(tk, ss, pe):
        q, _, k2 = _run_two_way_probs(dec, tk, ss, pe, cfg)
        return q, k2[:mh_bsz]

    queries, keys_mh = retry(
        "compile two_way", lambda: two_way(tokens, shared_src, src_pe_one))
    sync_tree(queries)
    for r in range(3):
        t_tw = loop(lambda: two_way(tokens, shared_src, src_pe_one)[0])
        t_d = loop(db)
        print(f"[dec] P2 round{r} two_way={1000*t_tw:.2f}ms "
              f"decode_batch={1000*t_d:.2f}ms "
              f"(tw share {t_tw/t_d:.2f})", flush=True)

    # ---- phase 3: decode_masks (transformer + mask head, no resize) ----
    from revisit_anything_tpu.models.sam.decoder import decode_masks
    from revisit_anything_tpu.models.sam.prompt import (
        embed_points, no_mask_dense_embedding)
    from revisit_anything_tpu.utils.packing import maybe_unpack
    try:
        up = maybe_unpack(s.sam_params)
        sparse = embed_points(up, cfg, pts[:, None, :],
                              jnp.ones((bsz, 1), jnp.int32), pad=True)
        dense = no_mask_dense_embedding(up, cfg, 1)
        del up
        dmasks = jax.jit(lambda e, pe, sp, de: decode_masks(
            s.sam_params, cfg, e, pe, sp, de, multimask=True,
            dense_shared=True, block_layout=True, mask_rows=mask_rows))
        retry("compile decode_masks",
              lambda: sync_tree(dmasks(s.emb, s.image_pe, sparse, dense)[1]))
        for r in range(3):
            t_dm = loop(lambda: dmasks(s.emb, s.image_pe, sparse,
                                       dense)[1])
            t_d = loop(db)
            print(f"[dec] P3 round{r} decode_masks={1000*t_dm:.2f}ms "
                  f"decode_batch={1000*t_d:.2f}ms "
                  f"resize+stats≈{1000*(t_d - t_dm):.2f}ms", flush=True)
    except Exception as e:                                # noqa: BLE001
        print(f"[dec] P3 decode_masks unavailable: "
              f"{str(e).splitlines()[0][:120]}", flush=True)

    # ---- phase 4 (fragile, LAST): standalone mask head, sub-batch ----
    mask_tokens_out = queries[:mh_bsz, 1:1 + cfg.num_mask_tokens]
    hyper_mh = jnp.stack(
        [_mlp(mask_tokens_out[:, i], dec["hyper_mlps"][i])
         for i in (1, 2, 3)], axis=1)
    jax.block_until_ready((keys_mh, hyper_mh))
    mask_head = jax.jit(lambda k, hy: fused_mask_head(
        k, hy, dec["up1_w"], dec["up1_b"], dec["up_ln"]["scale"],
        dec["up_ln"]["bias"], dec["up2_w"], dec["up2_b"],
        eps=cfg.eps, content=content, interpret=False))
    try:
        retry(f"compile mask_head[b={mh_bsz}]",
              lambda: sync_tree(mask_head(keys_mh, hyper_mh)),
              attempts=2, sleep_s=30)
        scale = bsz / mh_bsz
        for r in range(3):
            t_mh = loop(lambda: mask_head(keys_mh, hyper_mh))
            print(f"[dec] P4 round{r} mask_head={1000*t_mh*scale:.2f}ms "
                  f"(b={mh_bsz} x{scale:.0f})", flush=True)
    except Exception as e:                                # noqa: BLE001
        print(f"[dec] P4 mask_head unavailable: "
              f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
