"""Async-loop timing of the decode batch's constituent phases at
PRODUCTION shapes (default: the r4 config — 1024 prompts in one
dispatch, keys-emission fused tail; pass a batch size as argv[1]):

  decode_batch   full _decode_batch (transformer+maskhead+resize+stats)
  decode_masks   transformer + hyper MLPs + fused mask head (no resize)
  two_way        the 2-layer transformer alone (keys mode: emits keys2)
  mask_head      fused_mask_head alone (keys2 path, captured inputs)
  resize+stats   ≈ decode_batch − decode_masks
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
                                                         _run_two_way_probs,
                                                         decode_masks)
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
    dec, tokens, shared_src, src_pe_one = prompt_tokens(s, pts)

    # production tail mode: keys emission (r4)
    dec_mod._FUSED_TAIL = "auto"
    dec_mod._TAIL_KEYS = "on"
    two_way = jax.jit(lambda tk, ss, pe: _run_two_way_probs(
        dec, tk, ss, pe, cfg))
    queries, _, keys2 = retry(
        "compile two_way", lambda: two_way(tokens, shared_src, src_pe_one))
    mask_tokens_out = queries[:, 1:1 + cfg.num_mask_tokens]
    hyper = jnp.stack(
        [_mlp(mask_tokens_out[:, i], dec["hyper_mlps"][i])
         for i in (1, 2, 3)], axis=1)

    mask_head = jax.jit(lambda k, hy: fused_mask_head(
        k, hy, dec["up1_w"], dec["up1_b"], dec["up_ln"]["scale"],
        dec["up_ln"]["bias"], dec["up2_w"], dec["up2_b"],
        eps=cfg.eps, content=content, interpret=False))
    # standalone mask head holds keys2 [B, 4096, 256] LIVE next to params
    # and outputs (inside the production program it is consumed and
    # freed), so B=1024 can exhaust HBM — fall back to a sub-batch and
    # report per-prompt-scaled numbers
    mh_bsz = 0
    keys_mh, hyper_mh = keys2, hyper
    deleted_full = False
    for cand in (bsz, 256, 128):
        try:
            if cand < keys_mh.shape[0]:
                k2, h2 = keys_mh[:cand], hyper_mh[:cand]
                jax.block_until_ready((k2, h2))
                # free the larger source before compiling: the r4/r5
                # OOMs hit while BOTH the full 2 GB keys2 and the
                # compile workspace were live (shared-HBM, CLAUDE.md)
                keys_mh.delete()
                hyper_mh.delete()
                deleted_full = True
                keys_mh, hyper_mh = k2, h2
            retry(f"compile mask_head[b={cand}]",
                  lambda: sync_tree(mask_head(keys_mh, hyper_mh)),
                  attempts=2, sleep_s=20)
            mh_bsz = cand
            break
        except Exception as e:                            # noqa: BLE001
            print(f"[dec] mask_head b={cand} unavailable: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            mh_bsz = 0

    # decode_masks inputs are OPTIONAL: under transient co-tenant HBM
    # pressure even these tiny ops can OOM (observed r5) — the probe's
    # core numbers (decode_batch/two_way/mask_head) must still print
    dmasks = sparse = dense = None
    try:
        from revisit_anything_tpu.models.sam.prompt import (
            embed_points, no_mask_dense_embedding)
        from revisit_anything_tpu.utils.packing import maybe_unpack
        up = maybe_unpack(s.sam_params)
        sparse = embed_points(up, cfg, pts[:, None, :],
                              jnp.ones((bsz, 1), jnp.int32), pad=True)
        dense = no_mask_dense_embedding(up, cfg, 1)
        dmasks = jax.jit(lambda e, pe, sp, de: decode_masks(
            s.sam_params, cfg, e, pe, sp, de, multimask=True,
            dense_shared=True, block_layout=True, mask_rows=mask_rows))
    except Exception as e:                                # noqa: BLE001
        print(f"[dec] decode_masks inputs unavailable: "
              f"{str(e).splitlines()[0][:120]}", flush=True)

    def loop(fn, n=8):
        out = fn()
        sync_tree(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync_tree(out)
        return (time.perf_counter() - t0) / n

    # smallest standalone compiles first; decode_masks (the biggest fresh
    # HLO) last — the tunnel compile server can drop long compiles under
    # heavy co-tenant load, so each stage is non-fatal
    stages = {
        "decode_batch": lambda: _decode_batch(
            s.sam_params, cfg, s.emb, s.image_pe, pts, s.input_hw,
            s.sam_hw, amg)[1],
        "two_way": lambda: two_way(tokens, shared_src, src_pe_one)[0],
    }
    if dmasks is not None:
        stages["decode_masks"] = lambda: dmasks(s.emb, s.image_pe,
                                                sparse, dense)[1]
    if mh_bsz:
        stages["mask_head"] = lambda: mask_head(keys_mh, hyper_mh)
    for rnd in range(3):
        t = {}
        for name, fn in stages.items():
            try:
                t[name] = loop(fn)
            except Exception as e:                        # noqa: BLE001
                print(f"[dec] round{rnd} {name} FAILED: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
                continue
            scale = bsz / mh_bsz if name == "mask_head" else 1.0
            note = (f" (b={mh_bsz} x{scale:.0f})"
                    if name == "mask_head" and mh_bsz != bsz else "")
            print(f"[dec] round{rnd} bsz={bsz} "
                  f"{name}={1000*t[name]*scale:.2f}ms{note}", flush=True)
        if "decode_masks" in t and "decode_batch" in t:
            print(f"[dec] round{rnd} resize+stats≈"
                  f"{1000*(t['decode_batch']-t['decode_masks']):.2f}ms",
                  flush=True)


if __name__ == "__main__":
    main()
