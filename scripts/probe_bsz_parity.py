"""Why do decode masks differ between prompt-batch 128 and 256?

For the FIRST 128 prompts decoded under both batch sizes, quantifies:
  - lowres mask-logit delta (before resize) — the raw numeric divergence
    introduced by batch-size-dependent XLA tiling/bf16 rounding;
  - per-bit flag flips (lo / mask / hi) from the production fused resize;
  - the margin |resized_logit - level| at flipped pixels, via an exact
    float64 host resize (same composed matrices, block layout unrolled
    as in ops/maskresize.resize_flags_reference).

Decides whether bsz=256 flips are the bf16-rounding class (all flips at
margins ~ the logit delta) or a real divergence.
"""
import numpy as np

from _ab_common import point_grid, sam_setup


def main():
    import jax.numpy as jnp

    from revisit_anything_tpu.models.sam.amg import resize_mats_and_rows
    from revisit_anything_tpu.models.sam.decoder import decode_masks
    from revisit_anything_tpu.models.sam.prompt import (
        embed_points, no_mask_dense_embedding)
    from revisit_anything_tpu.ops.maskresize import fused_resize_flags
    from revisit_anything_tpu.utils.packing import maybe_unpack

    s = sam_setup()
    cfg, emb, image_pe = s.cfg, s.emb, s.image_pe
    wh, ww, gh = resize_mats_and_rows(cfg, s.input_hw, s.sam_hw, on_tpu=True)
    g = cfg.grid
    thr = float(cfg.mask_threshold)
    off = 1.0

    pts_all = np.asarray(point_grid(s))

    up = maybe_unpack(s.sam_params)
    dense1 = no_mask_dense_embedding(up, cfg, 1)

    lows, ious = {}, {}
    for bsz in (128, 256):
        pts = jnp.asarray(pts_all[:bsz])
        sparse = embed_points(up, cfg, pts[:, None, :],
                              jnp.ones((bsz, 1), jnp.int32), pad=True)
        decode_masks.clear_cache()
        lowres_blk, iou = decode_masks(up, cfg, emb, image_pe, sparse,
                                       dense1, multimask=True,
                                       dense_shared=True, block_layout=True,
                                       mask_rows=gh)
        lows[bsz] = np.asarray(lowres_blk[:128], np.float32)
        ious[bsz] = np.asarray(iou[:128], np.float32)
        print(f"[parity] decoded bsz={bsz}: lowres {lowres_blk.shape} "
              f"{lowres_blk.dtype}", flush=True)

    lo1, lo2 = lows[128], lows[256]
    dlo = np.abs(lo2 - lo1)
    print(f"[parity] lowres logits (first 128 prompts): "
          f"max|d|={dlo.max():.3e} mean|d|={dlo.mean():.3e} "
          f"p99.9={np.quantile(dlo, 0.999):.3e} "
          f"iou max|d|={np.abs(ious[256] - ious[128]).max():.3e}",
          flush=True)

    f1 = np.asarray(fused_resize_flags(jnp.asarray(lo1, jnp.bfloat16),
                                       wh, ww, thr, off, grid_hw=(gh, g)))
    f2 = np.asarray(fused_resize_flags(jnp.asarray(lo2, jnp.bfloat16),
                                       wh, ww, thr, off, grid_hw=(gh, g)))
    print(f"[parity] flags shape {f1.shape}", flush=True)
    for bit, name in ((0, "lo(-1)"), (1, "mask(0)"), (2, "hi(+1)")):
        flips = int(np.sum(((f1 >> bit) & 1) != ((f2 >> bit) & 1)))
        print(f"[parity] bit {name}: {flips} flips", flush=True)

    # exact f64 host resize (resize_flags_reference math, unrolled):
    # lowres_blk [N, gh*g, 16, M] -> logits [N, M, H, W]
    def host_logits(lo):
        n, gg, sixteen, m = lo.shape
        x = lo.reshape(n, gh, g, 2, 2, 2, 2, m).astype(np.float64)
        whb = np.asarray(wh, np.float64).reshape(-1, gh, 2, 2)
        wwb = np.asarray(ww, np.float64).reshape(-1, g, 2, 2)
        y = np.einsum("oiac,nijabcdm->nojbdm", whb, x, optimize=True)
        return np.einsum("pjbd,nojbdm->nmop", wwb, y, optimize=True)

    l1 = host_logits(lo1)
    l2 = host_logits(lo2)
    mflip = ((f1 >> 1) & 1).reshape(l1.shape) != \
        ((f2 >> 1) & 1).reshape(l2.shape)
    n_flip = int(mflip.sum())
    if n_flip:
        marg1 = np.abs(l1[mflip] - thr)
        marg2 = np.abs(l2[mflip] - thr)
        marg = np.maximum(marg1, marg2)
        print(f"[parity] mask-bit flips {n_flip}: margin max={marg.max():.3e}"
              f" p99={np.quantile(marg, 0.99):.3e} "
              f"median={np.median(marg):.3e}", flush=True)
    # how much probability mass sits near each level (explains why hi/lo
    # don't flip): pixels within eps of each level in the f64 logits
    for eps in (1e-3, 1e-2, 3e-2):
        for name, lv in (("lo", thr - off), ("mask", thr),
                         ("hi", thr + off)):
            frac = float(np.mean(np.abs(l1 - lv) < eps))
            print(f"[parity] |logit-{name}({lv:+.1f})| < {eps:g}: "
                  f"{100 * frac:.4f}% of pixels", flush=True)

    d_resized = np.abs(l2 - l1)
    print(f"[parity] resized f64 logit delta: max={d_resized.max():.3e} "
          f"mean={d_resized.mean():.3e}", flush=True)


if __name__ == "__main__":
    main()
