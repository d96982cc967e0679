"""Fused lowres→original mask resize + threshold flags, one Pallas pass.

amg._decode_batch turns the decoder's block-layout mask logits into
original-resolution candidate masks plus per-candidate statistics
(postprocess_masks, sam.py:144-174; stability score, utils/amg.py:156-176).
As XLA einsums that chain materializes two large f32 intermediates per
prompt batch — the row-contracted [Np, H, 4g, M] tensor and the final
[Np·M, H, W] logits (~750 MB f32 per 128-prompt batch at 240×320) — and
the logits are then re-read by the threshold/stability/box reductions.
Decode is bandwidth-bound, so those bytes are wall-clock.

This kernel keeps the whole per-prompt chain in VMEM. Per grid step it
loads one prompt's block logits (re-arranged so both resize contractions
are lane-aligned matmuls), applies the two per-axis bilinear matrices,
and emits only a uint8 *flag* image per mask encoding the three
thresholdings the caller needs:

  bit 0:  logits > threshold − offset   (stability denominator)
  bit 1:  logits > threshold            (the mask itself)
  bit 2:  logits > threshold + offset   (stability numerator)

HBM traffic becomes block-logits-in (bf16) + flags-out (uint8) — the f32
intermediates never exist. Downstream, the mask is `flags & 2`, and the
stability counts are tiny integer reductions over uint8.

Parity: the row contraction runs bf16×bf16 with f32 accumulation and the
column contraction f32×f32, exactly like the einsum path (whose first
einsum casts the resize matrix to the logits dtype), so flags match the
XLA chain bit-for-bit up to f32 matmul associativity (tested in
interpret mode and vs the einsum chain).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _resize_flags_kernel(lx_ref, wh_ref, wwt_ref, o_ref, *stat_refs,
                         thr: float, off: float, n_masks: int,
                         col_precision: str = "highest"):
    """One prompt: [4g, M·4g] block logits → [M, H, W] uint8 flags.

    lx_ref:  [1, 4g, M·4g]  logits, rows (i,a,c), cols (m,j,b,d)
    wh_ref:  [H, 4g]        row-resize matrix (logits dtype)
    wwt_ref: [4g, W]        column-resize matrix, transposed (f32)
    o_ref:   [1, M, H, W]   uint8 threshold flags
    stat_refs (emit_stats): rowst [1, H, 16] f32 (lane m = rows-any of
      mask m, 4+m = per-row hi counts, 8+m = per-row lo counts) and
      colst [1, 8, W] f32 (sublane m = cols-any) — the tiny per-axis
      reductions the caller's stability/box math needs, accumulated
      here while the logits are in registers so the [M, H, W] flag
      image is never re-read (amg._decode_batch stats pass).
    """
    h = o_ref.shape[2]
    w = o_ref.shape[3]
    emit_stats = len(stat_refs) == 2
    if emit_stats:
        rowst = jnp.zeros((h, 16), jnp.float32)
        colst = jnp.zeros((8, w), jnp.float32)
        lane16 = jax.lax.broadcasted_iota(jnp.int32, (h, 16), 1)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, w), 0)
    tmp = jax.lax.dot_general(
        wh_ref[...], lx_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [H, M·4g]
    k = tmp.shape[1] // n_masks
    if col_precision == "high":
        # manual bf16x3: split both f32 operands hi+lo, drop lo·lo —
        # bf16 products are EXACT in f32 (8+8 mantissa bits), so the
        # only error is the dropped lo·lo term (~2^-32 relative). 3 MXU
        # passes vs HIGHEST's 6 (Mosaic rejects Precision.HIGH).
        whi = wwt_ref[...].astype(jnp.bfloat16)
        wlo = (wwt_ref[...] - whi.astype(jnp.float32)).astype(jnp.bfloat16)
    for m in range(n_masks):
        t = tmp[:, m * k:(m + 1) * k]
        if col_precision == "high":
            thi = t.astype(jnp.bfloat16)
            tlo = (t - thi.astype(jnp.float32)).astype(jnp.bfloat16)
            dims = (((1,), (0,)), ((), ()))
            logits = (
                jax.lax.dot_general(thi, whi, dims,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(thi, wlo, dims,
                                      preferred_element_type=jnp.float32)
                + jax.lax.dot_general(tlo, whi, dims,
                                      preferred_element_type=jnp.float32))
        else:
            # f32 x f32 contraction at HIGHEST precision: this build's
            # default matmul precision is LOW (bf16-class) and the
            # replaced einsum ran HIGHEST — without it, near-threshold
            # pixels flip vs the reference path on real TPUs (invisible
            # to interpret-mode tests)
            logits = jax.lax.dot_general(
                t, wwt_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST
                           if col_precision == "highest"
                           else jax.lax.Precision.DEFAULT))  # [H, W]
        # flag arithmetic in i32 (Mosaic has no i8 vector add), one
        # truncating cast at the store
        b_lo = logits > thr - off
        b_m = logits > thr
        b_hi = logits > thr + off
        flags = (b_lo.astype(jnp.int32)
                 + b_m.astype(jnp.int32) * 2
                 + b_hi.astype(jnp.int32) * 4)
        o_ref[0, m] = flags.astype(jnp.uint8)
        if emit_stats:
            # per-axis partial reductions while the compares are live;
            # iota-masked accumulation into full-dim tiles (no slice
            # stores — Mosaic-robust). Row counts ≤ W, exact in f32.
            rows_any = jnp.max(b_m.astype(jnp.float32), axis=1,
                               keepdims=True)            # [H, 1]
            hi_rows = jnp.sum(b_hi.astype(jnp.float32), axis=1,
                              keepdims=True)             # [H, 1]
            lo_rows = jnp.sum(b_lo.astype(jnp.float32), axis=1,
                              keepdims=True)             # [H, 1]
            cols_any = jnp.max(b_m.astype(jnp.float32), axis=0,
                               keepdims=True)            # [1, W]
            rowst = rowst + jnp.where(lane16 == m, rows_any, 0.0) \
                + jnp.where(lane16 == 4 + m, hi_rows, 0.0) \
                + jnp.where(lane16 == 8 + m, lo_rows, 0.0)
            colst = colst + jnp.where(sub8 == m, cols_any, 0.0)
    if emit_stats:
        stat_refs[0][0] = rowst
        stat_refs[1][0] = colst


@partial(jax.jit, static_argnames=("thr", "off", "grid_hw", "interpret",
                                   "col_precision", "emit_stats"))
def fused_resize_flags(lowres_blk: jnp.ndarray, wh: jnp.ndarray,
                       ww: jnp.ndarray, thr: float, off: float,
                       grid_hw=None,
                       interpret: bool = False,
                       col_precision: str = "high",
                       emit_stats: bool = False):
    """Resize block-layout mask logits and threshold, fused.

    Args:
      lowres_blk: [Np, gh·gw, 16, M] decoder block-layout logits, where
        the 16 dim is (a1, b1, a2, b2) — decoder._upscale_masks_blocks.
      wh: [H, 4·gh] composed row-axis bilinear matrix whose column index
        is (i, a1, a2) = 4i + 2a1 + a2 (amg._decode_batch's ``wh``).
      ww: [W, 4·gw] same for columns, index (j, b1, b2).
      thr: mask_threshold; off: stability_score_offset.
      grid_hw: (gh, gw) token grid of the logits — gh < gw when the
        decoder skipped pad-row positions (decode_masks ``mask_rows``).
        Default: square, inferred from gh·gw.
      col_precision: MXU precision of the f32 column contraction —
        "high" (default; manual 3-pass bf16x3 split, ~2^-32 relative
        deltas), "highest" (6-pass, bit-matches the einsum reference) or
        "low" (1-pass bf16 truncation). Measured on TPU
        (scripts/ab_resize_prec.py, 4 interleaved rounds, 2026-08-20):
        high 1.12-1.16x faster than highest at a 4.1e-6 flag flip rate
        (flips only at exact threshold crossings of random-weight
        logits, whose margins are ~1e4x tighter than real checkpoints');
        low is 1.26-1.30x but flips 8.3e-4 — rejected.

      emit_stats: also return the per-axis reductions the AMG stats
        pass needs (see _resize_flags_kernel), accumulated in-kernel so
        the flag image is never re-read from HBM.

    Returns:
      [Np, M, H, W] uint8 flags (see module docstring); with
      ``emit_stats``, the tuple (flags, rowst [Np, H, 16] f32,
      colst [Np, 8, W] f32).
    """
    np_, gg, sixteen, n_masks = lowres_blk.shape
    assert sixteen == 16, lowres_blk.shape
    gh, g = grid_hw if grid_hw is not None else (math.isqrt(gg),) * 2
    assert gh * g == gg, (grid_hw, gg)
    h, w = wh.shape[0], ww.shape[0]

    # [n, i, j, a, b, c, d, m] → rows (i, a, c), cols (m, j, b, d): both
    # contractions become lane-aligned matmuls and the per-mask column
    # slice is contiguous.
    lx = lowres_blk.reshape(np_, gh, g, 2, 2, 2, 2, n_masks)
    lx = lx.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(
        np_, 4 * gh, n_masks * 4 * g)

    wh_d = jnp.asarray(wh, lowres_blk.dtype)             # match einsum path
    wwt = jnp.asarray(ww, jnp.float32).T

    assert col_precision in ("highest", "high", "low"), col_precision
    kernel = partial(_resize_flags_kernel, thr=float(thr), off=float(off),
                     n_masks=n_masks, col_precision=col_precision)
    out_specs = pl.BlockSpec((1, n_masks, h, w), lambda n: (n, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((np_, n_masks, h, w), jnp.uint8)
    if emit_stats:
        assert n_masks <= 4, n_masks    # lane layout: m / 4+m / 8+m
        out_specs = (out_specs,
                     pl.BlockSpec((1, h, 16), lambda n: (n, 0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, 8, w), lambda n: (n, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((np_, h, 16), jnp.float32),
                     jax.ShapeDtypeStruct((np_, 8, w), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(np_,),
        in_specs=[
            pl.BlockSpec((1, 4 * gh, n_masks * 4 * g), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 4 * gh), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * g, w), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(lx, wh_d, wwt)


def resize_flags_reference(lowres_blk: jnp.ndarray, wh: np.ndarray,
                           ww: np.ndarray, thr: float,
                           off: float, grid_hw=None) -> jnp.ndarray:
    """The XLA einsum chain the kernel replaces (amg._decode_batch's
    original math), emitting the same uint8 flags — the fallback for
    non-TPU backends and the kernel's parity oracle."""
    np_, gg, _, n_masks = lowres_blk.shape
    gh, g = grid_hw if grid_hw is not None else (math.isqrt(gg),) * 2
    assert gh * g == gg, (grid_hw, gg)
    h, w = wh.shape[0], ww.shape[0]
    wh_blk = jnp.asarray(wh.reshape(h, gh, 2, 2), lowres_blk.dtype)
    ww_blk = jnp.asarray(ww.reshape(w, g, 2, 2), jnp.float32)
    m = lowres_blk.reshape(-1, gh, g, 2, 2, 2, 2, n_masks)
    m = jnp.einsum("oiac,nijabcdm->nojbdm", wh_blk, m,
                   preferred_element_type=jnp.float32)
    m = jnp.einsum("pjbd,nojbdm->nmop", ww_blk, m.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    return ((m > thr - off).astype(jnp.uint8)
            + (m > thr).astype(jnp.uint8) * 2
            + (m > thr + off).astype(jnp.uint8) * 4)
