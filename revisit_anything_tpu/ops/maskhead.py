"""Fused SAM mask-production kernel: upscaler + hypernetwork in one pass.

The decoder's mask chain (mask_decoder.py:55-62,101-144 — ConvTranspose →
LayerNorm → GELU → ConvTranspose → GELU → per-mask-token hypernetwork
contraction) is, after the block-layout rewrite (decoder._upscale_masks_
blocks), a chain of three matmuls with elementwise ops between them. Run
as separate XLA ops it is the measured decode bottleneck: the [Np, 4096,
4·c1] and [Np, 4096, 16·c2] intermediates round-trip HBM (~1.6 GB per
128-prompt batch) and the final hypernetwork einsum lands in XLA's
batch-in-sublanes emitter (~9.2 M cycles/batch, compute-scheduler-bound).

This kernel holds one block of image-branch positions in VMEM and runs the
whole chain there; HBM traffic is exactly keys-in + mask-logits-out
(~320 MB per 128-prompt batch, >5x less). The tricks that make it a clean
Pallas kernel:

- both transposed convs have kernel == stride == 2 ⇒ zero spatial mixing:
  everything is per-position, so the kernel never needs neighbouring
  blocks (see decoder._upscale_masks_blocks);
- the channel LayerNorm runs over 4 groups of c1 lanes; its statistics
  are computed with two tiny matmuls against constant group-indicator
  matrices (Mosaic cannot cheaply reshape the lane dim);
- conv2, which acts independently per 2x2 block, becomes ONE matmul
  against a block-diagonal [4·c1, 16·c2] weight (3/4 zeros — the extra
  MXU flops are free, the layout change is not);
- the per-prompt hypernetwork weights enter as a block-diagonal
  [16·c2, 16·M] matrix built once per batch (tiny), so the contraction
  is a plain matmul emitting the (q, r, m) block layout directly.

Intermediates are rounded to the activation dtype at exactly the points
the XLA path rounds (bf16 stores), so kernel and fallback agree to bf16
rounding; with f32 params they agree to ~1e-6 (tested in interpret mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    # Mosaic has no erf primitive; Abramowitz & Stegun 7.1.28 — a degree-6
    # polynomial raised to the -16th power, max abs error 2.7e-7 (checked
    # against scipy over [0, 8]; gelu error ≤ 5e-7). Chosen over the
    # classic exp-based 7.1.26 because it needs NO transcendental: 6 FMAs
    # + 4 squarings + 1 reciprocal — the gelu was the kernel's measured
    # VPU bottleneck.
    a = jnp.abs(x)
    p = 1.0 + a * (0.0705230784 + a * (0.0422820123 + a * (
        0.0092705272 + a * (0.0001520143 + a * (
            0.0002765672 + a * 0.0000430638)))))
    p = p * p
    p = p * p
    p = p * p
    p = p * p                                    # p^16
    e = 1.0 - 1.0 / p
    return jnp.sign(x) * e


# _gelu: exact-form (erf) gelu matching jax.nn.gelu(approximate=False),
# via _erf's A&S 7.1.28 with two VPU-op reductions (same arithmetic, same
# ≤5e-7 gelu error):
#   - the 1/sqrt(2) argument scale is FOLDED into the polynomial
#     coefficients (c_k · 2^{-k/2}), so the poly runs on |x| directly;
#   - x·0.5·(1 + sign(x)·e) is rewritten 0.5·(x + |x|·e) — sign(x)·x = |x|
#     is already computed for the polynomial.
_GELU_C = [float(c * 2.0 ** (-(k + 1) / 2.0)) for k, c in enumerate(
    (0.0705230784, 0.0422820123, 0.0092705272, 0.0001520143,
     0.0002765672, 0.0000430638))]


def _gelu(x):
    a = jnp.abs(x)
    c1, c2, c3, c4, c5, c6 = _GELU_C
    p = 1.0 + a * (c1 + a * (c2 + a * (c3 + a * (c4 + a * (
        c5 + a * c6)))))
    p = p * p
    p = p * p
    p = p * p
    p = p * p                                    # p^16
    e = 1.0 - 1.0 / p
    return 0.5 * (x + a * e)


def _mask_head_kernel(keys_ref, up1w_ref, up2wbd_ref, hbd_ref, vecs_ref,
                      *refs, c1: int, eps: float, recon: bool = False,
                      ln_eps: float = 1e-6, ln_stats: str = "matmul"):
    """One (prompt, position-block) step.

    keys_ref:  [1, BLK, D]        image-branch activations (D = 4·c1) —
                                  with ``recon``, this is the SHARED img0
                                  block and the per-prompt branch is
                                  reconstructed here from the i2t
                                  probabilities (ops/decode_probs.py)
    up1w_ref:  [D, D]             conv1 weight (out = (2x2 block, c1))
    up2wbd_ref:[D, 16·c2]         block-diagonal conv2 weight
    hbd_ref:   [1, 16·c2, 16·M]   block-diagonal hypernetwork weights
    vecs_ref:  [8, D≥16·c2 cols]  packed constant rows (see _pack_vecs)
    refs (recon): p1 [1, HT, BLK], c1m [1, HT, D], p2, c2m,
                  bvecs [8, D] (rows 0-2 layer-1 b_out/ln scale/ln bias,
                  3-5 layer 2), then o_ref
    o_ref:     [1, BLK, 16·M]     mask logits, (q, r, m) minor-to-major m
    """
    if recon:
        p1_ref, c1m_ref, p2_ref, c2m_ref, bvecs_ref, o_ref = refs
        d = keys_ref.shape[2]
        y = keys_ref[0].astype(jnp.float32)              # img0 [BLK, D]
        for li, (p_ref, cm_ref) in enumerate(((p1_ref, c1m_ref),
                                              (p2_ref, c2m_ref))):
            a = jax.lax.dot_general(
                p_ref[0], cm_ref[0], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [BLK, D]
            y = y + a + bvecs_ref[3 * li + 0:3 * li + 1, :d].astype(
                jnp.float32)
            mu = jnp.mean(y, axis=1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(y * y, axis=1, keepdims=True) - mu * mu, 0.0)
            y = (y - mu) * jax.lax.rsqrt(var + ln_eps) \
                * bvecs_ref[3 * li + 1:3 * li + 2, :d].astype(jnp.float32) \
                + bvecs_ref[3 * li + 2:3 * li + 3, :d].astype(jnp.float32)
        x = y.astype(keys_ref.dtype)
    else:
        (o_ref,) = refs
        x = keys_ref[0]
    d = x.shape[1]
    up2_b = vecs_ref[3:4, :up2wbd_ref.shape[1]]
    o_ref[0] = mask_head_body(
        x, up1w_ref[...], up2wbd_ref[...], hbd_ref[0],
        vecs_ref[0:1, :d], vecs_ref[1:2, :d], vecs_ref[2:3, :d], up2_b,
        c1=c1, eps=eps, ln_stats=ln_stats).astype(o_ref.dtype)


def mask_head_body(x, up1w, up2wbd, hbd, up1_b, ln_scale, ln_bias, up2_b,
                   *, c1: int, eps: float, ln_stats: str = "matmul"):
    """The fused mask-head math on in-VMEM values: conv1 → group-LN →
    gelu → block-diag conv2 → gelu → hypernetwork matmul. Shared by the
    standalone mask-head kernels here and by the decode tail's
    emit_logits mode (ops/decode_fused.py), so the two paths cannot
    drift numerically.

    x [BLK, D]; up1w [D, D]; up2wbd [D, 16·c2]; hbd [16·c2, 16·M];
    up1_b/ln_scale/ln_bias [1, D]; up2_b [1, 16·c2] → [BLK, 16·M] f32.

    ln_stats: how the group-LN statistics are computed — "matmul"
    (indicator matmuls, 4 extra MXU dots ≈ 1/3 of the kernel's tile-ops)
    or "vpu" (lane-slice reductions + iota-select broadcast-backs, zero
    MXU; A/B hook — scripts/ab_maskhead_lnstats.py). f32 sum-order
    differs between the two at the ~1e-7 level.
    """
    d = x.shape[1]
    dtype = x.dtype
    ln_scale = ln_scale.astype(jnp.float32)
    ln_bias = ln_bias.astype(jnp.float32)

    y1 = jax.lax.dot_general(
        x, up1w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype) + up1_b

    # group LayerNorm: 4 lane-groups of c1.
    yf = y1.astype(jnp.float32)
    n_groups = d // c1
    if ln_stats == "vpu":
        blk = yf.shape[0]
        lane_g = jax.lax.broadcasted_iota(jnp.int32, (blk, d), 1) // c1
        yf2 = yf * yf
        mub = jnp.zeros_like(yf)
        varb = jnp.zeros_like(yf)
        for g in range(n_groups):
            sl = yf[:, g * c1:(g + 1) * c1]
            sl2 = yf2[:, g * c1:(g + 1) * c1]
            mu_g = jnp.sum(sl, axis=1, keepdims=True) / c1    # [BLK, 1]
            ex2_g = jnp.sum(sl2, axis=1, keepdims=True) / c1
            var_g = ex2_g - mu_g * mu_g
            mub = mub + jnp.where(lane_g == g, mu_g, 0.0)
            varb = varb + jnp.where(lane_g == g, var_g, 0.0)
    else:
        # stats via indicator matmuls (Mosaic cannot cheaply reshape the
        # lane dim).
        giota = jax.lax.broadcasted_iota(jnp.int32, (d, n_groups), 0) // c1
        gcol = jax.lax.broadcasted_iota(jnp.int32, (d, n_groups), 1)
        gmat = (giota == gcol).astype(jnp.float32) / c1  # [D, 4] mean map
        mu = jax.lax.dot_general(yf, gmat, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ex2 = jax.lax.dot_general(yf * yf, gmat, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        var = ex2 - mu * mu                               # [BLK, 4]
        gt = (giota == gcol).astype(jnp.float32)          # [D, 4]
        mub = jax.lax.dot_general(mu, gt, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        varb = jax.lax.dot_general(var, gt, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    yn = (yf - mub) * jax.lax.rsqrt(varb + eps) * ln_scale + ln_bias
    h1 = _gelu(yn).astype(dtype)

    y2 = jax.lax.dot_general(
        h1, up2wbd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype) + up2_b
    h2 = _gelu(y2.astype(jnp.float32)).astype(dtype)

    return jax.lax.dot_general(
        h2, hbd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pick_block(gg: int, block: int, lane: int = 1) -> int:
    """Largest divisor of ``gg`` that is ≤ ``block`` and a multiple of
    ``lane``.

    ``lane=128`` is REQUIRED for any block that lands in the MINOR dim of
    a Pallas ref (the probs path's p1/p2 [Np, HT, gg] blocks): Mosaic
    rejects minor block dims not divisible by 128 unless they equal the
    full array dim. content-restricted grids are therefore rounded to a
    multiple of 128 upstream (amg.resize_mats_and_rows), e.g. 50·64 =
    3200 → blk 640. Falls back to the unconstrained divisor when no
    lane-multiple divides ``gg`` (tiny interpret-mode grids, where the
    single block equals the full array dim and is exempt)."""
    blk = min(block, gg)
    if lane > 1 and gg % lane == 0:
        blk = max((blk // lane) * lane, lane)
        while gg % blk:
            blk -= lane
        return blk
    while gg % blk:
        blk -= 1
    # The fallback only exists for grids the lane constraint exempts (the
    # single block spans the full dim). Any other outcome would hit an
    # opaque Mosaic lowering error on TPU — fail here with a clear one.
    assert blk == gg or blk % lane == 0, (
        f"_pick_block: grid dim {gg} admits no lane-{lane}-divisible block "
        f"≤ {block} (got {blk}); round the content dim to a multiple of "
        f"{lane} upstream (amg.resize_mats_and_rows)")
    return blk


@partial(jax.jit, static_argnames=("c1", "eps", "ln_eps", "block",
                                   "content", "interpret"))
def _mask_head_call_probs(img0, p1, c1m, p2, c2m, bvecs, up1w, up2wbd, hbd,
                          vecs, c1: int, eps: float, ln_eps: float,
                          block: int, content: int, interpret: bool):
    """Recon variant: img0 [1, gg, D] shared; p1/p2 [Np, HT, gg]
    transposed probabilities; c1m/c2m [Np, HT, D].

    ``content``: number of LEADING positions to compute (≤ gg) — the
    grid simply stops early; trailing (pad-row) blocks of every input
    are never read and no slice copies are made."""
    np_ = p1.shape[0]
    gg, d = img0.shape[1], img0.shape[2]
    ht = p1.shape[1]
    n_out = hbd.shape[2]
    kernel = partial(_mask_head_kernel, c1=c1, eps=eps, recon=True,
                     ln_eps=ln_eps)
    return pl.pallas_call(
        kernel,
        grid=(np_, content // block),
        in_specs=[
            pl.BlockSpec((1, block, d), lambda n, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda n, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(up2wbd.shape, lambda n, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + hbd.shape[1:], lambda n, i: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(vecs.shape, lambda n, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, block), lambda n, i: (n, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, d), lambda n, i: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, block), lambda n, i: (n, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, d), lambda n, i: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bvecs.shape, lambda n, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, n_out), lambda n, i: (n, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, content, n_out), img0.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(img0, up1w, up2wbd, hbd, vecs, p1, c1m, p2, c2m, bvecs)


@partial(jax.jit, static_argnames=("c1", "eps", "block", "content",
                                   "interpret", "ln_stats"))
def _mask_head_call(keys, up1w, up2wbd, hbd, vecs, c1: int, eps: float,
                    block: int, content: int, interpret: bool,
                    ln_stats: str = "matmul"):
    np_, gg, d = keys.shape
    n_out = hbd.shape[2]
    kernel = partial(_mask_head_kernel, c1=c1, eps=eps, ln_stats=ln_stats)
    return pl.pallas_call(
        kernel,
        grid=(np_, content // block),
        in_specs=[
            pl.BlockSpec((1, block, d), lambda n, i: (n, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda n, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(up2wbd.shape, lambda n, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + hbd.shape[1:], lambda n, i: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(vecs.shape, lambda n, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, n_out), lambda n, i: (n, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, content, n_out), keys.dtype),
        interpret=interpret,
    )(keys, up1w, up2wbd, hbd, vecs)


def conv2_blockdiag(up2_w: jnp.ndarray, c1: int, c2: int) -> jnp.ndarray:
    """conv2 as one block-diagonal [4·c1, 16·c2] matmul over the
    (2x2-block, c1) lanes (3/4 zeros — extra MXU flops are free, the
    layout change is not)."""
    up2wbd = jnp.zeros((4 * c1, 16 * c2), up2_w.dtype)
    for q in range(4):
        up2wbd = up2wbd.at[q * c1:(q + 1) * c1,
                           q * 4 * c2:(q + 1) * 4 * c2].set(up2_w)
    return up2wbd


def pack_mask_head_vecs(up1_b, ln_scale, ln_bias, up2_b, c1: int, c2: int,
                        dtype) -> jnp.ndarray:
    """Packed constant rows the mask-head body reads: row 0 = tiled
    conv1 bias, 1/2 = tiled LN scale/bias, 3 = tiled conv2 bias."""
    ncols = max(4 * c1, 16 * c2)
    vecs = jnp.zeros((8, ncols), dtype)
    vecs = vecs.at[0, :4 * c1].set(jnp.tile(up1_b, 4))
    vecs = vecs.at[1, :4 * c1].set(jnp.tile(ln_scale, 4))
    vecs = vecs.at[2, :4 * c1].set(jnp.tile(ln_bias, 4))
    vecs = vecs.at[3, :16 * c2].set(jnp.tile(up2_b, 16))
    return vecs


def fused_mask_head(keys: jnp.ndarray, hyper: jnp.ndarray,
                    up1_w: jnp.ndarray, up1_b: jnp.ndarray,
                    ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
                    up2_w: jnp.ndarray, up2_b: jnp.ndarray,
                    eps: float = 1e-6,
                    block: int = None,
                    content: int = None,
                    interpret: bool = False,
                    ln_stats: str = "matmul") -> jnp.ndarray:
    """Mask logits in block layout via the fused kernel.

    block default (None) = ONE position block per prompt when content
    ≤ 3200, else 2048: scripts/probe_maskside2.py (2026-08-20, b=256 ×4,
    three interleaved rounds) measures the one-step blk 3200 at
    45.6-45.9 ms/query vs blk2048's 46.4-48.9 at the loaded window,
    outputs BIT-identical — the same largest-legal-block result as the
    probs-path A/B. A single 4096-position step (the no-pad-skip SFXL/
    AmsterTime content) CRASHES the Mosaic compile helper
    (scripts/probe_mh4096_compile.py, caught by the r5 compile sweep) —
    those shapes keep 2048.

    Args:
      keys: [Np, gg, D] final image-branch activations (D = 4·c1).
      hyper: [Np, M, c2] hypernetwork weights (M mask tokens).
      up1_w: [D, 4·c1] conv1 weight; up1_b: [c1].
      ln_scale, ln_bias: [c1] channel-LN params.
      up2_w: [c1, 4·c2]; up2_b: [c2].
      content: compute only the first ``content`` positions (pad-row
        skipping — decoder.decode_masks ``mask_rows``); default all.
    Returns:
      [Np, content, 16, M] mask logits, where dim 2 = (q, r) =
      (2a1+b1, 2a2+b2) — i.e. `out[..., q, r, m]` equals
      decoder._upscale_masks_blocks' `[n, m, pos, q, r]` transposed to
      mask-token-minor.
    """
    np_, gg, d = keys.shape
    c1 = up1_w.shape[1] // 4
    c2 = up2_w.shape[1] // 4
    m_tok = hyper.shape[1]

    content = gg if content is None else content
    assert content <= gg, (content, gg)
    if block is None:
        block = content if content <= 3200 else 2048
    # keys blocks carry blk in their SECOND-minor dim — Mosaic's native
    # sublane tile is 8 for 4-byte dtypes, 16 for 2-byte (bf16).
    blk = _pick_block(content, block,
                      lane=8 if keys.dtype.itemsize == 4 else 16)

    up2wbd = conv2_blockdiag(up2_w, c1, c2)

    # hypernetwork as per-prompt block-diagonal [16·c2, 16·M]
    eye16 = jnp.eye(16, dtype=hyper.dtype)
    hbd = jnp.einsum("qs,nmc->nqcsm", eye16, hyper).reshape(
        np_, 16 * c2, 16 * m_tok).astype(keys.dtype)

    vecs = pack_mask_head_vecs(up1_b, ln_scale, ln_bias, up2_b, c1, c2,
                               keys.dtype)

    out = _mask_head_call(keys, up1_w, up2wbd, hbd, vecs, c1, float(eps),
                          blk, content, interpret, ln_stats=ln_stats)
    return out.reshape(np_, content, 16, m_tok)


def fused_mask_head_probs(img0: jnp.ndarray, p1: jnp.ndarray,
                          c1m: jnp.ndarray, p2: jnp.ndarray,
                          c2m: jnp.ndarray, branch_rows: jnp.ndarray,
                          hyper: jnp.ndarray,
                          up1_w: jnp.ndarray, up1_b: jnp.ndarray,
                          ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
                          up2_w: jnp.ndarray, up2_b: jnp.ndarray,
                          eps: float = 1e-6,
                          ln_eps: float = 1e-6,
                          block: int = 4096,
                          content: int = None,
                          interpret: bool = False) -> jnp.ndarray:
    """fused_mask_head with the per-prompt branch RECONSTRUCTED in-kernel
    from the i2t probabilities (ops/decode_probs.py) — the materialized
    [Np, gg, D] branch never exists in HBM.

    Args beyond fused_mask_head:
      img0: [1, gg, D] shared branch input (image embedding + dense
        prompt), NORMAL layout.
      p1, p2: [Np, HT, gg] transposed probabilities.
      c1m, c2m: [Np, HT, D] per-prompt C = V^bd @ W_out.
      branch_rows: [8, D] ROW-packed branch constants — rows 0-2 =
        layer-1 b_out / ln scale / ln bias, rows 3-5 = layer 2.
      ln_eps: the branch LayerNorm epsilon (decoder cfg.eps).
      content: compute only the first ``content`` positions — the grid
        stops before the pad-row blocks; p1/p2/img0 stay full-size with
        their trailing blocks simply never read (no slice copies).

    block default 4096 = ONE position block per prompt: the TPU A/B
    (scripts/ab_maskhead_block.py) measures blk 3200 ~4% faster than 640
    at content 3200 and 4096 ≈ 2048 within noise at full content, at a
    measured-safe ~30 MB VMEM peak.
    """
    np_ = p1.shape[0]
    gg, d = img0.shape[1], img0.shape[2]
    c1 = up1_w.shape[1] // 4
    c2 = up2_w.shape[1] // 4
    m_tok = hyper.shape[1]
    content = gg if content is None else content
    assert content <= gg, (content, gg)
    # p1/p2 blocks carry blk in their MINOR dim — Mosaic needs it
    # 128-divisible (amg.resize_mats_and_rows rounds content to match).
    blk = _pick_block(content, block, lane=128)

    up2wbd = jnp.zeros((4 * c1, 16 * c2), up2_w.dtype)
    for q in range(4):
        up2wbd = up2wbd.at[q * c1:(q + 1) * c1,
                           q * 4 * c2:(q + 1) * 4 * c2].set(up2_w)
    eye16 = jnp.eye(16, dtype=hyper.dtype)
    hbd = jnp.einsum("qs,nmc->nqcsm", eye16, hyper).reshape(
        np_, 16 * c2, 16 * m_tok).astype(img0.dtype)
    ncols = max(4 * c1, 16 * c2)
    vecs = jnp.zeros((8, ncols), img0.dtype)
    vecs = vecs.at[0, :4 * c1].set(jnp.tile(up1_b, 4))
    vecs = vecs.at[1, :4 * c1].set(jnp.tile(ln_scale, 4))
    vecs = vecs.at[2, :4 * c1].set(jnp.tile(ln_bias, 4))
    vecs = vecs.at[3, :16 * c2].set(jnp.tile(up2_b, 16))

    out = _mask_head_call_probs(img0, p1, c1m, p2, c2m,
                                branch_rows.astype(img0.dtype),
                                up1_w, up2wbd, hbd, vecs, c1, float(eps),
                                float(ln_eps), blk, content, interpret)
    return out.reshape(np_, content, 16, m_tok)
