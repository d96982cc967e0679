"""Pallas attention kernels for the hot global-attention layers.

SAM ViT-H's 4 global layers attend over 64x64 = 4096 tokens; the XLA path
materializes [heads, 4096, 4096] score tensors in HBM twice per layer (the
measured encoder bottleneck). This kernel streams q blocks against K/V held
in VMEM (4096x128 bf16 K+V ≈ 2 MB — fits comfortably), computing scores
and softmax entirely on-chip. SAM's decomposed relative-position bias
(bias[q, k] = bias_h[q, kh] + bias_w[q, kw], image_encoder.py:325-361)
collapses to two small [N, side] tensors that also live in VMEM, applied by
a reshape — no [N, N] bias tensor exists anywhere.

Use `attend()` — it pads head_dim/sequence to tile multiples, handles the
no-bias case (DINOv2), and falls back to the pure-XLA path on non-TPU
backends.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, eh_ref, ew_ref,
                 o_ref, *, valid_len: int, scale: float,
                 use_bias: bool):
    """One (batch*head, q-block) step: scores [bq, N] in VMEM, softmax,
    output [bq, D]."""
    q = q_ref[0]                       # [bq, D]
    k = k_ref[0]                       # [N, D]
    v = v_ref[0]                       # [N, D]
    n = k.shape[0]
    bq = q.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [bq, N]

    if use_bias:
        # bias[q, k] = bh[q, k // side] + bw[q, k % side]; expanded to
        # [bq, N] with two 0/1 expansion matmuls (Mosaic cannot reshape
        # the lane dim to [side, side]).
        bh = bh_ref[0].astype(jnp.float32)               # [bq, sideb]
        bw = bw_ref[0].astype(jnp.float32)
        s = s + jax.lax.dot_general(
            bh, eh_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(
            bw, ew_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if valid_len < n:
        kidx = jax.lax.broadcasted_iota(jnp.int32, (bq, n), 1)
        s = jnp.where(kidx < valid_len, s, _NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    z = jnp.sum(e, axis=1, keepdims=True)
    p = (e / z).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, static_argnames=("side", "block_q", "interpret", "scale",
                                   "valid_len"))
def _flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     bias_h: Optional[jnp.ndarray],
                     bias_w: Optional[jnp.ndarray],
                     side: int = 0,
                     block_q: int = 256,
                     interpret: bool = False,
                     scale: float = 1.0,
                     valid_len: int = 0) -> jnp.ndarray:
    """q/k/v: [BH, N, D] (D multiple of 128, N multiple of block_q after
    caller padding). bias_h/bias_w: [BH, N, side] or None."""
    bh_, n, d = q.shape
    use_bias = bias_h is not None

    if not use_bias:
        # one dummy block with a constant index map — a full [BH, N, 128]
        # zero tensor would be DMA'd into VMEM on every grid step for a
        # kernel that never reads it
        bias_h = jnp.zeros((1, block_q, 128), q.dtype)
        bias_w = bias_h

    grid = (bh_, n // block_q)
    sideb = bias_h.shape[2]
    bias_map = ((lambda b, i: (b, i, 0)) if use_bias
                else (lambda b, i: (0, 0, 0)))

    # 0/1 expansion maps: eh[i, k] = [k // side == i], ew[j, k] = [k % side
    # == j]; zero rows for the sideb padding.
    eh = np.zeros((sideb, n), np.float32)
    ew = np.zeros((sideb, n), np.float32)
    if use_bias:
        ks = np.arange(side * side)
        eh[ks // side, ks] = 1.0
        ew[ks % side, ks] = 1.0

    # (the side-based indexing lives entirely in the precomputed eh/ew
    # expansion matrices — the kernel body never needs `side`)
    kernel = partial(_attn_kernel,
                     valid_len=valid_len, scale=scale, use_bias=use_bias)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, sideb), bias_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, sideb), bias_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sideb, n), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sideb, n), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh_, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias_h, bias_w, jnp.asarray(eh), jnp.asarray(ew))


def _token_attn_kernel(q_ref, kt_ref, vt_ref, o_ref, *, heads: int,
                       hd: int, scale: float):
    """One batch element: few token queries attend to M image keys for all
    heads. k/v arrive TRANSPOSED [H*hd, M] so the 16-wide head dim lives
    in sublanes (a [*, M, hd] layout would pad hd 16→128 lanes: 8x the
    DMA traffic — measured 3x slowdown)."""
    q = q_ref[0]                        # [n_pad, H*hd]
    kt = kt_ref[0]                      # [H*hd, M]
    vt = vt_ref[0]
    for h in range(heads):
        qh = q[:, h * hd:(h + 1) * hd]              # [n_pad, hd]
        kh = kt[h * hd:(h + 1) * hd, :]             # [hd, M]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [n_pad, M]
        mx = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - mx)
        z = jnp.sum(e, axis=1, keepdims=True)
        p = (e / z).astype(vt_ref.dtype)
        vh = vt[h * hd:(h + 1) * hd, :]             # [hd, M]
        oh = jax.lax.dot_general(
            p, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # [n_pad, hd]
        o_ref[0, :, h * hd:(h + 1) * hd] = oh.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("heads", "hd", "scale", "interpret",
                                   "kv_shared"))
def _token_cross(q, kt, vt, heads: int, hd: int, scale: float,
                 interpret: bool, kv_shared: bool):
    b = q.shape[0]
    n = q.shape[1]
    d = q.shape[2]
    m = kt.shape[2]
    kernel = partial(_token_attn_kernel, heads=heads, hd=hd,
                     scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, m),
                         (lambda i: (0, 0, 0)) if kv_shared
                         else (lambda i: (i, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, m),
                         (lambda i: (0, 0, 0)) if kv_shared
                         else (lambda i: (i, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        interpret=interpret,
    )(q, kt, vt)


def token_cross_attend(q: jnp.ndarray, kt: jnp.ndarray, vt: jnp.ndarray,
                       heads: int) -> jnp.ndarray:
    """Fused multi-head cross attention for FEW queries against MANY
    keys, with k/v supplied TRANSPOSED — the SAM-decoder tokens→image
    direction (n≈7 tokens, M=4096 image positions, head_dim 16).

    Args:
      q: [B, n, H*hd] projected queries (heads concatenated on the lane
        dim, the projection's natural output).
      kt, vt: [B or 1, H*hd, M] projected keys/values, transposed — emit
        them via einsum("dk,bmd->bkm", W, x) so the transpose rides the
        projection matmul instead of a relayout. B==1 means shared across
        the batch (indexed, not broadcast).

    Returns [B, n, H*hd]. Scores/probs stay in VMEM; per-(batch) step DMA
    is exactly the payload bytes (no lane padding of the head dim).
    """
    b, n, d = q.shape
    hd = d // heads
    scale = 1.0 / float(np.sqrt(hd))
    n_pad = _round_up(n, 8)
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    out = _token_cross(q, kt, vt, heads, hd, scale, interpret,
                       kt.shape[0] == 1)
    return out[:, :n]


def _i2t_kernel(img_ref, peq_ref, kbd_ref, vbd_ref, w_ref, vecs_ref,
                *refs, n_tok: int, scale: float, eps: float,
                emit_kv: bool = False):
    """One (m-block, prompt) step of the fused image→tokens update:
    q-projection + multi-head softmax over the few token keys + output
    projection + residual + LayerNorm, image block resident in VMEM.

    All heads run in single matmuls: token keys/values arrive as
    block-diagonal matrices (head h occupies lane group h·T..h·T+T and
    channel group h·hd..), and softmax stability uses a PER-HEAD row max
    (a global row max looks tempting — exp stays ≤ 1 — but a head whose
    logits sit >~88 below the strongest head's would underflow to 0/0
    NaN; the per-head shift cancels exactly in p = e/zb). Per-head sums
    come from one group-indicator matmul — no lane reshapes or concats
    anywhere.

    img_ref:  [1, BLK, D]   image branch block (shared or per-prompt)
    peq_ref:  [1, BLK, DA]  pre-projected positional term W_q·pe
    kbd_ref:  [1, DA, H·T]  block-diagonal projected token keys
    vbd_ref:  [1, H·T, DA]  block-diagonal projected token values
    w_ref:    [D+DA, max]   rows 0:D cols :DA = W_q, rows D: cols :D =
                            W_out (cross-attention downsamples: DA = D/2
                            for SAM, transformer.py Attention)
    vecs_ref: [8, D]        packed rows: b_q (:DA), b_out, ln_s, ln_b
    o_ref:    [1, BLK, D]   LN(img + attn_out)

    With emit_kv, refs = (wkvt_ref [2·DA2, D], o_ref, kvt_ref): the kernel
    ALSO emits the NEXT attention's raw k|v projections of the updated
    branch, TRANSPOSED ([1, 2·DA2, BLK] — the layout token_cross_attend_kv
    consumes), via a dot that contracts both minor dims; the separate
    projection pass over the [B, M, D] branch and its relayout never
    happen.
    """
    if emit_kv:
        wkvt_ref, o_ref, kvt_ref = refs
    else:
        (o_ref,) = refs
    x = img_ref[0]
    d = x.shape[1]
    dtype = x.dtype
    ht = kbd_ref.shape[2]                                 # H·T
    da = kbd_ref.shape[1]                                 # attention dim
    n_heads = ht // n_tok

    q = jax.lax.dot_general(
        x, w_ref[:d, :da], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    q = (q + peq_ref[0].astype(jnp.float32)
         + vecs_ref[0:1, :da].astype(jnp.float32))        # [BLK, DA]
    q = q.astype(dtype)

    s = jax.lax.dot_general(
        q, kbd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # [BLK, H·T]
    # PER-HEAD row max (a global row max underflows exp to 0 for a head
    # whose logits sit >~88 below the strongest head's → 0/0 NaN; the
    # per-head shift cancels in p = e/zb exactly)
    head_of_lane = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    // n_tok)
    mx = jnp.full_like(s, -jnp.inf)
    for h in range(n_heads):
        in_h = head_of_lane == h
        m_h = jnp.max(jnp.where(in_h, s, -jnp.inf), axis=1, keepdims=True)
        mx = jnp.where(in_h, m_h, mx)
    e = jnp.exp(s - mx)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ht, n_heads), 0) // n_tok
    grp = jax.lax.broadcasted_iota(jnp.int32, (ht, n_heads), 1)
    g = (lane == grp).astype(jnp.float32)                 # [H·T, H]
    z = jax.lax.dot_general(e, g, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    zb = jax.lax.dot_general(z, g, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    p = (e / zb).astype(dtype)                            # [BLK, H·T]
    attn = jax.lax.dot_general(
        p, vbd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)  # [BLK, DA]

    out = jax.lax.dot_general(
        attn, w_ref[d:, :d], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype) \
        + vecs_ref[1:2, :]

    y = (x + out).astype(jnp.float32)                     # residual
    mu = jnp.mean(y, axis=1, keepdims=True)
    # one-pass variance can go slightly negative from f32 cancellation
    # (|mean| >> std) and NaN through rsqrt — clamp like jnp.var can't
    var = jnp.maximum(jnp.mean(y * y, axis=1, keepdims=True) - mu * mu,
                      0.0)
    y = (y - mu) * jax.lax.rsqrt(var + eps) \
        * vecs_ref[2:3, :].astype(jnp.float32) \
        + vecs_ref[3:4, :].astype(jnp.float32)
    yd = y.astype(o_ref.dtype)
    o_ref[0] = yd

    if emit_kv:
        # transposed-output projection: contract BOTH minor dims — the
        # MXU emits [2·DA2, BLK] directly, no relayout anywhere
        kvt_ref[0] = jax.lax.dot_general(
            wkvt_ref[...], yd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(kvt_ref.dtype)


@partial(jax.jit, static_argnames=("n_tok", "eps", "block", "shared_img",
                                   "interpret"))
def _i2t_call(img, peq, kbd, vbd, w, vecs, n_tok: int, eps: float,
              block: int, shared_img: bool, interpret: bool, wkvt=None):
    b = kbd.shape[0]
    m = img.shape[1]
    d = img.shape[2]
    da = kbd.shape[1]
    ht = kbd.shape[2]
    hd = da // (ht // n_tok)
    emit_kv = wkvt is not None
    kernel = partial(_i2t_kernel, n_tok=n_tok,
                     scale=1.0 / float(np.sqrt(hd)), eps=eps,
                     emit_kv=emit_kv)
    in_specs = [
        pl.BlockSpec((1, block, d),
                     (lambda i, bb: (0, i, 0)) if shared_img
                     else (lambda i, bb: (bb, i, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block, da), lambda i, bb: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, da, ht), lambda i, bb: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ht, da), lambda i, bb: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w.shape, lambda i, bb: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, d), lambda i, bb: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, block, d), lambda i, bb: (bb, i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, m, d), img.dtype)
    args = [img, peq, kbd, vbd, w, vecs]
    if emit_kv:
        dkv = wkvt.shape[0]
        in_specs.append(pl.BlockSpec(wkvt.shape, lambda i, bb: (0, 0),
                                     memory_space=pltpu.VMEM))
        out_spec = (out_spec,
                    pl.BlockSpec((1, dkv, block), lambda i, bb: (bb, 0, i),
                                 memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b, dkv, m), img.dtype))
        args.append(wkvt)
    return pl.pallas_call(
        kernel,
        # m-blocks outer, prompts inner: a shared image block is DMA'd
        # once and reused for every prompt
        grid=(m // block, b),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _token_attn_kv_kernel(q_ref, kvt_ref, pek_ref, vb_ref, o_ref, *,
                          heads: int, hd: int, scale: float,
                          group: int):
    """Like _token_attn_kernel but k/v arrive CONCATENATED ([G, 2D, M],
    one projection pass over the image branch instead of two) with the
    positional term and value bias folded in here, inside VMEM. ``group``
    prompts run per grid step (one step per prompt drowned in per-step
    DMA/setup overhead)."""
    d = heads * hd
    pe = pek_ref[0]
    vb = vb_ref[...][:, 0:1]
    for g in range(group):
        kv = kvt_ref[g] if kvt_ref.shape[0] > 1 else kvt_ref[0]
        kt = kv[:d] + pe
        vt = kv[d:] + vb
        q = q_ref[g]                    # [n_pad, D]
        for h in range(heads):
            qh = q[:, h * hd:(h + 1) * hd]
            kh = kt[h * hd:(h + 1) * hd, :]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [n_pad, M]
            mx = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - mx)
            z = jnp.sum(e, axis=1, keepdims=True)
            p = (e / z).astype(kvt_ref.dtype)
            vh = vt[h * hd:(h + 1) * hd, :]
            oh = jax.lax.dot_general(
                p, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[g, :, h * hd:(h + 1) * hd] = oh.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("heads", "hd", "scale", "interpret",
                                   "kv_shared"))
def _token_cross_kv(q, kvt, pek, vb, heads: int, hd: int, scale: float,
                    interpret: bool, kv_shared: bool):
    b, n, d = q.shape
    m = kvt.shape[2]
    # group size bounded by VMEM: per-prompt kv block is 2·d·m bytes
    # (bf16) and Pallas double-buffers inputs; stay within ~48 MB scoped
    # vmem (v5e has 128 MB physical; the 16 MB default is conservative)
    kv_bytes = 2 * d * m * q.dtype.itemsize
    group = next((g for g in (8, 4, 2, 1)
                  if b % g == 0 and (1 if kv_shared else g)
                  * kv_bytes * 2 <= 48 * 1024 * 1024), None)
    if group is None:
        raise ValueError(
            f"token-cross k|v block ({kv_bytes / 2 ** 20:.0f} MB per "
            f"prompt, d={d}, m={m}) exceeds the 48 MB VMEM budget even "
            "ungrouped — reduce the image-branch width or sequence")
    kernel = partial(_token_attn_kv_kernel, heads=heads, hd=hd,
                     scale=scale, group=group)
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((group, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * d, m) if kv_shared
                         else (group, 2 * d, m),
                         (lambda i: (0, 0, 0)) if kv_shared
                         else (lambda i: (i, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, m), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        interpret=interpret,
    )(q, kvt, pek, vb)


def token_cross_attend_kv(q: jnp.ndarray, kvt: jnp.ndarray,
                          pe_kt: jnp.ndarray, v_bias: jnp.ndarray,
                          heads: int) -> jnp.ndarray:
    """token_cross_attend with k/v emitted by ONE projection pass:
    ``kvt`` [B or 1, 2D, M] stacks the transposed k then v projections
    (concatenate W_k|W_v on the output axis of the projection einsum);
    ``pe_kt`` [1, D, M] (k positional term) and ``v_bias`` [D] are added
    inside the kernel, so the image branch is read once and nothing else
    is materialized."""
    b, n, d = q.shape
    hd = d // heads
    scale = 1.0 / float(np.sqrt(hd))
    n_pad = _round_up(n, 8)
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    vb = v_bias.reshape(d, 1).astype(kvt.dtype)
    out = _token_cross_kv(q, kvt, pe_kt.astype(kvt.dtype), vb, heads, hd,
                          scale, interpret, kvt.shape[0] == 1)
    return out[:, :n]


def i2t_update(img: jnp.ndarray, peq: jnp.ndarray, tok_k: jnp.ndarray,
               tok_v: jnp.ndarray, w_q: jnp.ndarray, b_q: jnp.ndarray,
               w_out: jnp.ndarray, b_out: jnp.ndarray,
               ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
               heads: int, eps: float = 1e-6, block: int = 0,
               interpret: Optional[bool] = None,
               w_kv_next: Optional[jnp.ndarray] = None):
    """Fused image→tokens attention + residual + LayerNorm (the SAM
    two-way block's keys update, transformer.py TwoWayAttentionBlock
    cross_attn_image_to_token + norm4).

    Args:
      img: [B, M, D] per-prompt image branch, or [1, M, D] shared
        (layer 1 — every prompt reads the same image state).
      peq: [1, M, DA] pre-projected positional term W_q·pe (the '+pe'
        folded past the projection: W(x+pe) = Wx + W·pe). DA is the
        attention-internal dim (D/2 for SAM's downsampled cross-attns).
      tok_k, tok_v: [B, T, DA] ALREADY-PROJECTED token keys/values
        (tiny — projected outside with plain matmuls).
      w_q [D, DA], b_q [DA], w_out [DA, D], b_out [D]: projections.
      ln_scale, ln_bias: norm4 parameters.
      w_kv_next: optional [D, 2·DA2] concatenated W_k|W_v of the NEXT
        tokens→image attention; when given, returns (keys', kvt) where
        kvt [B, 2·DA2, M] is the raw transposed projection of keys' —
        feed it straight to token_cross_attend_kv.

    Returns LN(img + Attn(img)) [B, M, D]. The naive XLA path writes the
    q-projection, [B, H, M, T] logits, attention output, out-projection,
    residual and LN each to HBM (~6 GB per 256-prompt batch); here the
    image block stays in VMEM for the whole update (read-img + write-out
    only).
    """
    b, t, da = tok_k.shape             # da = attention dim (D/2 for SAM)
    d = img.shape[2]
    hd = da // heads
    m = img.shape[1]
    if block <= 0:
        # measured on v5e: per-prompt branches want big blocks (fewer
        # grid steps dominate), the shared layer-1 branch peaks earlier
        block = 2048 if img.shape[0] > 1 else 1024
    blk = min(block, m)
    assert m % blk == 0, (m, blk)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # block-diagonal per-prompt token k/v (tiny): head h occupies row
    # group h·hd.. and column group h·T.. of kbd [B, DA, H·T] (and the
    # transpose layout for vbd [B, H·T, DA])
    eye = jnp.eye(heads, dtype=tok_k.dtype)
    kt = tok_k.reshape(b, t, heads, hd)
    kbd = jnp.einsum("hg,bthd->bhdgt", eye, kt).reshape(
        b, da, heads * t).astype(img.dtype)
    vt = tok_v.reshape(b, t, heads, hd)
    vbd = jnp.einsum("hg,bthd->bgthd", eye, vt).reshape(
        b, heads * t, da).astype(img.dtype)

    # pack the rectangular projections into one [D+DA, max(D, DA)] array
    wmax = max(d, da)
    w = jnp.zeros((d + da, wmax), img.dtype)
    w = w.at[:d, :da].set(w_q.astype(img.dtype))
    w = w.at[d:, :d].set(w_out.astype(img.dtype))
    vecs = jnp.zeros((8, d), img.dtype)
    vecs = vecs.at[0, :da].set(b_q.astype(img.dtype))
    vecs = vecs.at[1].set(b_out.astype(img.dtype))
    vecs = vecs.at[2].set(ln_scale.astype(img.dtype))
    vecs = vecs.at[3].set(ln_bias.astype(img.dtype))
    wkvt = (None if w_kv_next is None
            else jnp.transpose(w_kv_next, (1, 0)).astype(img.dtype))
    return _i2t_call(img, peq, kbd, vbd, w, vecs, t, float(eps), blk,
                     img.shape[0] == 1, interpret, wkvt=wkvt)


def attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
           bias_h: Optional[jnp.ndarray] = None,
           bias_w: Optional[jnp.ndarray] = None,
           side: int = 0,
           block_q: int = 256) -> jnp.ndarray:
    """Attention over [B, H, N, Dh] with optional decomposed rel-pos bias.

    Args:
      q, k, v: [B, H, N, Dh].
      bias_h, bias_w: [B, H, N, side] precomputed q-projected rel-pos bias
        components (bias[q, k] = bias_h[q, k // side] + bias_w[q, k % side]);
        requires N == side². None → plain attention (padded N masked).
      block_q: q rows per kernel step.

    Returns [B, H, N, Dh].
    """
    b, h, n, dh = q.shape
    scale_dim = dh
    dp = _round_up(dh, 128)
    np_ = _round_up(n, block_q)

    def pad(x, target_d):
        return jnp.pad(x, ((0, 0), (0, 0), (0, np_ - n),
                           (0, target_d - x.shape[-1])))

    interpret = jax.default_backend() != "tpu"

    qf = pad(q, dp).reshape(b * h, np_, dp)
    kf = pad(k, dp).reshape(b * h, np_, dp)
    vf = pad(v, dp).reshape(b * h, np_, dp)
    bhf = bwf = None
    if bias_h is not None:
        sideb = _round_up(side, 128)
        bhf = jnp.pad(bias_h, ((0, 0), (0, 0), (0, np_ - n),
                               (0, sideb - side))).reshape(b * h, np_, sideb)
        bwf = jnp.pad(bias_w, ((0, 0), (0, 0), (0, np_ - n),
                               (0, sideb - side))).reshape(b * h, np_, sideb)

    out = _flash_attention(qf, kf, vf, bhf, bwf, side=side,
                           block_q=block_q, interpret=interpret,
                           scale=1.0 / float(np.sqrt(scale_dim)),
                           valid_len=n)
    return out.reshape(b, h, np_, dp)[:, :, :n, :dh]
