"""Fully-fused per-prompt SAM decode tail: P1 → keys1 → layer-2 t2i →
token mid-ops → P2 → keys2 → final attention in ONE kernel.

The probability-factored decode (ops/decode_probs.py) runs FOUR separate
per-prompt kernels with XLA token-ops between them; the per-prompt image
branch keys_l^T = LN(img0^T + C_l^T P_l^T + b) is therefore reconstructed
once per consumer — keys1 three times, keys2 once — and each
reconstruction pays both a [D, HT]·[HT, M] matmul AND a [D, M]-sized f32
LayerNorm on the VPU (the dominant repeated cost), while P1/P2 make
redundant HBM round trips between the kernels.

This kernel carries one prompt's ENTIRE decode tail through a single VMEM
residency:

  P1 = softmax(kbd1 · q1s^T)                 (layer-1 i2t probabilities)
  keys1^T = LN(img0^T + C1^T P1^T + b1)      (reconstructed ONCE)
  t2i-2:  tokens attend to keys1 (block-diagonal head batching)
  token mid-ops in-kernel: out-proj, LN, MLP, LN  ([8, D] — tiny)
  P2 = softmax(kbd2 · (Wq2^T keys1^T + peq2^T))
  keys2^T = LN(keys1^T + C2^T P2^T + b2)     (reconstructed ONCE)
  final attention vs keys2, out-proj, final LN

vs the split path this removes 2 keys1 reconstructions + their LNs, every
inter-kernel HBM round trip of the token state, 3 kernel launches, and
P1's HBM read (it is computed in-register; P1/P2 are still EMITTED once
for the mask head, which keeps its own 2-recon probs path —
ops/maskhead.fused_mask_head_probs).

Numerics: identical op set to the split kernels up to f32 reassociation;
bf16 rounding happens at exactly the points the split path rounds (P/C
tensors and every token-side XLA store) — parity-tested against the
split path in tests/test_decode_fused.py.

Semantics anchor: /root/reference/sam/segment_anything/modeling/
transformer.py:16-240 (TwoWayTransformer depth 2 + final attention).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from revisit_anything_tpu.ops.decode_probs import (_block_diag_tokens_t,
                                                   _head_softmax_rows)
from revisit_anything_tpu.ops.maskhead import (conv2_blockdiag,
                                               mask_head_body,
                                               pack_mask_head_vecs)

Params = Dict[str, Any]

# rowv row indices (lane-broadcast constants, width max(D, DA, MLP)):
_RV = dict(bq_t2=0, bout_t2=1, n2s=2, n2b=3, lin1b=4, lin2b=5, n3s=6,
           n3b=7, bk_i2=8, bv_i2=9, bq_fa=10, bout_fa=11, nfs=12, nfb=13,
           vb_t2=14, vb_fa=15)
_RV_ROWS = 16

# colv column indices (sublane-broadcast constants, height max(D, DA)):
#   0-2: layer-1 branch b_out / ln scale / ln bias; 3-5: layer-2.
# Columns 6-7 are PACKED (t2i-l2 / final-attn v biases) but NEVER read by
# the kernel — those biases flow through rowv rows vb_t2/vb_fa (the
# attention consumes them as [1, DA] rows). They stay packed only to keep
# the production HLO (and its warm compile cache) byte-stable; edit bias
# plumbing via _RV, not here.
_CV_COLS = 8


def _ln_rows(x, scale, bias, eps):
    """f32 LayerNorm over the LAST dim of [rows, D] (token-side LN,
    matches decoder._layer_norm). ``scale``/``bias`` are [1, D] rows —
    kept 2-D throughout (Mosaic's rank-1 handling is unreliable)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)
            * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _dense_rows(x, w_ref, b_row):
    """Token-side dense matching decoder._dense: f32 accumulation,
    rounded to x.dtype BEFORE the bias add (the XLA path's
    ``.astype(x.dtype) + b``)."""
    y = jax.lax.dot_general(x, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.astype(x.dtype) + b_row.astype(x.dtype)


def _recon_step(y, c_bf, p_bf, b_col, s_col, bi_col, eps):
    """One branch-reconstruction layer on the transposed state
    (decode_probs._recon_t single step): y [D, M] f32 → LN(y + C^T P^T
    + b)."""
    a_t = jax.lax.dot_general(c_bf, p_bf, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    y = y + a_t + b_col.astype(jnp.float32)
    mu = jnp.mean(y, axis=0, keepdims=True)
    var = jnp.maximum(jnp.mean(y * y, axis=0, keepdims=True) - mu * mu,
                      0.0)
    return (y - mu) * jax.lax.rsqrt(var + eps) * s_col.astype(jnp.float32) \
        + bi_col.astype(jnp.float32)


def _bd_attend_q(q, keys, wk, wv, pekt, vb_row, heads: int, hd: int,
                 scale: float, dtype):
    """Block-diagonal-head token→image attention with the k/v projections
    pushed to the QUERY/CONTEXT side.

    Only n_pad≈8 token rows attend, so projecting the whole [D, M]
    branch to k/v ([2·DA, D]·[D, M] ≈ 1.07 GF/prompt) is wasteful:
      s = q_bd·(Wk^T·keys + pe) = (q_bd·Wk^T)·keys + q_bd·pe
      o = p·(Wv^T·keys + vb)^T = (p·keys^T)·Wv + vb   (softmax rows sum
                                                       to 1 exactly)
    — the big matmuls shrink to [H·n, D]·[D, M] and [H·n, M]·[M, D]
    (~0.34 GF vs ~0.67 GF per attention). The block-diagonal head
    structure survives the refactor because q_bd's zeroed columns select
    head h's rows of Wk^T/Wv exactly as they selected its k/v rows.
    Same arithmetic as the transposed-k/v form up to f32 reassociation.

    q [n_pad, DA] f32; keys [D, M] f32; wk/wv [D, DA]; pekt [DA, M];
    vb_row [1, DA] → [n_pad, DA] in ``dtype``.
    """
    n_pad, da = q.shape
    hn = heads * n_pad
    rowg = jax.lax.broadcasted_iota(jnp.int32, (hn, da), 0) // n_pad
    colg = jax.lax.broadcasted_iota(jnp.int32, (hn, da), 1) // hd
    bmask = (rowg == colg).astype(jnp.float32)
    q_bd = jnp.concatenate([q] * heads, axis=0) * bmask    # [hn, DA]
    qhat = jax.lax.dot_general(q_bd, wk.astype(jnp.float32),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    s = jax.lax.dot_general(qhat, keys, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = (s + jax.lax.dot_general(q_bd, pekt.astype(jnp.float32),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)) \
        * scale
    mx = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - mx)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    ctx = jax.lax.dot_general(p, keys, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_all = jax.lax.dot_general(ctx, wv.astype(jnp.float32),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    o_all = o_all + vb_row.astype(jnp.float32)
    return jnp.sum((o_all * bmask).reshape(heads, n_pad, da),
                   axis=0).astype(dtype)


def _bdiag_rows(tok, n_tok: int, heads: int, hd: int):
    """[n_pad, DA] projected tokens → block-diagonal [H·T, DA]: head h's
    T rows carry its hd channels (decode_probs._block_diag_tokens_t,
    in-kernel form via concat + iota mask — Mosaic has no gather)."""
    rows = jnp.concatenate([tok[:n_tok]] * heads, axis=0)   # [HT, DA]
    ht, da = rows.shape
    rowg = jax.lax.broadcasted_iota(jnp.int32, (ht, da), 0) // n_tok
    colg = jax.lax.broadcasted_iota(jnp.int32, (ht, da), 1) // hd
    return jnp.where(rowg == colg, rows, jnp.zeros_like(rows))


def _tail_kernel(img0t_ref, q1st_ref, peq2t_ref, pek2t_ref, pekft_ref,
                 wq_t2_ref, wk_t2_ref, wv_t2_ref, wout_t2_ref, lin1_ref,
                 lin2_ref, wk_i2_ref, wv_i2_ref, wout_i2_ref, wq2_ref,
                 wq_fa_ref, wk_fa_ref, wv_fa_ref, wout_fa_ref, rowv_ref,
                 colv_ref,
                 *rest_refs,
                 heads: int, n_tok: int, eps: float,
                 emit_keys: bool = False,
                 emit_logits: bool = False, mh_c1: int = 0):
    if emit_logits:
        # logits-emission mode: the mask head (and the three hypernetwork
        # MLPs it needs) run IN-KERNEL on the in-VMEM keys2 — the [M, D]
        # branch tensor never touches HBM at all (it cost a 2 MB write +
        # 2 MB read per prompt in keys mode: 4.3 GB per 1024-prompt
        # query). Only the block logits [content, 16·M] and the token
        # state leave the kernel.
        (up1w_ref, up2wbd_ref, mhv_ref, hw1_ref, hw2_ref, hw3_ref,
         hb1_ref, hb2_ref, hb3_ref,
         kbdt1_ref, c1m_ref, qin_ref, tok_ref) = rest_refs[:-2]
        logits_ref, qout_ref = rest_refs[-2:]
        keys_ref = p1_ref = p2_ref = c2m_ref = None
    else:
        kbdt1_ref, c1m_ref, qin_ref, tok_ref = rest_refs[:4]
        out_refs = rest_refs[4:]
        logits_ref = None
        if emit_keys:
            # keys-emission mode: the branch state after layer 2 (keys2 —
            # exactly the tensor the SAM mask head consumes) is stored
            # ONCE in [M, D] layout; the probabilities/c2m never leave
            # the kernel, and the mask head skips its 2 reconstructions
            # + 2 full f32 LayerNorms per prompt (its measured VPU
            # bound).
            keys_ref, qout_ref = out_refs
            p1_ref = p2_ref = c2m_ref = None
        else:
            p1_ref, p2_ref, c2m_ref, qout_ref = out_refs
            keys_ref = None
    d = img0t_ref.shape[1]
    da = q1st_ref.shape[1]
    hd = da // heads
    scale = 1.0 / float(np.sqrt(hd))
    dtype = qin_ref.dtype
    rv = rowv_ref
    cv = colv_ref

    # ---- layer-1 i2t probabilities (was the i2t_probs layer-1 call) ----
    s1 = jax.lax.dot_general(
        kbdt1_ref[0].astype(jnp.float32), q1st_ref[0].astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # [HT, M]
    p1b = _head_softmax_rows(s1, n_tok, heads).astype(jnp.bfloat16)
    if p1_ref is not None:
        p1_ref[0] = p1b.astype(p1_ref.dtype)

    # ---- keys1^T (the ONLY reconstruction of layer 1) ----
    keys1 = _recon_step(img0t_ref[0].astype(jnp.float32), c1m_ref[0],
                        p1b.astype(c1m_ref.dtype),
                        cv[:d, 0:1], cv[:d, 1:2], cv[:d, 2:3],
                        eps)                               # [D, M] f32

    # ---- layer-2 t2i: tokens attend to keys1 (query-side projections) --
    qsum = qin_ref[0] + tok_ref[0]                         # [n_pad, D]
    q2 = _dense_rows(qsum, wq_t2_ref,
                     rv[_RV["bq_t2"]:_RV["bq_t2"] + 1, :da])
    attn = _bd_attend_q(q2.astype(jnp.float32), keys1, wk_t2_ref[...],
                        wv_t2_ref[...], pek2t_ref[0],
                        rv[_RV["vb_t2"]:_RV["vb_t2"] + 1, :da],
                        heads, hd, scale, dtype)
    queries = qin_ref[0] + _dense_rows(
        attn, wout_t2_ref, rv[_RV["bout_t2"]:_RV["bout_t2"] + 1, :d])
    queries = _ln_rows(queries, rv[_RV["n2s"]:_RV["n2s"] + 1, :d], rv[_RV["n2b"]:_RV["n2b"] + 1, :d],
                       eps)

    # ---- token MLP + LN (was XLA between the kernels) ----
    mlp_dim = lin1_ref.shape[1]
    h = jax.nn.relu(_dense_rows(queries, lin1_ref,
                                rv[_RV["lin1b"]:_RV["lin1b"] + 1,
                                   :mlp_dim]))
    queries = queries + _dense_rows(h, lin2_ref,
                                    rv[_RV["lin2b"]:_RV["lin2b"] + 1, :d])
    queries = _ln_rows(queries, rv[_RV["n3s"]:_RV["n3s"] + 1, :d], rv[_RV["n3b"]:_RV["n3b"] + 1, :d],
                       eps)

    # ---- layer-2 i2t → P2 (queries from keys1, still in VMEM) ----
    tok_k2 = _dense_rows(queries + tok_ref[0], wk_i2_ref,
                         rv[_RV["bk_i2"]:_RV["bk_i2"] + 1, :da])
    tok_v2 = _dense_rows(queries, wv_i2_ref,
                         rv[_RV["bv_i2"]:_RV["bv_i2"] + 1, :da])
    kbd2 = _bdiag_rows(tok_k2, n_tok, heads, hd)           # [HT, DA]
    # i2t logits with the q projection pushed to the token side:
    # kbd2·(Wq2^T·keys1 + pe) = (kbd2·Wq2^T)·keys1 + kbd2·pe —
    # [HT, D]·[D, M] (117 MF) instead of [DA, D]·[D, M] (268 MF)
    kbd2f = kbd2.astype(jnp.float32)
    khat2 = jax.lax.dot_general(
        kbd2f, wq2_ref[...].astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [HT, D]
    s2 = jax.lax.dot_general(
        khat2, keys1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s2 = (s2 + jax.lax.dot_general(
        kbd2f, peq2t_ref[0].astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)) * scale
    p2b = _head_softmax_rows(s2, n_tok, heads).astype(jnp.bfloat16)
    if p2_ref is not None:
        p2_ref[0] = p2b.astype(p2_ref.dtype)

    c2 = jax.lax.dot_general(
        _bdiag_rows(tok_v2, n_tok, heads, hd), wout_i2_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)  # [HT, D]
    if c2m_ref is not None:
        c2m_ref[0] = c2

    # ---- keys2^T (the ONLY reconstruction of layer 2) ----
    keys2 = _recon_step(keys1, c2, p2b.astype(c2.dtype),
                        cv[:d, 3:4], cv[:d, 4:5], cv[:d, 5:6], eps)
    if keys_ref is not None:
        # [D, M] f32 → [M, D] in the activation dtype: ONE in-register
        # transpose per prompt (the [M, D] layout is what the mask-head /
        # resize consumers read; keeping the kernel-internal state [D, M]
        # keeps its per-position LayerNorms on the cheap sublane axis).
        keys_ref[0] = jnp.transpose(keys2.astype(keys_ref.dtype))

    # ---- final token→image attention vs keys2 (query-side) ----
    qf = _dense_rows(queries + tok_ref[0], wq_fa_ref,
                     rv[_RV["bq_fa"]:_RV["bq_fa"] + 1, :da])
    attn_f = _bd_attend_q(qf.astype(jnp.float32), keys2, wk_fa_ref[...],
                          wv_fa_ref[...], pekft_ref[0],
                          rv[_RV["vb_fa"]:_RV["vb_fa"] + 1, :da],
                          heads, hd, scale, dtype)
    queries = queries + _dense_rows(
        attn_f, wout_fa_ref, rv[_RV["bout_fa"]:_RV["bout_fa"] + 1, :d])
    queries = _ln_rows(queries, rv[_RV["nfs"]:_RV["nfs"] + 1, :d], rv[_RV["nfb"]:_RV["nfb"] + 1, :d],
                       eps)
    qout_ref[0] = queries

    if logits_ref is not None:
        # ---- hypernetwork MLPs for mask tokens 1..3 (tiny, unrolled;
        # same op order as decoder._mlp via _dense: f32 accumulation
        # rounded to dtype BEFORE each bias add, relu between) ----
        c2 = hw3_ref.shape[2]
        rows = []
        for i in range(3):
            hx = queries[1 + i:2 + i]                    # [1, D]
            hx = jnp.maximum(
                _dense_rows(hx, hw1_ref[i], hb1_ref[i:i + 1, :d]), 0)
            hx = jnp.maximum(
                _dense_rows(hx, hw2_ref[i], hb2_ref[i:i + 1, :d]), 0)
            hx = _dense_rows(hx, hw3_ref[i], hb3_ref[i:i + 1, :c2])
            rows.append(hx)
        hyper = jnp.concatenate(rows, axis=0)            # [M=3, c2]

        # per-prompt block-diagonal hypernetwork [16·c2, 16·M] built
        # in-register (fused_mask_head's eye16 einsum, iota-masked form)
        m_tok = 3
        hyper_t = jnp.transpose(hyper)                   # [c2, M]
        tiled = jnp.concatenate([hyper_t] * 16, axis=0)  # [16·c2, M]
        tiled = jnp.concatenate([tiled] * 16, axis=1)    # [16·c2, 16·M]
        rg = jax.lax.broadcasted_iota(
            jnp.int32, (16 * c2, 16 * m_tok), 0) // c2
        cg = jax.lax.broadcasted_iota(
            jnp.int32, (16 * c2, 16 * m_tok), 1) // m_tok
        hbd = jnp.where(rg == cg, tiled,
                        jnp.zeros_like(tiled)).astype(dtype)

        # ---- mask head on the in-VMEM branch (rounded to the activation
        # dtype exactly where the keys-emission store rounds) ----
        content = logits_ref.shape[1]
        x = jnp.transpose(keys2[:, :content].astype(dtype))  # [content, D]
        logits_ref[0] = mask_head_body(
            x, up1w_ref[...], up2wbd_ref[...], hbd,
            mhv_ref[0:1, :d], mhv_ref[1:2, :d], mhv_ref[2:3, :d],
            mhv_ref[3:4, :up2wbd_ref.shape[1]],
            c1=mh_c1, eps=eps).astype(logits_ref.dtype)


@partial(jax.jit, static_argnames=("heads", "n_tok", "eps", "interpret",
                                   "emit_keys", "content", "mh_c1"))
def _tail_call(shared, weights, rowv, colv, kbdt1, c1m, qin, tok,
               heads: int, n_tok: int, eps: float, interpret: bool,
               emit_keys: bool = False, mh_inputs=None,
               content: int = 0, mh_c1: int = 0):
    img0t = shared[0]
    b, ht, _ = kbdt1.shape
    d, m = img0t.shape[1], img0t.shape[2]
    n_pad = qin.shape[1]
    emit_logits = mh_inputs is not None
    kernel = partial(_tail_kernel, heads=heads, n_tok=n_tok, eps=eps,
                     emit_keys=emit_keys, emit_logits=emit_logits,
                     mh_c1=mh_c1)

    def inv(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    def per_prompt(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape[1:],
                            lambda i, _n=nd: (i,) + (0,) * (_n - 1),
                            memory_space=pltpu.VMEM)

    mh_inputs = tuple(mh_inputs) if emit_logits else ()
    in_specs = ([inv(s.shape) for s in shared]
                + [inv(w.shape) for w in weights]
                + [inv(rowv.shape), inv(colv.shape)]
                + [inv(t.shape) for t in mh_inputs]
                + [per_prompt(kbdt1.shape), per_prompt(c1m.shape),
                   per_prompt(qin.shape), per_prompt(tok.shape)])
    if emit_logits:
        n_out = 16 * 3
        out_specs = [
            pl.BlockSpec((1, content, n_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, content, n_out), qin.dtype),
            jax.ShapeDtypeStruct((b, n_pad, d), qin.dtype),
        ]
    elif emit_keys:
        out_specs = [
            pl.BlockSpec((1, m, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, m, d), qin.dtype),
            jax.ShapeDtypeStruct((b, n_pad, d), qin.dtype),
        ]
    else:
        out_specs = [
            pl.BlockSpec((1, ht, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, ht, m), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, ht, m), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, ht, d), qin.dtype),
            jax.ShapeDtypeStruct((b, n_pad, d), qin.dtype),
        ]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*shared, *weights, rowv, colv, *mh_inputs, kbdt1, c1m, qin, tok)


def decode_tail_fused(img0t: jnp.ndarray, q1st: jnp.ndarray,
                      peq2t: jnp.ndarray, pek2t: jnp.ndarray,
                      pekft: jnp.ndarray,
                      tok_k1: jnp.ndarray, c1m: jnp.ndarray,
                      queries_b: jnp.ndarray, tokens: jnp.ndarray,
                      l2: Params, fa: Params, i1: Params, l1n4: Params,
                      norm_final: Params, heads: int,
                      eps: float = 1e-6,
                      interpret: bool = False,
                      emit_keys: bool = False,
                      mask_head: Optional[Params] = None,
                      content: Optional[int] = None
                      ) -> Tuple[jnp.ndarray, ...]:
    """Host-side wrapper: pack weights and run the fused tail.

    Args:
      img0t: [1, D, M] shared branch input, transposed.
      q1st: [1, DA, M] layer-1 i2t queries ((img0+pe)Wq1 + b)^T.
      peq2t/pek2t/pekft: [1, DA, M] transposed pe-terms — layer-2 i2t
        W_q·pe + b_q, layer-2 t2i W_k·pe + b_k, final-attn W_k·pe + b_k.
      tok_k1: [B, T, DA] layer-1 i2t projected token keys.
      c1m: [B, HT, D] layer-1 C = V^bd @ W_out (bf16 — also feeds the
        mask head).
      queries_b: [B, T, D] token state after layer-2 self-attn + norm1.
      tokens: [B, T, D] the prompt tokens (for the ``+ tokens`` terms).
      l2 / fa: layer-2 / final-attention param subtrees; i1: layer-1 i2t
        params (out bias); l1n4: layer-1 norm4; norm_final.

    Returns (queries_out [B, T, D] after norm_final, p1 [B, HT, M] bf16,
    p2 [B, HT, M] bf16, c2m [B, HT, D]) — or, with ``emit_keys``,
    (queries_out, keys2 [B, M, D]): the post-layer-2 image branch (the
    tensor the SAM mask head upscales, transformer.py:16-240 ``keys``)
    stored ONCE in the activation dtype, with the probability/c2m
    emissions skipped entirely.

    With ``mask_head`` (the decoder param tree holding up1_w/up1_b/
    up_ln/up2_w/up2_b/hyper_mlps), the mask head AND the three
    hypernetwork MLPs run IN-KERNEL on the in-VMEM keys2 (logits-emission
    mode): returns (queries_out, mask logits [B, content, 16, 3]) and the
    [M, D] branch never touches HBM (multimask tokens 1..3 only —
    mask_decoder.py:96-144 multimask_output selection). ``content``:
    leading positions to decode (pad-row skipping; default all).
    """
    b, t, d = queries_b.shape
    dtype = queries_b.dtype
    da = l2["t2i"]["q"]["w"].shape[1]
    mlp_dim = l2["lin1"]["w"].shape[1]
    i2 = l2["i2t"]
    t2 = l2["t2i"]

    kbdt1 = _block_diag_tokens_t(tok_k1, heads)            # [B, HT, DA]

    n_pad = -(-t // 8) * 8
    if n_pad != t:
        pad = ((0, 0), (0, n_pad - t), (0, 0))
        queries_b = jnp.pad(queries_b, pad)
        tokens = jnp.pad(tokens, pad)

    def wt(p):
        return p["w"].astype(dtype)

    weights = (
        wt(t2["q"]),                                        # wq_t2 [D, DA]
        wt(t2["k"]), wt(t2["v"]),                           # [D, DA] each
        wt(t2["out"]),                                      # [DA, D]
        wt(l2["lin1"]), wt(l2["lin2"]),
        wt(i2["k"]), wt(i2["v"]), wt(i2["out"]), wt(i2["q"]),
        wt(fa["q"]), wt(fa["k"]), wt(fa["v"]),
        wt(fa["out"]),
    )

    width = max(d, da, mlp_dim)
    rowv = jnp.zeros((_RV_ROWS, width), dtype)

    def rset(rv, key, vec):
        return rv.at[_RV[key], :vec.shape[0]].set(vec.astype(dtype))

    rowv = rset(rowv, "bq_t2", t2["q"]["b"])
    rowv = rset(rowv, "bout_t2", t2["out"]["b"])
    rowv = rset(rowv, "n2s", l2["norm2"]["scale"])
    rowv = rset(rowv, "n2b", l2["norm2"]["bias"])
    rowv = rset(rowv, "lin1b", l2["lin1"]["b"])
    rowv = rset(rowv, "lin2b", l2["lin2"]["b"])
    rowv = rset(rowv, "n3s", l2["norm3"]["scale"])
    rowv = rset(rowv, "n3b", l2["norm3"]["bias"])
    rowv = rset(rowv, "bk_i2", i2["k"]["b"])
    rowv = rset(rowv, "bv_i2", i2["v"]["b"])
    rowv = rset(rowv, "bq_fa", fa["q"]["b"])
    rowv = rset(rowv, "bout_fa", fa["out"]["b"])
    rowv = rset(rowv, "nfs", norm_final["scale"])
    rowv = rset(rowv, "nfb", norm_final["bias"])
    rowv = rset(rowv, "vb_t2", t2["v"]["b"])
    rowv = rset(rowv, "vb_fa", fa["v"]["b"])

    colv = jnp.zeros((max(d, da), _CV_COLS), dtype)
    colv = colv.at[:d, 0].set(i1["out"]["b"].astype(dtype))
    colv = colv.at[:d, 1].set(l1n4["scale"].astype(dtype))
    colv = colv.at[:d, 2].set(l1n4["bias"].astype(dtype))
    colv = colv.at[:d, 3].set(i2["out"]["b"].astype(dtype))
    colv = colv.at[:d, 4].set(l2["norm4"]["scale"].astype(dtype))
    colv = colv.at[:d, 5].set(l2["norm4"]["bias"].astype(dtype))
    colv = colv.at[:da, 6].set(t2["v"]["b"].astype(dtype))
    colv = colv.at[:da, 7].set(fa["v"]["b"].astype(dtype))

    shared = (img0t.astype(dtype), q1st.astype(dtype), peq2t.astype(dtype),
              pek2t.astype(dtype), pekft.astype(dtype))
    if mask_head is not None:
        m = img0t.shape[2]
        content = m if content is None else content
        c1 = mask_head["up1_w"].shape[1] // 4
        c2 = mask_head["up2_w"].shape[1] // 4
        up1w = mask_head["up1_w"].astype(dtype)
        up2wbd = conv2_blockdiag(mask_head["up2_w"], c1, c2).astype(dtype)
        mhv = pack_mask_head_vecs(
            mask_head["up1_b"], mask_head["up_ln"]["scale"],
            mask_head["up_ln"]["bias"], mask_head["up2_b"], c1, c2, dtype)
        mlps = mask_head["hyper_mlps"]
        hw = [jnp.stack([mlps[1 + i][li]["w"] for i in range(3)]
                        ).astype(dtype) for li in range(3)]
        hb = [jnp.stack([mlps[1 + i][li]["b"] for i in range(3)]
                        ).astype(dtype) for li in range(3)]
        mh_inputs = (up1w, up2wbd, mhv, hw[0], hw[1], hw[2],
                     hb[0], hb[1], hb[2])
        logits, qout = _tail_call(
            shared, weights, rowv, colv, kbdt1, c1m.astype(dtype),
            queries_b, tokens, heads, tok_k1.shape[1], float(eps),
            bool(interpret), mh_inputs=mh_inputs, content=int(content),
            mh_c1=int(c1))
        return qout[:, :t], logits.reshape(b, content, 16, 3)
    if emit_keys:
        keys2, qout = _tail_call(
            shared, weights, rowv, colv, kbdt1, c1m.astype(dtype),
            queries_b, tokens, heads, tok_k1.shape[1], float(eps),
            bool(interpret), emit_keys=True)
        return qout[:, :t], keys2
    p1, p2, c2m, qout = _tail_call(
        shared, weights, rowv, colv, kbdt1, c1m.astype(dtype),
        queries_b, tokens, heads, tok_k1.shape[1], float(eps),
        bool(interpret))
    return qout[:, :t], p1, p2, c2m
