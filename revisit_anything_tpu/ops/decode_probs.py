"""Probability-factored SAM decode: the per-prompt image branch as rank-T
state.

The AMG decode stage is HBM-bandwidth-bound: the classic dataflow
materializes the per-prompt image branch [Np, 4096, 256] (and its k|v
projections) four times per 128-prompt batch (~2.4 GB of traffic). But the
branch never gains more than rank-(H·T) of per-prompt information: each
image→tokens cross attention adds ``A_l = P_l @ V_l @ W_out + b`` where
``P_l`` are the softmax probabilities against the ~7 per-prompt tokens,
followed by a per-position LayerNorm (transformer.py TwoWayAttentionBlock
:172-178, Attention :16-240). So the entire per-prompt branch state is:

    keys_1 = LN(img0 + P1 @ C1 + b1)          C_l = V_l^bd @ W_out_l
    keys_2 = LN(keys_1 + P2 @ C2 + b2)

and every consumer (layer-2 t2i k/v, layer-2 i2t queries, the final
token→image attention, the mask head) can RECONSTRUCT the branch in VMEM
from the probabilities instead of reading a materialized copy. Per-batch
HBM state shrinks from ~2.4 GB to two probability tensors (~134 MB):

    P_l stored TRANSPOSED [B, H·T, M] bf16 — minor dim M=4096 rides the
    128-lane tile exactly; the [B, M, 56] layout would pad 56→128 lanes
    in HBM (2.3x the bytes). The transposed layout also puts heads on
    SUBLANE row-groups, so the per-head softmax is plain row slicing (no
    lane-group indicator matmuls), and the reconstructed branch comes out
    as keys^T [D, M] — exactly the transposed layout the k/v of the
    token-side attention kernels want.

Reconstruction costs ~117 MFLOP per prompt per consumer ([M,56]@[56,256])
— ~3 ms/query on the MXU against >20 ms of eliminated HBM traffic.

Numerics: identical op set to the materialized path up to reassociation
(P@(V@W) instead of (P@V)@W, both f32-accumulated from bf16), LN in f32.

Semantics anchor: /root/reference/sam/segment_anything/modeling/
transformer.py:16-240 (outputs parity-tested against decoder._run_two_way).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _recon_t(img0t, p_refs, c_refs, vecs_ref, d: int, eps: float,
             depth: int):
    """Reconstruct the transposed image branch keys_depth^T [D, M] in f32.

    vecs_ref is COLUMN-packed [max(D, DA), 8]: column 3·l+0 = b_out_l,
    3·l+1 = ln_l scale, 3·l+2 = ln_l bias (all length-D columns) —
    columns broadcast over M without any in-kernel transpose.
    LayerNorm is over the channel dim = SUBLANES here; stats reduce axis 0.
    """
    y = img0t.astype(jnp.float32)                       # [D, M]
    for li in range(depth):
        pt = p_refs[li][0]                              # [HT, M] bf16
        c = c_refs[li][0]                               # [HT, D] bf16
        # A^T = C^T @ P^T via contraction on the HT dim of both
        a_t = jax.lax.dot_general(
            c, pt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [D, M]
        b_out = vecs_ref[:d, 3 * li + 0:3 * li + 1].astype(jnp.float32)
        y = y + a_t + b_out                             # [D, 1] broadcast
        mu = jnp.mean(y, axis=0, keepdims=True)         # [1, M]
        var = jnp.maximum(
            jnp.mean(y * y, axis=0, keepdims=True) - mu * mu, 0.0)
        scale = vecs_ref[:d, 3 * li + 1:3 * li + 2].astype(jnp.float32)
        bias = vecs_ref[:d, 3 * li + 2:3 * li + 3].astype(jnp.float32)
        y = (y - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    return y                                            # [D, M] f32


def _head_softmax_rows(st, n_tok: int, heads: int):
    """Per-head softmax of transposed logits st [HT, M] f32: head h lives
    in row group h·T..h·T+T; softmax normalizes DOWN each head's rows."""
    parts = []
    for h in range(heads):
        s_h = st[h * n_tok:(h + 1) * n_tok]             # [T, M]
        m_h = jnp.max(s_h, axis=0, keepdims=True)
        e_h = jnp.exp(s_h - m_h)
        z_h = jnp.sum(e_h, axis=0, keepdims=True)
        parts.append(e_h / z_h)
    return jnp.concatenate(parts, axis=0)               # [HT, M]


def _probs_kernel(qst_ref, kbdt_ref, *refs, layer: int,
                  n_tok: int, heads: int, scale: float, d: int, da: int,
                  eps: float, pps: int = 1):
    """One grid step: emit the i2t attention probabilities transposed.

    Layer 1 (shared queries): st = kbdT @ q1sT.
      qst_ref: [1, DA, M] shared pre-projected (img0+pe)Wq + b, transposed.
      kbdt_ref: [pps, HT, DA] per-prompt block-diagonal projected token
        keys (the transpose of i2t_update's kbd). ``pps`` prompts share
        the step: their key rows stack to ONE [pps·HT, DA] operand, so
        the logits matmul runs at pps× the M-dim (56 rows underfill the
        MXU's 128-row tile) and the grid has pps× fewer steps; the
        per-(prompt, head) softmax groups are unchanged T-row groups.
        Layer 2 is always pps=1 (its reconstruction state is per-prompt
        and VMEM-bound).
    Layer 2 (reconstructed queries): refs = (img0t, p1, c1, peq2t, wq,
      vecs, out) where q2T = Wq2^T @ keys1T + peq2T (+ b folded in).
    Output (last ref): [pps, HT, M] bf16 probabilities.
    """
    if layer == 1:
        (pt_out_ref,) = refs
        qt = qst_ref[0].astype(jnp.float32)             # [DA, M]
    else:
        (img0t_ref, p1_ref, c1_ref, peq2t_ref, wq_ref, vecs_ref,
         pt_out_ref) = refs
        keys1t = _recon_t(img0t_ref[0], [p1_ref], [c1_ref], vecs_ref,
                          d, eps, 1)                    # [D, M] f32
        qt = jax.lax.dot_general(
            wq_ref[...].astype(jnp.float32), keys1t,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [DA, M]
        qt = qt + peq2t_ref[0].astype(jnp.float32)
    if pps == 1:
        kbd = kbdt_ref[0].astype(jnp.float32)           # [HT, DA]
    else:
        shp = kbdt_ref.shape                            # [pps, HT, DA]
        kbd = kbdt_ref[...].astype(jnp.float32).reshape(
            shp[0] * shp[1], shp[2])                    # [pps·HT, DA]
    # per-head logits: head h contracts q rows h·hd.. with its key rows —
    # kbd is block-diagonal over heads, so ONE matmul does all heads
    # (and, with pps > 1, all of the step's prompts)
    st = jax.lax.dot_general(
        kbd, qt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale     # [pps·HT, M]
    # (prompt, head) groups are all T-row groups — heads·pps of them.
    # Reshape BEFORE the bf16 cast: [pps·56, M] splits on 8-sublane f32
    # tiles (56 % 8 == 0) but NOT on 16-sublane bf16 tiles.
    pt = _head_softmax_rows(st, n_tok, heads * pps)
    pt_out_ref[...] = pt.reshape(pt_out_ref.shape).astype(pt_out_ref.dtype)


@partial(jax.jit, static_argnames=("layer", "n_tok", "heads", "scale",
                                   "eps", "interpret", "pps"))
def _probs_call(qst, kbdt, extra, layer: int, n_tok: int, heads: int,
                scale: float, eps: float, interpret: bool, pps: int = 1):
    b = kbdt.shape[0]
    ht = kbdt.shape[1]
    da = kbdt.shape[2]
    m = qst.shape[2] if layer == 1 else extra[0].shape[2]
    d = extra[0].shape[1] if layer != 1 else 0
    assert pps == 1 or (layer == 1 and b % pps == 0), (layer, b, pps)
    kernel = partial(_probs_kernel, layer=layer, n_tok=n_tok, heads=heads,
                     scale=scale, d=d, da=da, eps=eps, pps=pps)
    in_specs = [
        pl.BlockSpec(qst.shape, lambda i: (0,) * qst.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pps, ht, da), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qst, kbdt]
    if layer != 1:
        img0t, p1, c1, peq2t, wq, vecs = extra
        in_specs += [
            pl.BlockSpec(img0t.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + p1.shape[1:], lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + c1.shape[1:], lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(peq2t.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wq.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(vecs.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [img0t, p1, c1, peq2t, wq, vecs]
    return pl.pallas_call(
        kernel,
        grid=(b // pps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((pps, ht, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ht, m), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _t2i_probs_kernel(q_ref, img0t_ref, p1_ref, c1_ref, *refs, depth: int,
                      heads: int, hd: int, scale: float,
                      d: int, eps: float):
    """tokens→image attention against the RECONSTRUCTED branch.

    q_ref: [1, n_pad, DA] projected token queries (pe folded outside).
    refs: ([p2, c2 when depth == 2,] wkvt, pekt, vecs, out) — the
      depth-1 call carries NO p2/c2 refs at all (streaming dummy blocks
      per prompt would waste ~60 MB of HBM reads per decode batch).
    wkvt: [2·DA, D] stacked W_k^T | W_v^T (transposed projections).
    pekt: [1, DA, M] k positional term W_k·pe transposed, k bias
      folded in; vecs column 6 = v bias (length DA).
    out: [1, n_pad, DA] pre-out-projection attention output.
    """
    if depth == 2:
        p2_ref, c2_ref, wkvt_ref, pekt_ref, vecs_ref, o_ref = refs
        p_refs, c_refs = [p1_ref, p2_ref], [c1_ref, c2_ref]
    else:
        wkvt_ref, pekt_ref, vecs_ref, o_ref = refs
        p_refs, c_refs = [p1_ref], [c1_ref]
    keyst = _recon_t(img0t_ref[0], p_refs, c_refs,
                     vecs_ref, d, eps, depth)           # [D, M] f32
    da = hd * heads
    kvt = jax.lax.dot_general(
        wkvt_ref[...].astype(jnp.float32), keyst,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [2·DA, M]
    kt = kvt[:da] + pekt_ref[0].astype(jnp.float32)
    vb = vecs_ref[:da, 6:7].astype(jnp.float32)         # [DA, 1] column
    vt = kvt[da:] + vb
    q = q_ref[0].astype(jnp.float32)                    # [n_pad, DA]
    n_pad = q.shape[0]
    # Block-diagonal head batching: a per-head loop here costs 2·heads
    # tiny matmuls per prompt ([n_pad=8, hd=16] operands relayout badly
    # and underfill the MXU; ×128 prompts ≈ 2048 small matmuls/batch).
    # Instead stack the heads on ROWS: q_bd [H·n_pad, DA] zeroes every
    # column outside row-group h's hd-slice, so ONE [H·n_pad, DA]·[DA, M]
    # matmul emits every head's logits (zero columns add exact zeros),
    # one batched softmax normalizes all rows, and ONE [H·n_pad, M]·[M,
    # DA] matmul against v^T gives per-head outputs whose valid hd-slice
    # the same mask selects; summing the disjoint row groups reassembles
    # [n_pad, DA]. Same arithmetic up to f32 reassociation.
    hn = heads * n_pad
    rowg = jax.lax.broadcasted_iota(jnp.int32, (hn, da), 0) // n_pad
    colg = jax.lax.broadcasted_iota(jnp.int32, (hn, da), 1) // hd
    bmask = (rowg == colg).astype(jnp.float32)          # [H·n_pad, DA]
    q_bd = jnp.concatenate([q] * heads, axis=0) * bmask
    s = jax.lax.dot_general(
        q_bd, kt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale     # [H·n_pad, M]
    mx = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - mx)
    z = jnp.sum(e, axis=1, keepdims=True)
    p = e / z
    o_all = jax.lax.dot_general(
        p, vt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [H·n_pad, DA]
    o = jnp.sum((o_all * bmask).reshape(heads, n_pad, da), axis=0)
    o_ref[0] = o.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("depth", "heads", "hd", "scale", "eps",
                                   "interpret"))
def _t2i_probs_call(q, img0t, p1, c1, p2, c2, wkvt, pekt, vecs,
                    depth: int, heads: int, hd: int, scale: float,
                    eps: float, interpret: bool):
    b, n_pad, da = q.shape
    d = img0t.shape[1]
    kernel = partial(_t2i_probs_kernel, depth=depth,
                     heads=heads, hd=hd, scale=scale, d=d, eps=eps)
    in_specs = [
        pl.BlockSpec((1, n_pad, da), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(img0t.shape, lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + p1.shape[1:], lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + c1.shape[1:], lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, img0t, p1, c1]
    if depth == 2:
        in_specs += [
            pl.BlockSpec((1,) + p2.shape[1:], lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + c2.shape[1:], lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [p2, c2]
    in_specs += [
        pl.BlockSpec(wkvt.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(pekt.shape, lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(vecs.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [wkvt, pekt, vecs]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_pad, da), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, da), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# ----------------------------------------------------------------------
# host-facing API
# ----------------------------------------------------------------------


def _block_diag_tokens_t(tok: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[B, T, DA] projected tokens → transposed block-diagonal [B, HT, DA]
    where head h's T rows carry its hd channels (zero elsewhere)."""
    b, t, da = tok.shape
    hd = da // heads
    eye = jnp.eye(heads, dtype=tok.dtype)
    th = tok.reshape(b, t, heads, hd)
    return jnp.einsum("hg,bthd->bgthd", eye, th).reshape(
        b, heads * t, da)


def _pack_branch_vecs(d: int, da: int, dtype, b1, s1, bi1, b2=None, s2=None,
                      bi2=None, v_bias=None) -> jnp.ndarray:
    """COLUMN-packed constants [max(d, da), 8] (see _recon_t)."""
    vecs = jnp.zeros((max(d, da), 8), dtype)
    vecs = vecs.at[:d, 0].set(b1.astype(dtype))
    vecs = vecs.at[:d, 1].set(s1.astype(dtype))
    vecs = vecs.at[:d, 2].set(bi1.astype(dtype))
    if b2 is not None:
        vecs = vecs.at[:d, 3].set(b2.astype(dtype))
        vecs = vecs.at[:d, 4].set(s2.astype(dtype))
        vecs = vecs.at[:d, 5].set(bi2.astype(dtype))
    if v_bias is not None:
        vecs = vecs.at[:da, 6].set(v_bias.astype(dtype))
    return vecs


def i2t_probs(qst: Optional[jnp.ndarray], tok_k: jnp.ndarray,
              heads: int, *, layer: int = 1,
              recon: Optional[Tuple] = None,
              eps: float = 1e-6,
              interpret: Optional[bool] = None,
              pps: int = 1) -> jnp.ndarray:
    """Emit the image→tokens attention probabilities, transposed.

    Args:
      qst: layer 1 — [1, DA, M] shared transposed pre-projected queries
        ((img0+pe)Wq + b, emitted via einsum("dk,bmd->bkm")); layer 2 —
        ignored (queries reconstruct in-kernel).
      tok_k: [B, T, DA] projected token keys.
      recon (layer 2): (img0t [1, D, M], p1 [B, HT, M], c1 [B, HT, D],
        peq2t [1, DA, M] — W_q·pe + b_q transposed, w_q [D, DA],
        vecs — from _pack_branch_vecs with layer-1 branch params).

    ``pps``: prompts per grid step for layer 1 (whose queries are
    shared) — see _probs_kernel; must divide B. Layer 2 ignores it.

    Returns P^T [B, HT, M] bf16.
    """
    b, t, da = tok_k.shape
    hd = da // heads
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kbdt = _block_diag_tokens_t(tok_k, heads)
    scale = 1.0 / float(np.sqrt(hd))
    if layer == 1:
        return _probs_call(qst, kbdt, (), 1, t, heads, scale, float(eps),
                           interpret, pps=pps)
    return _probs_call(jnp.zeros((1, 1, 1), kbdt.dtype), kbdt, recon, 2,
                       t, heads, scale, float(eps), interpret)


def t2i_from_probs(q_tok: jnp.ndarray, img0t: jnp.ndarray,
                   p1: jnp.ndarray, c1: jnp.ndarray,
                   p2: Optional[jnp.ndarray], c2: Optional[jnp.ndarray],
                   w_k: jnp.ndarray, w_v: jnp.ndarray,
                   pekt: jnp.ndarray,
                   branch_vecs: jnp.ndarray, heads: int,
                   eps: float = 1e-6,
                   interpret: Optional[bool] = None) -> jnp.ndarray:
    """tokens→image attention with the image branch reconstructed from
    probabilities (depth = 1 for the layer-2 t2i, 2 for the final attn).

    Args:
      q_tok: [B, T, DA] projected token queries (with +pe folded).
      pekt: [1, DA, M] W_k·pe + b_k, transposed.
      branch_vecs: _pack_branch_vecs(...) with this attention's value
        bias in column 6.
    Returns the pre-out-projection attention output [B, T, DA].
    """
    b, t, da = q_tok.shape
    hd = da // heads
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_pad = -(-t // 8) * 8
    if n_pad != t:
        q_tok = jnp.pad(q_tok, ((0, 0), (0, n_pad - t), (0, 0)))
    depth = 1 if p2 is None else 2
    wkvt = jnp.concatenate([jnp.transpose(w_k, (1, 0)),
                            jnp.transpose(w_v, (1, 0))],
                           axis=0).astype(img0t.dtype)
    out = _t2i_probs_call(q_tok, img0t, p1, c1, p2, c2, wkvt,
                          pekt, branch_vecs, depth, heads, hd,
                          1.0 / float(np.sqrt(hd)), float(eps), interpret)
    return out[:, :t]
