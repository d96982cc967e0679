"""SAM mask decoder: two-way transformer + hypernetwork mask heads.

Mirrors sam/segment_anything/modeling/mask_decoder.py:16-176 and
transformer.py:16-240. TPU-first notes:

- The whole decoder is vmapped over the prompt batch: one jit call decodes
  hundreds of point prompts at once (the reference loops 64-point batches
  through predict_torch — automatic_mask_generator.py:245-265).
- The 2x2-stride-2 transposed convs of the output upscaler are expressed
  as matmul+reshape (kernel == stride ⇒ each input pixel expands to an
  independent 2x2 block), which lands on the MXU with no conv lowering.
- The per-prompt image-token branch [B_pts, 4096, 256] dominates memory:
  at 256 prompts x bf16 it is ~0.5 GB — batch size is the knob.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from revisit_anything_tpu.models.sam.config import SamArchConfig

Params = Dict[str, Any]


def _layer_norm(x, p, eps=1e-6):
    # f32-compute LN from bf16 storage: ~3x faster than bf16-compute on
    # v5e (measured) and more accurate; output returns to input dtype.
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _dense(x, p):
    # bf16 activations keep bf16 outputs (MXU still accumulates f32
    # internally); halves the HBM traffic of the per-prompt src branch.
    pet = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    return jnp.dot(x, p["w"], preferred_element_type=pet).astype(
        x.dtype) + p["b"]


def _attn(attn_p: Params, q, k, v, num_heads: int):
    """Projected multi-head attention with optional internal downsampling
    (transformer.py Attention)."""
    q = _dense(q, attn_p["q"])
    k = _dense(k, attn_p["k"])
    v = _dense(v, attn_p["v"])
    b, nq, d = q.shape
    hd = d // num_heads
    qh = q.reshape(b, nq, num_heads, hd)
    kh = k.reshape(b, k.shape[1], num_heads, hd)
    vh = v.reshape(b, v.shape[1], num_heads, hd)
    logits = jnp.einsum("bnhd,bmhd->bhnm", qh, kh,
                        preferred_element_type=jnp.float32) / (hd ** 0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return _dense(out.reshape(b, nq, d), attn_p["out"])


def _dense_nobias(x, p):
    pet = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    return jnp.dot(x, p["w"], preferred_element_type=pet).astype(x.dtype)


def _attn_kv_shared(attn_p, q, k1, v1, num_heads: int):
    """Attention where k/v come from ONE shared sequence [1, M, D]: their
    projections are computed once and enter the attention einsums WITHOUT
    a batch axis (no [B, M, D] broadcast is ever materialized) — the
    layer-1 image branch is identical across AMG prompts (same image
    embedding + the same no-mask dense prompt), so projecting or copying
    it per prompt is pure HBM waste."""
    q = _dense(q, attn_p["q"])
    k = _dense(k1, attn_p["k"])[0]
    v = _dense(v1, attn_p["v"])[0]
    b, nq, d = q.shape
    hd = d // num_heads
    qh = q.reshape(b, nq, num_heads, hd)
    kh = k.reshape(k.shape[0], num_heads, hd)
    vh = v.reshape(v.shape[0], num_heads, hd)
    logits = jnp.einsum("bnhd,mhd->bhnm", qh, kh,
                        preferred_element_type=jnp.float32) / (hd ** 0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhnm,mhd->bnhd", probs, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return _dense(out.reshape(b, nq, d), attn_p["out"])


def _attn_i2t(attn_p, img_q, tok_k, tok_v, num_heads: int, pe_q=None):
    """image→tokens attention: a big query side ([B or 1, M, D] image
    branch) attending to few token keys. ``img_q`` may be per-prompt
    [B, M, D] or shared [1, M, D] (layer 1 — einsums then carry no image
    batch axis). ``pe_q``: pre-projected positional term W_q(pe), folded in
    AFTER the projection (W(x+pe) = Wx + Wpe) so no [B, M, D] x+pe
    temporary is materialized."""
    iq = _dense_nobias(img_q, attn_p["q"])
    if pe_q is not None:
        iq = iq + pe_q                      # [*, M, D] + [1, M, D]
    iq = iq + attn_p["q"]["b"]
    b = tok_k.shape[0]
    m = iq.shape[1]
    d = iq.shape[-1]
    hd = d // num_heads
    kk = _dense(tok_k, attn_p["k"]).reshape(b, -1, num_heads, hd)
    vv = _dense(tok_v, attn_p["v"]).reshape(b, -1, num_heads, hd)
    if iq.shape[0] == 1:
        iqh = iq.reshape(m, num_heads, hd)
        logits = jnp.einsum("mhd,bnhd->bhmn", iqh, kk,
                            preferred_element_type=jnp.float32) / (hd ** 0.5)
    else:
        iqh = iq.reshape(b, m, num_heads, hd)
        logits = jnp.einsum("bmhd,bnhd->bhmn", iqh, kk,
                            preferred_element_type=jnp.float32) / (hd ** 0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(tok_k.dtype)
    out = jnp.einsum("bhmn,bnhd->bmhd", probs, vv,
                     preferred_element_type=jnp.float32).astype(tok_k.dtype)
    return _dense(out.reshape(b, m, d), attn_p["out"])


def _t2i_fused(attn_p, q_tok, keys, pe_one, num_heads: int, kvt=None):
    """tokens→image attention through the fused Pallas kernel
    (ops/attention.token_cross_attend_kv). k/v projections are emitted
    TRANSPOSED ([B, 2D, M]) in ONE pass (concatenated W_k|W_v) so the
    16-wide head dim never pads to the 128-lane tile; the '+pe' term and
    biases fold in inside the kernel. ``keys`` may be the shared
    [1, M, D] image branch (layer 1). ``kvt``: the transposed projection
    already emitted by the PREVIOUS i2t kernel (i2t_update w_kv_next) —
    the projection pass over the image branch is skipped entirely."""
    from revisit_anything_tpu.ops.attention import token_cross_attend_kv
    qp = _dense(q_tok, attn_p["q"])                    # [B, n, D]
    if kvt is None:
        pet = keys.dtype if keys.dtype == jnp.bfloat16 else jnp.float32
        wkv = jnp.concatenate([attn_p["k"]["w"], attn_p["v"]["w"]], axis=1)
        kvt = jnp.einsum("dk,bmd->bkm", wkv, keys,
                         preferred_element_type=pet).astype(keys.dtype)
    pe_k = _dense_nobias(pe_one, attn_p["k"]) + attn_p["k"]["b"]
    out = token_cross_attend_kv(qp, kvt, jnp.transpose(pe_k, (0, 2, 1)),
                                attn_p["v"]["b"], num_heads)
    return _dense(out, attn_p["out"])


# benchmarking escape hatch: force the XLA mask-head path (trace-time flag)
_MASKHEAD_DISABLED = False

# probability-factored AMG decode (ops/decode_probs.py): "auto" = on for
# TPU at production sizes, "on"/"off" force it (tests / A-B benchmarks)
_PROBS_PATH = "auto"

# fully-fused decode tail (ops/decode_fused.py): ONE kernel for P1 →
# keys1 → layer-2 t2i → token mid-ops → P2 → keys2 → final attention.
# "auto" = on TPU whenever the probs path runs (the big interpret-mode
# kernel body would slow every CPU test); "on" forces it (the parity
# tests); "off" = the split per-consumer kernels (the r3 shape, kept
# for parity tests and A/B benchmarks)
_FUSED_TAIL = "auto"

# keys-emission mode of the fused tail: the kernel stores keys2 (the
# post-layer-2 image branch — the exact tensor the mask head upscales)
# ONCE per prompt and the mask head runs its plain non-recon path,
# skipping 2 branch reconstructions + 2 full f32 LayerNorms per prompt
# (the mask head's measured VPU bound). "auto" = on whenever the fused
# tail runs; "off" = the r4 probs-consuming mask head (A/B benchmarks,
# parity tests).
_TAIL_KEYS = "auto"

# logits-emission mode (r5): the mask head + hypernetwork MLPs run
# INSIDE the fused tail kernel on the in-VMEM keys2 — the [M, D] branch
# never touches HBM (4.3 GB/query of write+read in keys mode at 1024
# prompts). Only multimask (tokens 1..3) decodes qualify. "auto" = on
# whenever the keys mode would run; "off" = the r4 two-kernel shape
# (A/B benchmarks, parity tests). DEFAULT OFF until the TPU A/B lands
# (scripts/ab_tail_logits.py) — flipping it changes the production HLO
# and invalidates the warm compile cache the driver bench relies on.
_TAIL_LOGITS = "off"


def _use_fused_tail() -> bool:
    if _FUSED_TAIL == "auto":
        return jax.default_backend() == "tpu"
    return _FUSED_TAIL == "on"


def _use_tail_keys() -> bool:
    if _TAIL_KEYS == "auto":
        return True
    return _TAIL_KEYS == "on"


def _use_tail_logits() -> bool:
    if _TAIL_LOGITS == "auto":
        return _use_tail_keys()
    return _TAIL_LOGITS == "on"


def _use_token_kernel(m: int) -> bool:
    return jax.default_backend() == "tpu" and m >= 1024


def _use_probs_path(m: int) -> bool:
    if _MASKHEAD_DISABLED:
        # the XLA-mask-head escape hatch must actually reach the XLA
        # path; the probs branch would otherwise shadow it
        return False
    if _PROBS_PATH == "on":
        return True
    if _PROBS_PATH == "off":
        return False
    return _use_token_kernel(m)


def _run_two_way(params_dec: Params, tokens, src, src_pe,
                 cfg: SamArchConfig):
    """TwoWayTransformer.forward: alternating token-self / token→image /
    mlp / image→token attention, depth 2, then final token→image
    (transformer.py:16-240). General path: per-prompt dense prompts."""
    nh = cfg.decoder_heads
    queries, keys = tokens, src
    for i, layer in enumerate(params_dec["layers"]):
        if i == 0:
            # First layer: self-attention without PE, output REPLACES the
            # queries (no residual) — transformer.py TwoWayAttentionBlock
            # skip_first_layer_pe branch.
            queries = _attn(layer["self_attn"], queries, queries, queries, nh)
        else:
            q = queries + tokens
            attn_out = _attn(layer["self_attn"], q, q, queries, nh)
            queries = queries + attn_out
        queries = _layer_norm(queries, layer["norm1"], cfg.eps)

        q = queries + tokens
        k = keys + src_pe
        attn_out = _attn(layer["t2i"], q, k, keys, nh)
        queries = queries + attn_out
        queries = _layer_norm(queries, layer["norm2"], cfg.eps)

        mlp_out = _dense(jax.nn.relu(_dense(queries, layer["lin1"])),
                         layer["lin2"])
        queries = queries + mlp_out
        queries = _layer_norm(queries, layer["norm3"], cfg.eps)

        q = queries + tokens
        k = keys + src_pe
        attn_out = _attn(layer["i2t"], k, q, queries, nh)
        keys = keys + attn_out
        keys = _layer_norm(keys, layer["norm4"], cfg.eps)

    q = queries + tokens
    k = keys + src_pe
    attn_out = _attn(params_dec["final_attn"], q, k, keys, nh)
    queries = queries + attn_out
    queries = _layer_norm(queries, params_dec["norm_final"], cfg.eps)
    return queries, keys


def _run_two_way_shared(params_dec: Params, tokens, shared_src, src_pe_one,
                        cfg: SamArchConfig):
    """AMG fast path of the two-way transformer: every prompt shares the
    same image branch input (image embedding + the no-mask dense prompt).

    Bandwidth-driven restructuring (the decode stage is HBM-bound, ~25 GB
    touched per 256-prompt batch in the naive form):
    - the [B, M, D] image branch is materialized only from the point it
      becomes genuinely per-prompt (after the layer-1 i2t update);
    - layer-1 image-side projections run once on [1, M, D];
    - every later ``x + pe`` before a projection is folded algebraically
      (W(x+pe) = Wx + W·pe, with W·pe computed once per image) so no
      [B, M, D] sum temporaries hit HBM.
    Numerically equivalent to _run_two_way with broadcast dense prompts
    (float reassociation only)."""
    nh = cfg.decoder_heads
    queries = tokens
    keys = None
    kvt_next = None      # transposed k|v projection emitted by i2t_update
    layers = params_dec["layers"]
    for i, layer in enumerate(layers):
        if i == 0:
            queries = _attn(layer["self_attn"], queries, queries, queries, nh)
        else:
            q = queries + tokens
            attn_out = _attn(layer["self_attn"], q, q, queries, nh)
            queries = queries + attn_out
        queries = _layer_norm(queries, layer["norm1"], cfg.eps)

        # tokens → image
        q = queries + tokens
        img_side = shared_src if i == 0 else keys
        if _use_token_kernel(img_side.shape[1]):
            attn_out = _t2i_fused(layer["t2i"], q, img_side, src_pe_one,
                                  nh, kvt=kvt_next)
        elif i == 0:
            k1 = shared_src + src_pe_one
            attn_out = _attn_kv_shared(layer["t2i"], q, k1, shared_src, nh)
        else:
            pe_k = _dense_nobias(src_pe_one, layer["t2i"]["k"])
            k = _dense_nobias(keys, layer["t2i"]["k"]) + pe_k \
                + layer["t2i"]["k"]["b"]
            v = _dense(keys, layer["t2i"]["v"])
            attn_out = _attn_preprojected(layer["t2i"], q, k, v, nh)
        queries = queries + attn_out
        queries = _layer_norm(queries, layer["norm2"], cfg.eps)

        mlp_out = _dense(jax.nn.relu(_dense(queries, layer["lin1"])),
                         layer["lin2"])
        queries = queries + mlp_out
        queries = _layer_norm(queries, layer["norm3"], cfg.eps)

        # image → tokens
        q = queries + tokens
        pe_q = _dense_nobias(src_pe_one, layer["i2t"]["q"])
        img_side = shared_src if i == 0 else keys
        if _use_token_kernel(img_side.shape[1]):
            # fused q-proj + attention + out-proj + residual + LN: the
            # image branch stays in VMEM for the whole update, and the
            # kernel also emits the NEXT t2i's transposed k|v projection
            from revisit_anything_tpu.ops.attention import i2t_update
            ip = layer["i2t"]
            tok_k = _dense(q, ip["k"])
            tok_v = _dense(queries, ip["v"])
            nxt = (layers[i + 1]["t2i"] if i + 1 < len(layers)
                   else params_dec["final_attn"])
            w_kv_next = jnp.concatenate([nxt["k"]["w"], nxt["v"]["w"]],
                                        axis=1)
            keys, kvt_next = i2t_update(
                img_side, pe_q, tok_k, tok_v, ip["q"]["w"], ip["q"]["b"],
                ip["out"]["w"], ip["out"]["b"], layer["norm4"]["scale"],
                layer["norm4"]["bias"], nh, eps=cfg.eps,
                w_kv_next=w_kv_next)
        else:
            if i == 0:
                attn_out = _attn_i2t(layer["i2t"], shared_src, q, queries,
                                     nh, pe_q=pe_q)
                keys = shared_src + attn_out      # first [B, M, D] tensor
            else:
                attn_out = _attn_i2t(layer["i2t"], keys, q, queries, nh,
                                     pe_q=pe_q)
                keys = keys + attn_out
            keys = _layer_norm(keys, layer["norm4"], cfg.eps)

    q = queries + tokens
    fa = params_dec["final_attn"]
    if _use_token_kernel(keys.shape[1]):
        attn_out = _t2i_fused(fa, q, keys, src_pe_one, nh, kvt=kvt_next)
    else:
        pe_k = _dense_nobias(src_pe_one, fa["k"])
        k = _dense_nobias(keys, fa["k"]) + pe_k + fa["k"]["b"]
        v = _dense(keys, fa["v"])
        attn_out = _attn_preprojected(fa, q, k, v, nh)
    queries = queries + attn_out
    queries = _layer_norm(queries, params_dec["norm_final"], cfg.eps)
    return queries, keys


def _run_two_way_probs(params_dec: Params, tokens, shared_src, src_pe_one,
                       cfg: SamArchConfig, mask_head_ctx=None):
    """Probability-factored AMG two-way transformer (ops/decode_probs.py).

    The per-prompt image branch is never materialized: each i2t layer
    emits only its softmax probabilities P^T [B, H·T, M], and the layer-2
    t2i, the final token→image attention, and (in decode_masks) the mask
    head reconstruct the branch in VMEM from (img0, P, C). Token-side ops
    (self-attention, MLPs, out-projections, LayerNorms) stay in XLA —
    they are [B, T, D] sized.

    ``mask_head_ctx``: optional (decoder params, content) enabling the
    logits-emission mode (_use_tail_logits): the mask head runs inside
    the tail kernel and the third return value is the tagged tuple
    ("logits", mask logits [B, content, 16, 3]).

    Returns (queries, pstate, keys): exactly one of pstate/keys is
    non-None — pstate = (p1, c1m, p2, c2m, branch_rows) feeds
    ops.maskhead.fused_mask_head_probs; keys [B, M, D] (the fused tail's
    keys-emission mode, _use_tail_keys) feeds the plain mask head.
    """
    from revisit_anything_tpu.ops.decode_probs import (
        _block_diag_tokens_t, _pack_branch_vecs, i2t_probs, t2i_from_probs)
    nh = cfg.decoder_heads
    d = shared_src.shape[2]
    dtype = shared_src.dtype
    layers = params_dec["layers"]
    l1, l2 = layers[0], layers[1]
    fa = params_dec["final_attn"]
    da = l1["i2t"]["q"]["w"].shape[1]
    interpret = jax.default_backend() != "tpu"

    def t_proj(w, b, x):
        """einsum-transposed projection of a shared [1, M, D] tensor:
        [1, DA', M] = (x @ w + b)^T without a relayout."""
        pet = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
        out = jnp.einsum("dk,bmd->bkm", w.astype(x.dtype), x,
                         preferred_element_type=pet).astype(x.dtype)
        return out + b.astype(x.dtype)[None, :, None]

    img0t = jnp.transpose(shared_src, (0, 2, 1))            # [1, D, M]
    src_pe_img = shared_src + src_pe_one

    # ----- layer 1: token side + t2i (shared k/v projection pass) -----
    queries = _attn(l1["self_attn"], tokens, tokens, tokens, nh)
    queries = _layer_norm(queries, l1["norm1"], cfg.eps)
    q = queries + tokens
    if _use_token_kernel(shared_src.shape[1]):
        attn_out = _t2i_fused(l1["t2i"], q, shared_src, src_pe_one, nh)
    else:
        k1 = shared_src + src_pe_one
        attn_out = _attn_kv_shared(l1["t2i"], q, k1, shared_src, nh)
    queries = queries + attn_out
    queries = _layer_norm(queries, l1["norm2"], cfg.eps)
    mlp_out = _dense(jax.nn.relu(_dense(queries, l1["lin1"])), l1["lin2"])
    queries = queries + mlp_out
    queries = _layer_norm(queries, l1["norm3"], cfg.eps)

    # ----- layer-1 i2t → P1 (queries shared across prompts) -----
    i1 = l1["i2t"]
    q1st = t_proj(i1["q"]["w"], i1["q"]["b"], src_pe_img)   # [1, DA, M]
    tok_k1 = _dense(queries + tokens, i1["k"])
    tok_v1 = _dense(queries, i1["v"])
    c1m = jnp.einsum("bkd,de->bke", _block_diag_tokens_t(tok_v1, nh),
                     i1["out"]["w"].astype(dtype),
                     preferred_element_type=jnp.float32).astype(dtype)

    if _use_fused_tail():
        # ----- fused tail: layer-2 self-attn in XLA (batched), then ONE
        # kernel for P1 → keys1 → t2i → token mid-ops → P2 → keys2 →
        # final attention (ops/decode_fused.py) -----
        from revisit_anything_tpu.ops.decode_fused import decode_tail_fused
        q = queries + tokens
        attn_out = _attn(l2["self_attn"], q, q, queries, nh)
        queries_b = _layer_norm(queries + attn_out, l2["norm1"], cfg.eps)
        i2 = l2["i2t"]
        peq2t = t_proj(i2["q"]["w"], i2["q"]["b"], src_pe_one)
        pek2t = t_proj(l2["t2i"]["k"]["w"], l2["t2i"]["k"]["b"],
                       src_pe_one)
        pekft = t_proj(fa["k"]["w"], fa["k"]["b"], src_pe_one)
        if (mask_head_ctx is not None and _use_tail_keys()
                and _use_tail_logits()):
            mh_params, content = mask_head_ctx
            queries_out, logits = decode_tail_fused(
                img0t, q1st, peq2t, pek2t, pekft, tok_k1, c1m, queries_b,
                tokens.astype(queries_b.dtype), l2, fa, i1, l1["norm4"],
                params_dec["norm_final"], nh, eps=cfg.eps,
                interpret=interpret, mask_head=mh_params, content=content)
            return queries_out, None, ("logits", logits)
        if _use_tail_keys():
            queries_out, keys2 = decode_tail_fused(
                img0t, q1st, peq2t, pek2t, pekft, tok_k1, c1m, queries_b,
                tokens.astype(queries_b.dtype), l2, fa, i1, l1["norm4"],
                params_dec["norm_final"], nh, eps=cfg.eps,
                interpret=interpret, emit_keys=True)
            return queries_out, None, keys2
        queries_out, p1, p2, c2m = decode_tail_fused(
            img0t, q1st, peq2t, pek2t, pekft, tok_k1, c1m, queries_b,
            tokens.astype(queries_b.dtype), l2, fa, i1, l1["norm4"],
            params_dec["norm_final"], nh, eps=cfg.eps,
            interpret=interpret)
        branch_rows = _pack_branch_rows(i1, l1["norm4"], i2, l2["norm4"],
                                        d, dtype)
        return queries_out, (p1, c1m, p2, c2m, branch_rows), None

    p1 = i2t_probs(q1st, tok_k1, nh, layer=1, eps=cfg.eps,
                   interpret=interpret)                     # [B, HT, M]

    # ----- layer 2: token side -----
    q = queries + tokens
    attn_out = _attn(l2["self_attn"], q, q, queries, nh)
    queries = queries + attn_out
    queries = _layer_norm(queries, l2["norm1"], cfg.eps)

    t2 = l2["t2i"]
    q_tok = _dense(queries + tokens, t2["q"])
    vecs_t2 = _pack_branch_vecs(d, da, dtype, i1["out"]["b"],
                                l1["norm4"]["scale"], l1["norm4"]["bias"],
                                v_bias=t2["v"]["b"])
    pek2t = t_proj(t2["k"]["w"], t2["k"]["b"], src_pe_one)
    attn_pre = t2i_from_probs(q_tok, img0t, p1, c1m, None, None,
                              t2["k"]["w"], t2["v"]["w"], pek2t, vecs_t2,
                              nh, eps=cfg.eps, interpret=interpret)
    queries = queries + _dense(attn_pre, t2["out"])
    queries = _layer_norm(queries, l2["norm2"], cfg.eps)
    mlp_out = _dense(jax.nn.relu(_dense(queries, l2["lin1"])), l2["lin2"])
    queries = queries + mlp_out
    queries = _layer_norm(queries, l2["norm3"], cfg.eps)

    # ----- layer-2 i2t → P2 (queries reconstructed in-kernel) -----
    i2 = l2["i2t"]
    tok_k2 = _dense(queries + tokens, i2["k"])
    tok_v2 = _dense(queries, i2["v"])
    peq2t = t_proj(i2["q"]["w"], i2["q"]["b"], src_pe_one)
    vecs_l1 = _pack_branch_vecs(d, da, dtype, i1["out"]["b"],
                                l1["norm4"]["scale"], l1["norm4"]["bias"])
    p2 = i2t_probs(None, tok_k2, nh, layer=2,
                   recon=(img0t, p1, c1m, peq2t,
                          i2["q"]["w"].astype(dtype), vecs_l1),
                   eps=cfg.eps, interpret=interpret)
    c2m = jnp.einsum("bkd,de->bke", _block_diag_tokens_t(tok_v2, nh),
                     i2["out"]["w"].astype(dtype),
                     preferred_element_type=jnp.float32).astype(dtype)

    # ----- final token→image attention (branch depth 2) -----
    q_tok = _dense(queries + tokens, fa["q"])
    vecs_fa = _pack_branch_vecs(d, da, dtype, i1["out"]["b"],
                                l1["norm4"]["scale"], l1["norm4"]["bias"],
                                b2=i2["out"]["b"],
                                s2=l2["norm4"]["scale"],
                                bi2=l2["norm4"]["bias"],
                                v_bias=fa["v"]["b"])
    pekft = t_proj(fa["k"]["w"], fa["k"]["b"], src_pe_one)
    attn_pre = t2i_from_probs(q_tok, img0t, p1, c1m, p2, c2m,
                              fa["k"]["w"], fa["v"]["w"], pekft, vecs_fa,
                              nh, eps=cfg.eps, interpret=interpret)
    queries = queries + _dense(attn_pre, fa["out"])
    queries = _layer_norm(queries, params_dec["norm_final"], cfg.eps)

    branch_rows = _pack_branch_rows(i1, l1["norm4"], i2, l2["norm4"],
                                    d, dtype)
    return queries, (p1, c1m, p2, c2m, branch_rows), None


def _pack_branch_rows(i1, l1n4, i2, l2n4, d: int, dtype) -> jnp.ndarray:
    """[8, D] branch-reconstruction constants for
    ops.maskhead.fused_mask_head_probs, rows 0-5 in its consumption order
    (layer-1 b_out / LN scale / LN bias, then layer-2). ONE packing shared
    by the fused-tail and split probs paths — the parity tests compare the
    two, so the row layout must never desynchronize."""
    rows = jnp.zeros((8, d), dtype)
    rows = rows.at[0].set(i1["out"]["b"].astype(dtype))
    rows = rows.at[1].set(l1n4["scale"].astype(dtype))
    rows = rows.at[2].set(l1n4["bias"].astype(dtype))
    rows = rows.at[3].set(i2["out"]["b"].astype(dtype))
    rows = rows.at[4].set(l2n4["scale"].astype(dtype))
    rows = rows.at[5].set(l2n4["bias"].astype(dtype))
    return rows


def _attn_preprojected(attn_p, q, k, v, num_heads: int):
    """Attention whose k/v are ALREADY projected (used by the shared path
    where the pe term is folded into the k projection)."""
    q = _dense(q, attn_p["q"])
    b, nq, d = q.shape
    hd = d // num_heads
    qh = q.reshape(b, nq, num_heads, hd)
    kh = k.reshape(b, k.shape[1], num_heads, hd)
    vh = v.reshape(b, v.shape[1], num_heads, hd)
    logits = jnp.einsum("bnhd,bmhd->bhnm", qh, kh,
                        preferred_element_type=jnp.float32) / (hd ** 0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return _dense(out.reshape(b, nq, d), attn_p["out"])


def _upscale_masks_blocks(src_flat: jnp.ndarray, hyper: jnp.ndarray,
                          dec: Params, cfg: SamArchConfig,
                          interleave: bool = True) -> jnp.ndarray:
    """Upscaler + hypernetwork mask heads in block layout — NO activation
    transposes.

    Both transposed convs have kernel == stride == 2, so there is zero
    spatial mixing: output pixel (4i+2a1+a2, 4j+2b1+b2) depends only on
    input pixel (i, j). The whole chain therefore runs on [Np, g², *]
    tensors with the 2x2 block structure kept in the channel axis; only
    the final (small, f32) mask tensor is interleaved back to spatial
    layout. Bit-equivalent to running the two ConvTranspose(k=2, s=2)
    stages spatially (each is a per-position matmul whose output expands
    to a 2x2 block — zero spatial mixing) followed by the mask einsum.

    Args:
      src_flat: [Np, g², D].
      hyper: [Np, M, D/8] hypernetwork weights.
    Returns masks [Np, M, 4g, 4g] f32.
    """
    np_, gg, d = src_flat.shape
    g = cfg.grid
    m = hyper.shape[1]
    c1 = d // 4          # up1 out channels
    c2 = d // 8          # up2 out channels

    # convt1: [Np, g², D] @ [D, 4·c1] → blocks (a1, b1, c1)
    y = jnp.dot(src_flat, dec["up1_w"],
                preferred_element_type=jnp.float32).astype(src_flat.dtype)
    y = y.reshape(np_, gg, 4, c1) + dec["up1_b"]
    # channel LN per (position, a1b1 block) — f32 compute (fast VPU path)
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.var(yf, axis=-1, keepdims=True)
    yf = (yf - mu) * jax.lax.rsqrt(var + cfg.eps) * dec["up_ln"]["scale"] \
        + dec["up_ln"]["bias"]
    y = jax.nn.gelu(yf, approximate=False).astype(y.dtype)

    # convt2 within each a1b1 block: [.., c1] @ [c1, 4·c2]
    y = jnp.einsum("npqc,cd->npqd", y, dec["up2_w"],
                   preferred_element_type=jnp.float32).astype(y.dtype)
    y = y.reshape(np_, gg, 4, 4, c2) + dec["up2_b"]
    y = jax.nn.gelu(y, approximate=False)

    # hypernetwork: [Np, g², 4, 4, c2] x [Np, M, c2] → [Np, M, g², 4, 4]
    masks = jnp.einsum("npqrc,nmc->nmpqr", y, hyper.astype(y.dtype),
                       preferred_element_type=jnp.float32)

    if not interleave:
        # Block-path (AMG) mask logits stay in the activation dtype: they
        # are products of bf16 inputs, so a bf16 store costs one extra
        # rounding but halves ~2 GB of HBM traffic per 256-prompt batch
        # (the downstream bilinear upscale re-accumulates in f32).
        masks = masks.astype(y.dtype)
        # Block layout [Np, g², 16, M]: position = (i·g + j), dim 2 =
        # (q, r) = (2a1+b1, 2a2+b2) with spatial row = 4i+2a1+a2,
        # col = 4j+2b1+b2; mask token minor (the fused kernel's native
        # output order). Consumers that immediately resize (the AMG
        # postprocess) fold the interleave into their resize matrices
        # instead — the 1 GB f32 spatial tensor plus its XLA layout
        # copies never hit HBM.
        return masks.transpose(0, 2, 3, 4, 1).reshape(np_, gg, 16, m)

    # interleave blocks to spatial: row = 4i + 2a1 + a2, col = 4j+2b1+b2
    masks = masks.reshape(np_, m, g, g, 2, 2, 2, 2)
    #            (n, m, i, j, a1, b1, a2, b2) → (n, m, i, a1, a2, j, b1, b2)
    masks = masks.transpose(0, 1, 2, 4, 6, 3, 5, 7)
    return masks.reshape(np_, m, 4 * g, 4 * g)


def _mlp(x, layers):
    for i, p in enumerate(layers):
        x = _dense(x, p)
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return x


@partial(jax.jit, static_argnames=("cfg", "multimask", "dense_shared",
                                   "block_layout", "probs_path",
                                   "mask_rows"))
def decode_masks(params: Params, cfg: SamArchConfig,
                 image_embedding: jnp.ndarray,
                 image_pe: jnp.ndarray,
                 sparse_prompts: jnp.ndarray,
                 dense_prompts: jnp.ndarray,
                 multimask: bool = True,
                 dense_shared: bool = False,
                 block_layout: bool = False,
                 probs_path: Optional[bool] = None,
                 mask_rows: Optional[int] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode masks for a batch of prompts against ONE image embedding.

    Args:
      image_embedding: [64, 64, 256] from encode_image (single image).
      image_pe: [64, 64, 256] dense positional embedding.
      sparse_prompts: [Np, T, 256] per-prompt sparse embeddings.
      dense_prompts: [Np, 64, 64, 256] (no-mask embedding for AMG).
      block_layout: return masks as [Np, g², 16, M] blocks (position,
        (q, r) 2x2-of-2x2 block index, mask token) instead of spatial
        [Np, M, 4g, 4g] (see _upscale_masks_blocks / ops.maskhead) — for
        consumers that fold the interleave into a following resize. On
        TPU this path runs the fused upscaler+hypernetwork Pallas kernel.
      mask_rows: compute mask logits only for the first ``mask_rows``
        token ROWS (requires block_layout). SAM pads inputs to a 1024²
        square (sam.py preprocess), so for landscape inputs the bottom
        embedding rows cover pure padding; postprocess_masks crops them
        away (sam.py:144-174), i.e. their resize weights are exactly
        zero and skipping them is BIT-IDENTICAL in the final masks. The
        attention layers still run on all positions (pad tokens
        contribute keys/values — numerics parity). Callers derive the
        row count from the composed resize matrix (amg._decode_batch).

    Returns:
      (low_res_masks [Np, M, 256, 256] — or block layout
      [Np, mask_rows·g, 16, M], iou_pred [Np, M]) where M = 3 for
      multimask (tokens 1..3) else 1 (token 0) — mask_decoder.py:96-144.
    """
    from revisit_anything_tpu.utils.packing import maybe_unpack
    params = maybe_unpack(params)
    dec = params["decoder"]
    np_, t, d = sparse_prompts.shape
    g = cfg.grid
    assert mask_rows is None or (block_layout and 0 < mask_rows <= g), \
        (mask_rows, block_layout)
    content = None if mask_rows in (None, g) else mask_rows * g

    out_tokens = jnp.concatenate([dec["iou_token"], dec["mask_tokens"]],
                                 axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens[None], (np_,) + out_tokens.shape),
         sparse_prompts.astype(out_tokens.dtype)], axis=1)

    use_probs = (_use_probs_path(g * g) if probs_path is None
                 else probs_path)
    pstate = None
    if dense_shared and block_layout and use_probs:
        # Probability-factored path: the per-prompt branch exists only as
        # i2t softmax probabilities; the mask head reconstructs it.
        shared_src = (image_embedding[None]
                      + dense_prompts[:1]).reshape(1, g * g, d)
        src_pe_one = image_pe.reshape(1, g * g, d).astype(shared_src.dtype)
        # logits-emission eligibility: multimask only (the in-kernel
        # hypernetwork hardcodes mask tokens 1..3)
        mh_ctx = ((dec, content if content is not None else g * g)
                  if multimask else None)
        queries, pstate, keys = _run_two_way_probs(dec, tokens, shared_src,
                                                   src_pe_one, cfg,
                                                   mask_head_ctx=mh_ctx)
    elif dense_shared:
        # AMG: the identical no-mask dense prompt for every point — the
        # image branch stays a single [1, M, D] tensor until it genuinely
        # diverges per prompt (see _run_two_way_shared).
        shared_src = (image_embedding[None]
                      + dense_prompts[:1]).reshape(1, g * g, d)
        src_pe_one = image_pe.reshape(1, g * g, d).astype(shared_src.dtype)
        queries, keys = _run_two_way_shared(dec, tokens, shared_src,
                                            src_pe_one, cfg)
    else:
        src = image_embedding[None] + dense_prompts
        src = src.reshape(np_, g * g, d)
        src_pe = jnp.broadcast_to(image_pe.reshape(1, g * g, d),
                                  (np_, g * g, d)).astype(src.dtype)
        queries, keys = _run_two_way(dec, tokens, src, src_pe, cfg)

    iou_token_out = queries[:, 0]
    mask_tokens_out = queries[:, 1:1 + cfg.num_mask_tokens]

    if isinstance(keys, tuple) and keys[0] == "logits":
        # logits-emission mode: the mask head + hypernetwork already ran
        # inside the tail kernel; only the iou head remains.
        iou_pred = _mlp(iou_token_out, dec["iou_head"])
        return keys[1], iou_pred[:, 1:]

    # Select the output tokens BEFORE the (expensive) mask einsum: the
    # unused token's 256 MB mask plane and the resulting slice copies are
    # never computed (mask_decoder.py:96-144 selects after; same result).
    token_ids = (list(range(1, cfg.num_mask_tokens)) if multimask
                 else [0])
    hyper = jnp.stack(
        [_mlp(mask_tokens_out[:, i], dec["hyper_mlps"][i])
         for i in token_ids], axis=1)                    # [Np, M, d/8]
    if pstate is not None:
        from revisit_anything_tpu.ops.maskhead import fused_mask_head_probs
        p1, c1m, p2, c2m, branch_rows = pstate
        shared_src = (image_embedding[None]
                      + dense_prompts[:1]).reshape(1, g * g, d)
        masks = fused_mask_head_probs(
            shared_src, p1, c1m, p2, c2m, branch_rows, hyper,
            dec["up1_w"], dec["up1_b"],
            dec["up_ln"]["scale"], dec["up_ln"]["bias"],
            dec["up2_w"], dec["up2_b"], eps=cfg.eps, ln_eps=cfg.eps,
            content=content,
            interpret=jax.default_backend() != "tpu")    # [Np, g², 16, M]
    elif (block_layout and not _MASKHEAD_DISABLED
            and _use_token_kernel(keys.shape[1])):
        from revisit_anything_tpu.ops.maskhead import fused_mask_head
        masks = fused_mask_head(
            keys, hyper, dec["up1_w"], dec["up1_b"],
            dec["up_ln"]["scale"], dec["up_ln"]["bias"],
            dec["up2_w"], dec["up2_b"], eps=cfg.eps,
            content=content)                             # [Np, g², 16, M]
    else:
        keys_c = keys if content is None else keys[:, :content]
        masks = _upscale_masks_blocks(keys_c, hyper, dec, cfg,
                                      interleave=not block_layout)

    iou_pred = _mlp(iou_token_out, dec["iou_head"])

    if multimask:
        return masks, iou_pred[:, 1:]
    return masks, iou_pred[:, :1]
