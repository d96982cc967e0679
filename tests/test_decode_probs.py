"""Kernel-level oracles for the probability-factored decode
(ops/decode_probs.py) — interpret mode vs plain-jnp references."""

import numpy as np

import jax
import jax.numpy as jnp

from revisit_anything_tpu.ops.decode_probs import (
    _block_diag_tokens_t, _pack_branch_vecs, i2t_probs, t2i_from_probs)

B, M, D, DA, H, T = 3, 64, 32, 16, 4, 7
HD = DA // H
EPS = 1e-6


def _mk(rng):
    img0 = rng.standard_normal((1, M, D)).astype(np.float32)
    pe = rng.standard_normal((1, M, D)).astype(np.float32)
    tok_k = rng.standard_normal((B, T, DA)).astype(np.float32)
    tok_v = rng.standard_normal((B, T, DA)).astype(np.float32)
    wq = rng.standard_normal((D, DA)).astype(np.float32) * 0.1
    bq = rng.standard_normal((DA,)).astype(np.float32) * 0.1
    wout = rng.standard_normal((DA, D)).astype(np.float32) * 0.1
    bout = rng.standard_normal((D,)).astype(np.float32) * 0.1
    g4 = 1.0 + 0.1 * rng.standard_normal((D,)).astype(np.float32)
    b4 = 0.1 * rng.standard_normal((D,)).astype(np.float32)
    return img0, pe, tok_k, tok_v, wq, bq, wout, bout, g4, b4


def _probs_oracle(q_img, tok_k):
    """Per-head i2t softmax probs, [b, M, H·T] (then transposed)."""
    b = tok_k.shape[0]
    qh = q_img.reshape(M, H, HD)
    kh = tok_k.reshape(b, T, H, HD)
    logits = np.einsum("mhd,bthd->bhmt", qh, kh) / np.sqrt(HD)
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    p = e / e.sum(axis=-1, keepdims=True)                 # [b, H, M, T]
    # lane order h·T + t
    return p.transpose(0, 2, 1, 3).reshape(b, M, H * T)


def _branch_oracle(img0, p_bmk, tok_v, wout, bout, g4, b4):
    """keys = LN(img0 + P @ Vbd @ Wout + bout)."""
    vbd = np.asarray(_block_diag_tokens_t(jnp.asarray(tok_v), H))
    a = p_bmk @ vbd @ wout + bout                         # [B, M, D]
    y = img0 + a
    mu = y.mean(-1, keepdims=True)
    var = y.var(-1, keepdims=True)
    return (y - mu) / np.sqrt(var + EPS) * g4 + b4


def test_i2t_probs_layer1_matches_oracle(rng):
    img0, pe, tok_k, _, wq, bq, _, _, _, _ = _mk(rng)
    q_img = (img0[0] + pe[0]) @ wq + bq                   # [M, DA]
    want = _probs_oracle(q_img, tok_k)                    # [B, M, HT]

    qst = jnp.asarray(q_img.T[None])                      # [1, DA, M]
    got_t = np.asarray(i2t_probs(qst, jnp.asarray(tok_k), H, layer=1,
                                 eps=EPS, interpret=True))
    got = got_t.transpose(0, 2, 1)                        # [B, M, HT]
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
    # probabilities: each head-group row sums to 1
    sums = got.reshape(B, M, H, T).sum(-1)
    np.testing.assert_allclose(sums, 1.0, atol=2e-2)


def test_i2t_probs_layer2_recon_matches_oracle(rng):
    img0, pe, tok_k, tok_v, wq, bq, wout, bout, g4, b4 = _mk(rng)
    # layer-1 state
    q1 = (img0[0] + pe[0]) @ wq + bq
    p1 = _probs_oracle(q1, tok_k)
    keys1 = _branch_oracle(img0, p1, tok_v, wout, bout, g4, b4)

    # a distinct layer-2 i2t projection + tokens
    rng2 = np.random.default_rng(5)
    wq2 = rng2.standard_normal((D, DA)).astype(np.float32) * 0.1
    bq2 = rng2.standard_normal((DA,)).astype(np.float32) * 0.1
    tok_k2 = rng2.standard_normal((B, T, DA)).astype(np.float32)
    want = np.stack([_probs_oracle((keys1[b] + pe[0]) @ wq2 + bq2,
                                   tok_k2[b:b + 1])[0] for b in range(B)])

    c1m = np.asarray(_block_diag_tokens_t(jnp.asarray(tok_v), H)) @ wout
    peq2t = ((pe[0] @ wq2 + bq2).T)[None]                 # [1, DA, M]
    vecs = _pack_branch_vecs(D, DA, jnp.float32, jnp.asarray(bout),
                             jnp.asarray(g4), jnp.asarray(b4))
    p1t = jnp.asarray(p1.transpose(0, 2, 1))              # [B, HT, M]
    got_t = np.asarray(i2t_probs(
        None, jnp.asarray(tok_k2), H, layer=2,
        recon=(jnp.asarray(img0.transpose(0, 2, 1)), p1t,
               jnp.asarray(c1m.astype(np.float32)), jnp.asarray(peq2t),
               jnp.asarray(wq2), vecs),
        eps=EPS, interpret=True))
    np.testing.assert_allclose(got_t.transpose(0, 2, 1), want,
                               atol=3e-2, rtol=3e-2)


def test_t2i_from_probs_depth1_matches_oracle(rng):
    img0, pe, tok_k, tok_v, wq, bq, wout, bout, g4, b4 = _mk(rng)
    q1 = (img0[0] + pe[0]) @ wq + bq
    p1 = _probs_oracle(q1, tok_k)
    keys1 = _branch_oracle(img0, p1, tok_v, wout, bout, g4, b4)

    rng2 = np.random.default_rng(9)
    wk = rng2.standard_normal((D, DA)).astype(np.float32) * 0.1
    bk = rng2.standard_normal((DA,)).astype(np.float32) * 0.1
    wv = rng2.standard_normal((D, DA)).astype(np.float32) * 0.1
    bv = rng2.standard_normal((DA,)).astype(np.float32) * 0.1
    q_tok = rng2.standard_normal((B, T, DA)).astype(np.float32)

    # oracle t2i attention (pre-out-projection)
    k = (keys1 + pe) @ wk + bk                            # [B, M, DA]
    v = keys1 @ wv + bv
    qh = q_tok.reshape(B, T, H, HD)
    kh = k.reshape(B, M, H, HD)
    vh = v.reshape(B, M, H, HD)
    logits = np.einsum("bthd,bmhd->bhtm", qh, kh) / np.sqrt(HD)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    pr = e / e.sum(-1, keepdims=True)
    want = np.einsum("bhtm,bmhd->bthd", pr, vh).reshape(B, T, DA)

    c1m = (np.asarray(_block_diag_tokens_t(jnp.asarray(tok_v), H))
           @ wout).astype(np.float32)
    pekt = ((pe[0] @ wk + bk).T)[None]
    vecs = _pack_branch_vecs(D, DA, jnp.float32, jnp.asarray(bout),
                             jnp.asarray(g4), jnp.asarray(b4),
                             v_bias=jnp.asarray(bv))
    got = np.asarray(t2i_from_probs(
        jnp.asarray(q_tok), jnp.asarray(img0.transpose(0, 2, 1)),
        jnp.asarray(p1.transpose(0, 2, 1)), jnp.asarray(c1m),
        None, None, jnp.asarray(wk), jnp.asarray(wv), jnp.asarray(pekt),
        vecs, H, eps=EPS, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


def test_probs_pps_matches_single(rng):
    """Layer-1 prompts-per-step batching (shared queries, stacked key
    rows) must emit the same probabilities as one prompt per step."""
    import jax.numpy as jnp

    from revisit_anything_tpu.ops.decode_probs import i2t_probs

    b, t, heads, hd, m = 8, 7, 4, 8, 64
    da = heads * hd
    qst = jnp.asarray(rng.standard_normal((1, da, m)).astype(np.float32))
    tok_k = jnp.asarray(
        rng.standard_normal((b, t, da)).astype(np.float32))
    base = np.asarray(i2t_probs(qst, tok_k, heads, layer=1,
                                interpret=True), np.float32)
    for pps in (2, 4, 8):
        got = np.asarray(i2t_probs(qst, tok_k, heads, layer=1,
                                   interpret=True, pps=pps), np.float32)
        np.testing.assert_allclose(got, base, atol=2e-7, err_msg=str(pps))
