"""Pallas flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from revisit_anything_tpu.ops.attention import attend


def xla_attention(q, k, v, bias=None):
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   precision=jax.lax.Precision.HIGHEST) * scale
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v,
                      precision=jax.lax.Precision.HIGHEST)


def test_plain_attention_matches_xla(rng):
    q = rng.standard_normal((2, 3, 256, 64)).astype(np.float32)
    k = rng.standard_normal((2, 3, 256, 64)).astype(np.float32)
    v = rng.standard_normal((2, 3, 256, 64)).astype(np.float32)
    ours = np.asarray(attend(q, k, v, block_q=128))
    ref = np.asarray(xla_attention(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_padded_sequence_masked(rng):
    # N=200 pads to 256; padded keys must not contribute
    q = rng.standard_normal((1, 2, 200, 32)).astype(np.float32)
    k = rng.standard_normal((1, 2, 200, 32)).astype(np.float32)
    v = rng.standard_normal((1, 2, 200, 32)).astype(np.float32)
    ours = np.asarray(attend(q, k, v, block_q=128))
    ref = np.asarray(xla_attention(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_decomposed_bias_matches_xla(rng):
    side = 16
    n = side * side
    q = rng.standard_normal((1, 2, n, 40)).astype(np.float32)
    k = rng.standard_normal((1, 2, n, 40)).astype(np.float32)
    v = rng.standard_normal((1, 2, n, 40)).astype(np.float32)
    bh = rng.standard_normal((1, 2, n, side)).astype(np.float32)
    bw = rng.standard_normal((1, 2, n, side)).astype(np.float32)
    bias = (bh[..., :, None] + bw[..., None, :]).reshape(1, 2, n, n)
    ours = np.asarray(attend(q, k, v, bh, bw, side=side, block_q=128))
    ref = np.asarray(xla_attention(q, k, v, bias))
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_head_dim_padding(rng):
    # head_dim 80 (SAM ViT-H) pads to 128 internally
    q = rng.standard_normal((1, 1, 128, 80)).astype(np.float32)
    k = rng.standard_normal((1, 1, 128, 80)).astype(np.float32)
    v = rng.standard_normal((1, 1, 128, 80)).astype(np.float32)
    ours = np.asarray(attend(q, k, v, block_q=128))
    ref = np.asarray(xla_attention(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_token_cross_attend_matches_xla(rng):
    """Fused tokens→image attention (transposed k/v layout) vs the plain
    XLA reference, incl. the shared-kv (B=1) variant."""
    import jax.numpy as jnp
    from revisit_anything_tpu.ops.attention import token_cross_attend

    b, n, heads, hd, m = 3, 7, 4, 16, 200
    d = heads * hd
    q = rng.standard_normal((b, n, d)).astype(np.float32)
    k = rng.standard_normal((b, m, d)).astype(np.float32)
    v = rng.standard_normal((b, m, d)).astype(np.float32)

    def ref(q, k, v):
        qh = q.reshape(b, n, heads, hd)
        kh = k.reshape(-1, m, heads, hd)
        vh = v.reshape(-1, m, heads, hd)
        logits = np.einsum("bnhd,bmhd->bhnm", qh,
                           np.broadcast_to(kh, (b, m, heads, hd))) \
            / np.sqrt(hd)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        p = e / e.sum(-1, keepdims=True)
        out = np.einsum("bhnm,bmhd->bnhd", p,
                        np.broadcast_to(vh, (b, m, heads, hd)))
        return out.reshape(b, n, d)

    kt = jnp.asarray(k.transpose(0, 2, 1))
    vt = jnp.asarray(v.transpose(0, 2, 1))
    out = np.asarray(token_cross_attend(jnp.asarray(q), kt, vt, heads))
    np.testing.assert_allclose(out, ref(q, k, v), atol=2e-5)

    # shared k/v (B=1)
    ks, vs = k[:1], v[:1]
    outs = np.asarray(token_cross_attend(
        jnp.asarray(q), jnp.asarray(ks.transpose(0, 2, 1)),
        jnp.asarray(vs.transpose(0, 2, 1)), heads))
    np.testing.assert_allclose(outs, ref(q, ks, vs), atol=2e-5)


def test_token_cross_attend_kv_matches_split(rng):
    """Combined-kv variant (one projection pass, pe/bias folded in-kernel)
    vs token_cross_attend on pre-added k/v."""
    import jax.numpy as jnp
    from revisit_anything_tpu.ops.attention import (token_cross_attend,
                                                    token_cross_attend_kv)

    b, n, heads, hd, m = 3, 7, 4, 16, 160
    d = heads * hd
    q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    kvt = jnp.asarray(rng.standard_normal((b, 2 * d, m)), jnp.float32)
    pe_kt = jnp.asarray(rng.standard_normal((1, d, m)), jnp.float32)
    v_bias = jnp.asarray(rng.standard_normal((d,)), jnp.float32)

    kt = kvt[:, :d] + pe_kt
    vt = kvt[:, d:] + v_bias[None, :, None]
    ref = np.asarray(token_cross_attend(q, kt, vt, heads))
    out = np.asarray(token_cross_attend_kv(q, kvt, pe_kt, v_bias, heads))
    np.testing.assert_allclose(out, ref, atol=2e-5)

    # shared kv (B=1)
    ref1 = np.asarray(token_cross_attend(q, kt[:1], vt[:1], heads))
    out1 = np.asarray(token_cross_attend_kv(q, kvt[:1], pe_kt, v_bias,
                                            heads))
    np.testing.assert_allclose(out1, ref1, atol=2e-5)


def test_i2t_update_matches_xla(rng):
    """Fused image->tokens update (q-proj + mha + out-proj + residual +
    LN) vs a plain XLA reference: shared and per-prompt image branches,
    square and downsampled (DA = D/2, SAM's cross-attn) projections."""
    import jax.numpy as jnp
    from revisit_anything_tpu.ops.attention import i2t_update

    b, t, heads, m = 3, 7, 4, 256
    d = 64
    eps = 1e-6

    for da in (d, d // 2):
        hd = da // heads
        tok_k = rng.standard_normal((b, t, da)).astype(np.float32)
        tok_v = rng.standard_normal((b, t, da)).astype(np.float32)
        w_q = (rng.standard_normal((d, da)) * 0.1).astype(np.float32)
        b_q = rng.standard_normal((da,)).astype(np.float32)
        w_out = (rng.standard_normal((da, d)) * 0.1).astype(np.float32)
        b_out = rng.standard_normal((d,)).astype(np.float32)
        ln_s = (rng.standard_normal((d,)) + 1.0).astype(np.float32)
        ln_b = rng.standard_normal((d,)).astype(np.float32)
        peq = rng.standard_normal((1, m, da)).astype(np.float32)

        def ref(img):
            q = img @ w_q + peq + b_q                   # [B or 1, m, da]
            q = np.broadcast_to(q, (b, m, da))
            qh = q.reshape(b, m, heads, hd)
            kh = tok_k.reshape(b, t, heads, hd)
            vh = tok_v.reshape(b, t, heads, hd)
            logits = np.einsum("bmhd,bthd->bhmt", qh, kh) / np.sqrt(hd)
            e = np.exp(logits - logits.max(-1, keepdims=True))
            p = e / e.sum(-1, keepdims=True)
            attn = np.einsum("bhmt,bthd->bmhd", p, vh).reshape(b, m, da)
            out = attn @ w_out + b_out
            y = np.broadcast_to(img, (b, m, d)) + out
            mu = y.mean(-1, keepdims=True)
            var = y.var(-1, keepdims=True)
            return (y - mu) / np.sqrt(var + eps) * ln_s + ln_b

        for bb in (b, 1):
            img = rng.standard_normal((bb, m, d)).astype(np.float32)
            out = np.asarray(i2t_update(
                jnp.asarray(img), jnp.asarray(peq), jnp.asarray(tok_k),
                jnp.asarray(tok_v), jnp.asarray(w_q), jnp.asarray(b_q),
                jnp.asarray(w_out), jnp.asarray(b_out), jnp.asarray(ln_s),
                jnp.asarray(ln_b), heads, eps=eps, block=128))
            np.testing.assert_allclose(out, ref(img), atol=3e-4,
                                       rtol=1e-4)


def test_i2t_update_emits_next_kv(rng):
    """i2t_update(w_kv_next=...) must return kvt equal to the transposed
    k|v projection of the updated image branch."""
    import jax.numpy as jnp
    from revisit_anything_tpu.ops.attention import i2t_update

    b, t, heads, m, d = 2, 7, 4, 256, 64
    da = d // 2
    hd = da // heads
    img = jnp.asarray(rng.standard_normal((b, m, d)), jnp.float32)
    peq = jnp.asarray(rng.standard_normal((1, m, da)), jnp.float32)
    tok_k = jnp.asarray(rng.standard_normal((b, t, da)), jnp.float32)
    tok_v = jnp.asarray(rng.standard_normal((b, t, da)), jnp.float32)
    w_q = jnp.asarray(rng.standard_normal((d, da)) * 0.1, jnp.float32)
    b_q = jnp.asarray(rng.standard_normal((da,)), jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((da, d)) * 0.1, jnp.float32)
    b_out = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
    ln_s = jnp.asarray(rng.standard_normal((d,)) + 1.0, jnp.float32)
    ln_b = jnp.asarray(rng.standard_normal((d,)), jnp.float32)
    w_kv = jnp.asarray(rng.standard_normal((d, 2 * da)) * 0.1, jnp.float32)

    ref_keys = i2t_update(img, peq, tok_k, tok_v, w_q, b_q, w_out, b_out,
                          ln_s, ln_b, heads, block=128)
    keys2, kvt = i2t_update(img, peq, tok_k, tok_v, w_q, b_q, w_out,
                            b_out, ln_s, ln_b, heads, block=128,
                            w_kv_next=w_kv)
    np.testing.assert_allclose(np.asarray(keys2), np.asarray(ref_keys),
                               atol=1e-5)
    want = np.einsum("dk,bmd->bkm", np.asarray(w_kv), np.asarray(ref_keys))
    np.testing.assert_allclose(np.asarray(kvt), want, atol=2e-4, rtol=1e-4)
