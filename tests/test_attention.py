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
