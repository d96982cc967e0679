"""Parity tests for the fused windowed-attention kernel (ops/winattn.py)
against the encoder's XLA windowed path — the production oracle it
replaces on TPU (encoder._attention, image_encoder.py:185-240 semantics).

Interpret mode (CPU): numerics only. Mosaic lane/layout legality at the
production 25x16x196 shapes is covered by scripts/compile_sweep.py
(encode_image lowers the kernel on the real backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revisit_anything_tpu.models.sam import encoder as enc_mod
from revisit_anything_tpu.models.sam.config import SamArchConfig
from revisit_anything_tpu.ops.winattn import windowed_attend

TINY = SamArchConfig(encoder_dim=32, encoder_depth=2, encoder_heads=4,
                     global_attn_indexes=(1,), image_size=64,
                     patch_size=8, window_size=4)


def _blk_params(rng, d, hd, side, dtype):
    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.1, dtype)
    return {
        "qkv": {"w": w(d, 3 * d), "b": w(3 * d)},
        "proj": {"w": w(d, d), "b": w(d)},
        "rel_pos_h": w(2 * side - 1, hd),
        "rel_pos_w": w(2 * side - 1, hd),
    }


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 5e-2)])
def test_windowed_attend_matches_xla_path(dtype, tol):
    """Kernel vs the XLA windowed path through encoder._attention.

    f32: both paths compute f32 throughout — agreement to associativity.
    bf16: the XLA path rounds scores/softmax to bf16 (a bandwidth
    tradeoff the kernel no longer needs — it keeps f32 in VMEM), so the
    delta is the OLD path's bf16 rounding; bound it at the documented
    bf16 class."""
    rng = np.random.default_rng(0)
    cfg = TINY
    d, nh, side = cfg.encoder_dim, cfg.encoder_heads, cfg.window_size
    blk = _blk_params(rng, d, cfg.head_dim, side, dtype)
    x = jnp.asarray(rng.standard_normal((5, side, side, d)) * 0.5, dtype)

    old = enc_mod._WINATTN
    try:
        enc_mod._WINATTN = "off"
        ref = enc_mod._attention(x, blk, cfg)
        enc_mod._WINATTN = "on"
        got = enc_mod._attention(x, blk, cfg)
    finally:
        enc_mod._WINATTN = old
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


def test_windowed_attend_oracle_plain_softmax():
    """Kernel vs a from-scratch numpy-style oracle (independent of the
    encoder code): per-head softmax(q·k^T·scale + bias) · v with the
    decomposed bias expanded densely."""
    rng = np.random.default_rng(1)
    b, side, nh, hd = 3, 4, 2, 8
    n, d = side * side, 2 * 8
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)), jnp.float32)
    bh = jnp.asarray(rng.standard_normal((b, n, nh * side)), jnp.float32)
    bw = jnp.asarray(rng.standard_normal((b, n, nh * side)), jnp.float32)

    got = windowed_attend(qkv, bh, bw, nh, side=side, interpret=True)

    q, k, v = (np.asarray(qkv[..., i * d:(i + 1) * d]) for i in range(3))
    ks = np.arange(n)
    out = np.zeros((b, n, d), np.float32)
    for bi in range(b):
        for h in range(nh):
            qh = q[bi, :, h * hd:(h + 1) * hd]
            kh = k[bi, :, h * hd:(h + 1) * hd]
            vh = v[bi, :, h * hd:(h + 1) * hd]
            s = qh @ kh.T / np.sqrt(hd)
            s = s + np.asarray(bh)[bi][:, h * side + ks // side]
            s = s + np.asarray(bw)[bi][:, h * side + ks % side]
            e = np.exp(s - s.max(axis=1, keepdims=True))
            p = e / e.sum(axis=1, keepdims=True)
            out[bi, :, h * hd:(h + 1) * hd] = p @ vh
    np.testing.assert_allclose(np.asarray(got), out, atol=2e-5)


def test_encode_image_end_to_end_kernel_vs_xla():
    """Full tiny encode_image with the kernel on vs off (f32): the
    windowed layers' integration (bias einsum layout, gating, proj)
    agrees end-to-end."""
    from revisit_anything_tpu.models.sam import init_sam_params
    from revisit_anything_tpu.models.sam.encoder import encode_image

    cfg = TINY
    params = init_sam_params(cfg, jax.random.PRNGKey(0),
                             dtype=jnp.float32)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal(
        (1, cfg.image_size, cfg.image_size, 3)), jnp.float32)

    old = enc_mod._WINATTN
    try:
        enc_mod._WINATTN = "off"
        ref = encode_image(params, cfg, img)
        enc_mod._WINATTN = "on"
        encode_image.clear_cache()       # module flag is trace-time state
        got = encode_image(params, cfg, img)
    finally:
        enc_mod._WINATTN = old
        encode_image.clear_cache()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5)
