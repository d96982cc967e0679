"""SAM image encoder: ViTDet with windowed attention + decomposed rel-pos.

TPU-native re-design of the reference encoder
(sam/segment_anything/modeling/image_encoder.py:17-395):
- NHWC layout throughout; patch embed as reshape+matmul.
- Window partition (14x14, grid 64 pads to 70) is a static reshape; all
  25 windows ride one batched attention — no per-window loop.
- The decomposed relative-position bias tables are gathered with
  statically precomputed index maps; the q-dependent bias is two einsums
  fused into the attention logits.
- Numerics: with f32 params, scores/softmax run f32. With bf16 params
  the XLA windowed path keeps the [b, nh, N, N] scores AND the softmax
  in bf16 (halves the dominant HBM traffic of the attention; a
  deliberate measured tradeoff — encoder outputs feed thresholded
  masks, tolerant to bf16); the flash kernel always reduces in f32.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

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
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32).astype(x.dtype)
    return y + p["b"] if p.get("b") is not None else y


def _linear_interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) as a dense
    [out, in] matrix — used to resize rel-pos tables when sizes mismatch
    (image_encoder.py get_rel_pos)."""
    if out_size == in_size:
        return np.eye(out_size, dtype=np.float32)
    scale = in_size / out_size
    x = (np.arange(out_size) + 0.5) * scale - 0.5
    lo = np.floor(x).astype(np.int64)
    t = x - lo
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap, w in ((0, 1.0 - t), (1, t)):
        idx = np.clip(lo + tap, 0, in_size - 1)
        np.add.at(mat, (np.arange(out_size), idx), w)
    return mat.astype(np.float32)


def _rel_pos_gather(rel_pos: jnp.ndarray, q_size: int, k_size: int) -> jnp.ndarray:
    """[q_size, k_size, head_dim] relative-position table, reproducing the
    reference's get_rel_pos (interpolate table to 2*max-1 entries, gather by
    relative coordinate)."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        m = jnp.asarray(_linear_interp_matrix(max_rel, rel_pos.shape[0]))
        rel_pos = jnp.dot(m, rel_pos.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST).astype(rel_pos.dtype)
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[jnp.asarray(rel.astype(np.int64))]


# flash-attention gate: minimum token count. 1024 = global layers only;
# 196 also routes the 14x14 windowed layers through the kernel — measured
# 38% SLOWER end-to-end (50.4 -> 69.5 ms encode): at N=196 the [B*nW,
# nh, 196, 196] score tensor fits VMEM-friendly XLA fusions, while the
# kernel pays its grid/pipeline overhead 28 times. Keep 1024.
_FLASH_MIN_TOKENS = 1024

# Windowed layers and the DEDICATED whole-window-in-VMEM kernel
# (ops/winattn.py — one grid step per window, not the flash kernel's
# streaming design that lost the r2 A/B). NEGATIVE A/B (recorded, do not
# retry): the kernel measured 0.952-0.958x vs the XLA windowed path
# (67.1-67.4 vs 64.2-64.4 ms encode, 4 interleaved rounds, 2026-08-20,
# scripts/ab_winattn.py) — XLA batches all 25 windows x 16 heads into
# big fused einsums, while the kernel runs 25 grid steps of 16 unrolled
# [196, 196] per-head dots per layer; the HBM-score round trips it
# eliminates are already hidden behind compute at this size. "auto" =
# OFF everywhere; "on" forces it (A/B hook — scripts/ab_winattn.py).
_WINATTN = "auto"


def _use_winattn() -> bool:
    return _WINATTN == "on"

# Test hook: the flash glue (bias construction, transposes, side wiring)
# is backend-gated and would otherwise be unreachable off-TPU; tests set
# True to drive it through the kernel's interpret mode (None = gate on
# the real backend).
_FLASH_OVERRIDE = None


def _attention(x: jnp.ndarray, blk: Params, cfg: SamArchConfig) -> jnp.ndarray:
    """Windowed/global attention over NHWC tokens with decomposed rel-pos
    bias (image_encoder.py:185-240, :292-361).

    Global layers (4096 tokens, square grid) route through the Pallas
    flash kernel on TPU — scores never touch HBM; small windowed layers
    stay on the XLA path."""
    b, h, w, d = x.shape
    nh, hd = cfg.encoder_heads, cfg.head_dim
    qkv = _dense(x.reshape(b, h * w, d), blk["qkv"])

    if h == w and h * w < _FLASH_MIN_TOKENS and _use_winattn():
        # Dedicated windowed kernel: consumes the RAW qkv (per-head
        # q/k/v are in-kernel lane slices — no XLA split/reshape) plus
        # the q-projected bias components in head-major lanes; scores/
        # softmax never touch HBM (ops/winattn.py).
        from revisit_anything_tpu.ops.winattn import windowed_attend
        rh = _rel_pos_gather(blk["rel_pos_h"], h, h)
        rw = _rel_pos_gather(blk["rel_pos_w"], w, w)
        qg = qkv[..., :d].reshape(b, h, w, nh, hd)
        bias_h = jnp.einsum("bhwnd,hkd->bhwnk", qg, rh.astype(qkv.dtype),
                            preferred_element_type=jnp.float32
                            ).astype(x.dtype).reshape(b, h * w, nh * h)
        bias_w = jnp.einsum("bhwnd,wkd->bhwnk", qg, rw.astype(qkv.dtype),
                            preferred_element_type=jnp.float32
                            ).astype(x.dtype).reshape(b, h * w, nh * w)
        out = windowed_attend(qkv, bias_h, bias_w, nh, side=h)
        return _dense(out, blk["proj"]).reshape(b, h, w, d)

    # split along the minor (lane) dim at d-multiples — tile-aligned, no
    # strided-layout copies (the [.., 3, nh, hd] reshape+index form cost
    # ~4 ms/encode in relayouts)
    q = qkv[..., :d].reshape(b, h * w, nh, hd)
    k = qkv[..., d:2 * d].reshape(b, h * w, nh, hd)
    v = qkv[..., 2 * d:].reshape(b, h * w, nh, hd)

    backend_flash = (_FLASH_OVERRIDE if _FLASH_OVERRIDE is not None
                     else jax.default_backend() == "tpu")
    use_flash = backend_flash and h == w and h * w >= _FLASH_MIN_TOKENS
    if use_flash:
        from revisit_anything_tpu.ops.attention import attend
        rh = _rel_pos_gather(blk["rel_pos_h"], h, h)
        rw = _rel_pos_gather(blk["rel_pos_w"], w, w)
        qg = q.reshape(b, h, w, nh, hd)
        # q-projected bias components [b, nh, N, side]
        bias_h = jnp.einsum("bhwnd,hkd->bnhwk", qg, rh.astype(q.dtype),
                            preferred_element_type=jnp.float32
                            ).astype(x.dtype).reshape(b, nh, h * w, h)
        bias_w = jnp.einsum("bhwnd,wkd->bnhwk", qg, rw.astype(q.dtype),
                            preferred_element_type=jnp.float32
                            ).astype(x.dtype).reshape(b, nh, h * w, w)
        # block_q=512: halves the kernel's K/V re-fetch traffic per query
        # block (measured faster than the 256 default at N=4096)
        out = attend(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                     v.transpose(0, 2, 1, 3), bias_h, bias_w, side=h,
                     block_q=512)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, nh * hd)
        return _dense(out, blk["proj"]).reshape(b, h, w, d)

    # In bf16 the [b, nh, N, N] score tensors stay bf16 (halves HBM traffic
    # of the 4096-token global layers); f32 inference keeps f32 scores.
    acc_t = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    scale = hd ** -0.5
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=acc_t) * scale

    rh = _rel_pos_gather(blk["rel_pos_h"], h, h)         # [h, h, hd]
    rw = _rel_pos_gather(blk["rel_pos_w"], w, w)         # [w, w, hd]
    qg = q.reshape(b, h, w, nh, hd)
    bias_h = jnp.einsum("bhwnd,hkd->bnhwk", qg, rh.astype(q.dtype),
                        preferred_element_type=acc_t)
    bias_w = jnp.einsum("bhwnd,wkd->bnhwk", qg, rw.astype(q.dtype),
                        preferred_element_type=acc_t)
    # bias[.., kh·w + kw] = bias_h[.., kh] + bias_w[.., kw]. Built with
    # repeat/tile on [*, N, k] tensors instead of a 6-D
    # [b,nh,h,w,kh,kw] broadcast sum: minor dims of `window` (14) pad to
    # the 128-lane tile on TPU, so the 6-D form moves ~9x the bytes
    # (measured 18 ms across the 28 windowed layers; this form ~2 ms).
    bh = bias_h.reshape(b, nh, h * w, h)
    bw = bias_w.reshape(b, nh, h * w, w)
    bias = jnp.repeat(bh, w, axis=-1) + jnp.tile(bw, (1, 1, 1, h))
    logits = logits + bias

    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return _dense(out.reshape(b, h * w, nh * hd), blk["proj"]).reshape(
        b, h, w, d)


def _window_partition(x: jnp.ndarray, ws: int):
    b, h, w, c = x.shape
    ph, pw = (-h) % ws, (-w) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    wins = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return wins, (hp, wp)


def _window_unpartition(wins: jnp.ndarray, ws: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // (hp * wp // ws // ws)
    x = wins.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _block(x: jnp.ndarray, blk: Params, cfg: SamArchConfig,
           windowed: bool) -> jnp.ndarray:
    shortcut = x
    x = _layer_norm(x, blk["norm1"], cfg.eps)
    if windowed:
        hw = (x.shape[1], x.shape[2])
        x, pad_hw = _window_partition(x, cfg.window_size)
        x = _attention(x, blk, cfg)
        x = _window_unpartition(x, cfg.window_size, pad_hw, hw)
    else:
        x = _attention(x, blk, cfg)
    x = shortcut + x
    y = _layer_norm(x, blk["norm2"], cfg.eps)
    y = _dense(jax.nn.gelu(_dense(y, blk["lin1"]), approximate=False),
               blk["lin2"])
    return x + y


# The neck's LayerNorm2d (modeling/common.py:28-43) normalizes the same
# (last, channel) axis of NHWC maps as the block LN — one implementation.
_channel_ln = _layer_norm


@partial(jax.jit, static_argnames=("cfg",))
def encode_image(params: Params, cfg: SamArchConfig,
                 images: jnp.ndarray) -> jnp.ndarray:
    """images [B, 1024, 1024, 3] (pixel-normalized) → [B, 64, 64, 256].

    Mirrors ImageEncoderViT.forward + neck (image_encoder.py:107-116).
    Accepts PackedParams (utils/packing.py) — unpacked in-trace.
    """
    from revisit_anything_tpu.utils.packing import maybe_unpack
    params = maybe_unpack(params)
    enc = params["encoder"]
    # compute in the params' dtype (bf16 params → bf16 activations)
    images = images.astype(enc["patch_embed"]["w"].dtype)
    b, hh, ww, _ = images.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    x = images.reshape(b, gh, p, gw, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh, gw, p * p * 3)
    x = jnp.dot(x, enc["patch_embed"]["w"],
                preferred_element_type=jnp.float32).astype(images.dtype)
    x = x + enc["patch_embed"]["b"]
    x = x + enc["pos_embed"].astype(x.dtype)

    for i, blk in enumerate(enc["blocks"]):
        x = _block(x, blk, cfg, windowed=i not in cfg.global_attn_indexes)

    # Neck: 1x1 conv (matmul) → channel-LN → 3x3 conv → channel-LN.
    neck = enc["neck"]
    x = jnp.dot(x, neck["conv1_w"],
                preferred_element_type=jnp.float32).astype(x.dtype)
    x = _channel_ln(x, neck["ln1"], cfg.eps)
    x = jax.lax.conv_general_dilated(
        x, neck["conv2_w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    x = _channel_ln(x, neck["ln2"], cfg.eps)
    return x
