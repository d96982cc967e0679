"""Fused windowed-attention Pallas kernel for SAM's 28 ViTDet window
layers (image_encoder.py:292-361 semantics; 25 windows x 16 heads x
196 tokens at ViT-H 1024²).

The XLA windowed path materializes the [25, 16, 196, 196] score tensor
in HBM between the logits einsum, the bias add, the softmax, and the
values einsum — ~62 MB of bf16 scores making 3-4 round trips per layer,
x28 layers (the r5 encode-phase probe pinned the whole non-matmul
residual at ~31 ms of a 66 ms loaded encode; the windowed attention
chain is its dominant term). A per-window [196, 196] score tile is only
77 KB f32: this kernel keeps one window's ENTIRE attention — all 16
heads, scores, rel-pos bias, softmax, and the values contraction — in
VMEM, so HBM traffic is exactly qkv-in + out.

Design notes:
- One grid step per window; the 16 heads run as an unrolled loop of
  rank-2 dots (the _token_attn_kernel idiom — ops/attention.py:142).
- The kernel consumes the RAW qkv projection [B, N, 3D]: per-head q/k/v
  are static lane slices, so the XLA-side q/k/v split/reshape (and its
  relayouts) disappear entirely.
- Decomposed rel-pos bias (bias[n, k] = bh[n, k // S] + bw[n, k % S],
  S = window side) is applied with the same 0/1 expansion matmuls as
  the flash kernel (ops/attention.py:46-57): two [N, S]·[S, N] dots per
  head — Mosaic cannot reshape the lane dim, matmuls are free.
- Scores, bias sum, and softmax run in f32 REGISTERS. The XLA path kept
  bf16 scores/softmax purely to halve their HBM traffic (encoder.py
  module docstring — a measured bandwidth tradeoff); in VMEM that
  pressure is gone, so the kernel keeps full f32 — strictly closer to
  the reference f32 semantics. With f32 params the two paths agree to
  f32 associativity; with bf16 params they differ by the bf16 rounding
  the OLD path introduced (tested tolerance class, tests/test_winattn).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _win_attn_kernel(qkv_ref, bh_ref, bw_ref, eh_ref, ew_ref, o_ref, *,
                     heads: int, hd: int, scale: float):
    """One window: qkv [1, N, 3D] → out [1, N, D], all heads in VMEM."""
    qkv = qkv_ref[0]
    d = heads * hd
    S = eh_ref.shape[0]
    for h in range(heads):
        q = qkv[:, h * hd:(h + 1) * hd]                    # [N, hd]
        k = qkv[:, d + h * hd:d + (h + 1) * hd]
        v = qkv[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # [N, N]
        bh = bh_ref[0][:, h * S:(h + 1) * S].astype(jnp.float32)  # [N, S]
        bw = bw_ref[0][:, h * S:(h + 1) * S].astype(jnp.float32)
        s = s + jax.lax.dot_general(
            bh, eh_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + jax.lax.dot_general(
            bw, ew_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mx = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - mx)
        z = jnp.sum(e, axis=1, keepdims=True)
        p = (e / z).astype(qkv_ref.dtype)
        o_ref[0, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("heads", "hd", "side", "scale",
                                   "interpret"))
def _win_attn_call(qkv, bias_hw, heads: int, hd: int, side: int,
                   scale: float, interpret: bool):
    b, n, _ = qkv.shape
    d = heads * hd
    # 0/1 expansion maps: eh[i, k] = [k // side == i], ew[j, k] =
    # [k % side == j] (k = kh·side + kw — the window's row-major keys).
    ks = np.arange(n)
    eh = np.zeros((side, n), np.float32)
    ew = np.zeros((side, n), np.float32)
    eh[ks // side, ks] = 1.0
    ew[ks % side, ks] = 1.0
    bias_h, bias_w = bias_hw
    kernel = partial(_win_attn_kernel, heads=heads, hd=hd, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, 3 * d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, heads * side), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, heads * side), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((side, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((side, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
        interpret=interpret,
    )(qkv, bias_h, bias_w, jnp.asarray(eh), jnp.asarray(ew))


def windowed_attend(qkv: jnp.ndarray, bias_h: jnp.ndarray,
                    bias_w: jnp.ndarray, heads: int, side: int,
                    interpret=None) -> jnp.ndarray:
    """Multi-head self-attention over every window of a ViTDet windowed
    layer, fused: scores/bias/softmax never leave VMEM.

    Args:
      qkv: [B, N, 3·D] raw qkv projection output (B windows, N = side²
        tokens each, head h's q/k/v at lane groups h·hd / D+h·hd /
        2·D+h·hd).
      bias_h, bias_w: [B, N, heads·side] q-projected decomposed rel-pos
        bias components, HEAD-MAJOR lanes (lane index = h·side + kh —
        emit via einsum("bhwnd,hkd->bhwnk").reshape; the per-head slice
        is then a contiguous static lane slice, like q/k/v).
      heads: head count; side: window side (N must equal side²).

    Returns [B, N, D].
    """
    b, n, three_d = qkv.shape
    d = three_d // 3
    hd = d // heads
    assert n == side * side, (n, side)
    assert bias_h.shape == (b, n, heads * side), bias_h.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _win_attn_call(qkv, (bias_h, bias_w), heads, hd, side,
                          1.0 / float(np.sqrt(hd)), interpret)
