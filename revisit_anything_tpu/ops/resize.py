"""Image/mask resizing with bit-parity to the reference's torch resizes.

The reference resizes masks with torch ``F.interpolate(mode='nearest')``
(func_vpr.py:1089) and upsamples features with
``F.interpolate(mode='bilinear', align_corners=True)`` (func_vpr.py:505).
Both conventions differ from ``jax.image.resize``, so they are implemented
here explicitly as gathers — cheap, jit-friendly, and exact.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _nearest_indices(out_size: int, in_size: int) -> np.ndarray:
    """torch 'nearest' source index: floor(dst * in/out) (asymmetric)."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size) * scale).astype(np.int32)
    return np.minimum(idx, in_size - 1)


def nearest_resize(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize the last two dims of ``x`` with torch-nearest semantics."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    out_h, out_w = out_hw
    if (in_h, in_w) == (out_h, out_w):
        return x
    ih = jnp.asarray(_nearest_indices(out_h, in_h))
    iw = jnp.asarray(_nearest_indices(out_w, in_w))
    return x[..., ih, :][..., iw]


def _align_corners_coords(out_size: int, in_size: int) -> np.ndarray:
    """torch bilinear align_corners=True source coordinate per output index."""
    if out_size == 1 or in_size == 1:
        return np.zeros(out_size, dtype=np.float64)
    return np.arange(out_size) * (in_size - 1) / (out_size - 1)


def bilinear_resize_align_corners(
        x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of the last two dims, align_corners=True semantics.

    Matches torch ``F.interpolate(..., mode='bilinear', align_corners=True)``
    as used for dense-feature upsampling (func_vpr.py:505, :926).
    """
    in_h, in_w = x.shape[-2], x.shape[-1]
    out_h, out_w = out_hw
    if (in_h, in_w) == (out_h, out_w):
        return x

    def axis_weights(out_size, in_size):
        coords = _align_corners_coords(out_size, in_size)
        lo = np.floor(coords).astype(np.int32)
        lo = np.clip(lo, 0, in_size - 1)
        hi = np.minimum(lo + 1, in_size - 1)
        frac = (coords - lo).astype(np.float32)
        return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(frac)

    hlo, hhi, hfrac = axis_weights(out_h, in_h)
    wlo, whi, wfrac = axis_weights(out_w, in_w)

    top = x[..., hlo, :]
    bot = x[..., hhi, :]
    rows = top + (bot - top) * hfrac[:, None]
    left = rows[..., wlo]
    right = rows[..., whi]
    return left + (right - left) * wfrac
