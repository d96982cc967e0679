"""Mask → patch-grid pooling and mask geometry ops.

The reference maps segmentation masks onto the DINOv2 patch grid in three
steps (seg_vlad_gpu_single, func_vpr.py:1085-1092 + place_rec_main.py:187-194):
nearest-upsample the stored mask to the DINO resolution, flatten, then
scatter pixel→patch through a precomputed ``ind`` table built from
``clip(i//14, 0, dh-1)`` (pixels past the last full patch fold into it).
A patch is "in" a mask if ANY of its pixels is (boolean OR).

Here the whole chain is fused into two small matmuls: precomputed 0/1
pooling matrices A [dh, src_h], B [src_w, dw] compose the nearest-upsample
gather with the OR-pool binning, so ``patch = (A @ mask @ B) > 0`` without
ever materializing the full-resolution mask. MXU-friendly and exact.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from revisit_anything_tpu.config import PATCH_SIZE
from revisit_anything_tpu.ops.resize import _nearest_indices


def mask_pool_matrices(
        src_hw: Tuple[int, int],
        dst_hw: Tuple[int, int],
        patch: int = PATCH_SIZE) -> Tuple[np.ndarray, np.ndarray]:
    """Build pooling matrices composing nearest-resize with patch OR-binning.

    Args:
      src_hw: stored mask resolution (e.g. SAM half resolution).
      dst_hw: DINO 'desired' resolution the reference resizes masks to.
      patch: patch size (14).

    Returns:
      (A, B): float32 0/1 matrices with A [dh, src_h], B [src_w, dw] such
      that ``(A @ mask @ B) > 0`` equals the reference's
      nearest-resize-then-scatter patch mask.
    """
    src_h, src_w = src_hw
    dst_h, dst_w = dst_hw
    dh, dw = dst_h // patch, dst_w // patch

    # dst pixel -> src pixel (torch-nearest), dst pixel -> patch bin (clipped)
    src_row = _nearest_indices(dst_h, src_h)
    src_col = _nearest_indices(dst_w, src_w)
    bin_row = np.minimum(np.arange(dst_h) // patch, dh - 1)
    bin_col = np.minimum(np.arange(dst_w) // patch, dw - 1)

    A = np.zeros((dh, src_h), dtype=np.float32)
    A[bin_row, src_row] = 1.0
    B = np.zeros((src_w, dw), dtype=np.float32)
    B[src_col, bin_col] = 1.0
    return A, B


@jax.jit
def pool_masks_to_patch_grid(
        masks: jnp.ndarray, A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """OR-pool masks [M, src_h, src_w] (bool) to patch grid [M, dh*dw] (bool).

    Equivalent to func_vpr.py:1088-1092 (nearest resize + pixel→patch
    scatter) but as two batched matmuls on the MXU.
    """
    m = masks.astype(jnp.float32)
    pooled = jnp.einsum("ph,mhw,wq->mpq", A, m, B,
                        preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return (pooled > 0).reshape(masks.shape[0], -1)


def mask_centroids(masks: np.ndarray) -> np.ndarray:
    """Per-mask centroid (x, y) = mean of nonzero pixel coords, reversed.

    Host-side (numpy) — feeds scipy Delaunay. Mirrors
    ``np.array(np.nonzero(mask)).mean(1)[::-1]`` (func_vpr.py:1313).
    """
    out = np.empty((len(masks), 2), dtype=np.float64)
    for i, m in enumerate(masks):
        nz = np.nonzero(m)
        if nz[0].size == 0:
            out[i] = 0.0
        else:
            out[i, 0] = nz[1].mean()  # x
            out[i, 1] = nz[0].mean()  # y
    return out


@jax.jit
def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """XYXY bounding boxes from masks [..., H, W] (bool) -> [..., 4].

    Empty masks produce [0, 0, 0, 0], matching the reference AMG's
    ``batched_mask_to_box`` contract (sam/segment_anything/utils/amg.py:303-346).
    """
    h, w = masks.shape[-2], masks.shape[-1]
    rows = jnp.any(masks, axis=-1)  # [..., H]
    cols = jnp.any(masks, axis=-2)  # [..., W]
    ridx = jnp.arange(h)
    cidx = jnp.arange(w)

    def lohi(any_ax, idx, n):
        lo = jnp.min(jnp.where(any_ax, idx, n), axis=-1)
        hi = jnp.max(jnp.where(any_ax, idx, -1), axis=-1)
        return lo, hi

    top, bottom = lohi(rows, ridx, h)
    left, right = lohi(cols, cidx, w)
    empty = ~jnp.any(rows, axis=-1)
    box = jnp.stack([left, top, right, bottom], axis=-1)
    return jnp.where(empty[..., None], 0, box)
