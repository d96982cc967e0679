"""Box NMS — static-shape greedy suppression for TPU, host mirror for CPU.

Replaces torchvision's C++/CUDA ``batched_nms`` used by the reference AMG
(automatic_mask_generator.py:252). The candidate count is static (all AMG
prompts × 3 masks, invalid entries masked by score = -inf), so the whole
pass is one [N, N] IoU matrix + a fixed-length suppression loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def box_iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of XYXY boxes [N, 4] → [N, N] (torchvision convention:
    inclusive coordinates are NOT assumed; area = (x2-x1)*(y2-y1))."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@partial(jax.jit, static_argnames=("iou_threshold",))
def nms_keep_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                  iou_threshold: float = 0.7) -> jnp.ndarray:
    """Greedy NMS. Returns a bool keep mask [N].

    Entries with score == -inf are pre-suppressed (use for padding/invalid
    candidates). Matches torchvision.ops.nms keep semantics.

    Greedy NMS is the unique solution of the well-founded recurrence
    ``alive_i = valid_i ∧ ¬∃j<i (alive_j ∧ iou_ij > t)`` (ranks sorted by
    score). Rather than walking that recurrence sequentially (an N-step
    fori_loop measured 7.4 ms for N=3072 — every AMG query paid it), we
    Jacobi-iterate the whole vector: each sweep is one [N, N]·[N] matvec
    on the MXU, and after k sweeps every candidate whose suppression-chain
    depth is ≤ k holds its final value (induction over the DAG). The
    fixpoint is unique, so iterating until a sweep changes nothing yields
    EXACTLY the greedy result; chains are shallow in practice (~5-15
    sweeps, <0.5 ms) with the N-sweep worst case no slower than the loop.
    """
    n = boxes.shape[0]
    boxes = boxes.astype(jnp.float32)
    order = jnp.argsort(-scores)               # score desc
    iou = box_iou_matrix(boxes[order])
    valid = scores[order] > -jnp.inf

    lower = (jnp.arange(n)[None, :] < jnp.arange(n)[:, None])   # j < i
    # bf16 halves the per-sweep HBM read of the kill matrix; safe because
    # the 0/1 products are exact, the MXU accumulates f32, and a nonzero
    # killer count can never round to 0 (every term is ≥ 1)
    kill = ((iou > iou_threshold) & lower).astype(jnp.bfloat16)
    validf = valid.astype(jnp.bfloat16)

    def sweep(alive):
        killers = jax.lax.dot_general(
            kill, alive, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # [N] counts
        return validf * (killers == 0.0).astype(jnp.bfloat16)

    def cond(state):
        return state[1]

    def body(state):
        alive, _ = state
        new = sweep(alive)
        return new, jnp.any(new != alive)

    first = sweep(validf)
    alive, _ = jax.lax.while_loop(
        cond, body, (first, jnp.any(first != validf)))
    keep_sorted = alive > 0
    # scatter back to original order
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def nms_host(boxes: np.ndarray, scores: np.ndarray,
             iou_threshold: float = 0.7) -> np.ndarray:
    """Host greedy NMS; returns kept indices sorted by score desc
    (torchvision.ops.nms return convention)."""
    order = np.argsort(-scores, kind="stable")
    x1, y1, x2, y2 = boxes.T
    area = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] == -np.inf:
            # -inf marks padding/invalid candidates (the convention
            # nms_keep_mask documents) — never emit them as kept
            continue
        keep.append(i)
        ix1 = np.maximum(x1[i], x1)
        iy1 = np.maximum(y1[i], y1)
        ix2 = np.minimum(x2[i], x2)
        iy2 = np.minimum(y2[i], y2)
        inter = np.maximum(ix2 - ix1, 0) * np.maximum(iy2 - iy1, 0)
        union = area[i] + area - inter
        iou = np.where(union > 0, inter / union, 0.0)
        suppressed |= iou > iou_threshold
    return np.array(keep, dtype=np.int64)
