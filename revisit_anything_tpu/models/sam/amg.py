"""Automatic mask generation — the TPU redesign of SAM's AMG harness.

The reference (sam/segment_anything/automatic_mask_generator.py:137-376)
loops 64-point batches through the decoder with dynamic-shape filtering and
torchvision NMS. Here every device stage is static-shape:

- all 1024 grid prompts run in a few large jitted decode batches
  (``points_per_batch`` is the memory knob);
- mask postprocessing (256→1024 bilinear, unpad, →original-size bilinear,
  reproducing Sam.postprocess_masks sam.py:144-174) happens in the same jit
  as thresholding, IoU/stability filtering and box extraction, so only
  bool masks + per-candidate scalars leave the device;
- NMS runs as a fixed-shape greedy pass (ops/nms.py);
- record assembly (ragged output) is host-side numpy.

AMG hyperparameters mirror SamAutomaticMaskGenerator defaults, which the
reference uses unchanged (func_vpr.py:510-516): 32x32 point grid,
pred_iou_thresh 0.88, stability 0.95 @ offset 1.0, box NMS 0.7, one crop,
no small-region postprocessing.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from revisit_anything_tpu.io.h5io import MaskRecord
from revisit_anything_tpu.models.sam.config import (
    SAM_PIXEL_MEAN, SAM_PIXEL_STD, SamArchConfig)
from revisit_anything_tpu.models.sam.decoder import decode_masks
from revisit_anything_tpu.models.sam.encoder import encode_image
from revisit_anything_tpu.models.sam.prompt import (
    dense_positional_embedding, embed_points, no_mask_dense_embedding)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class AmgConfig:
    points_per_side: int = 32
    # TPU memory knob (reference default 64 on GPU, automatic_mask_
    # generator.py:36): 1024 = the full 32x32 grid in ONE decode
    # dispatch — measured fastest on v5e (BASELINE.md bsz ladder);
    # per-prompt Pallas grids keep VMEM flat and the big per-prompt
    # intermediates never materialize in HBM.
    points_per_batch: int = 1024
    pred_iou_thresh: float = 0.88
    stability_score_thresh: float = 0.95
    stability_score_offset: float = 1.0
    box_nms_thresh: float = 0.7
    min_mask_region_area: int = 0   # >0 enables small-region postprocess
    # multi-crop (automatic_mask_generator.py:40-48): layer i adds
    # (2^i)^2 overlapping crops, each run through the full grid pipeline,
    # deduped by cross-crop NMS preferring smaller crops
    crop_n_layers: int = 0
    crop_nms_thresh: float = 0.7
    crop_overlap_ratio: float = 512 / 1500
    crop_n_points_downscale_factor: int = 1


def build_point_grid(n_per_side: int) -> np.ndarray:
    """[n², 2] xy points in [0,1]² at cell centers
    (utils/amg.py build_all_layer_point_grids semantics, single layer)."""
    offset = 1.0 / (2 * n_per_side)
    coords = np.linspace(offset, 1.0 - offset, n_per_side)
    xs, ys = np.meshgrid(coords, coords)          # row-major over y
    return np.stack([xs.ravel(), ys.ravel()], axis=-1)


def generate_crop_boxes(im_hw: Tuple[int, int], n_layers: int,
                        overlap_ratio: float):
    """XYXY crop boxes per layer: layer 0 = full image, layer i has
    (2^i)^2 crops of length ceil((overlap*(n-1)+len)/n) with overlap
    int(ratio*short_side*2/n) (utils/amg.py:200-235 semantics)."""
    import math
    im_h, im_w = im_hw
    short_side = min(im_h, im_w)
    crop_boxes = [[0, 0, im_w, im_h]]
    layer_idxs = [0]

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_per_side))
        crop_w = crop_len(im_w, n_per_side, overlap)
        crop_h = crop_len(im_h, n_per_side, overlap)
        for x0 in (int((crop_w - overlap) * i) for i in range(n_per_side)):
            for y0 in [int((crop_h - overlap) * j)
                       for j in range(n_per_side)]:
                crop_boxes.append([x0, y0, min(x0 + crop_w, im_w),
                                   min(y0 + crop_h, im_h)])
                layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def resize_longest_side(h: int, w: int, long_side: int) -> Tuple[int, int]:
    """ResizeLongestSide target (utils/transforms.py get_preprocess_shape)."""
    scale = long_side / max(h, w)
    return int(h * scale + 0.5), int(w * scale + 0.5)


def preprocess_image(image_rgb: np.ndarray,
                     cfg: SamArchConfig) -> Tuple[np.ndarray, Tuple[int, int]]:
    """uint8 RGB [H, W, 3] → normalized, 1024-resized, zero-padded
    [1, 1024, 1024, 3] + the resized (pre-pad) dims.

    Resize uses PIL bilinear (antialiased), matching the reference's
    ResizeLongestSide.apply_image (utils/transforms.py:30-38).
    """
    from PIL import Image
    h, w = image_rgb.shape[:2]
    nh, nw = resize_longest_side(h, w, cfg.image_size)
    resized = np.asarray(
        Image.fromarray(image_rgb).resize((nw, nh), Image.BILINEAR),
        dtype=np.float32)
    x = (resized - np.asarray(SAM_PIXEL_MEAN)) / np.asarray(SAM_PIXEL_STD)
    out = np.zeros((1, cfg.image_size, cfg.image_size, 3), np.float32)
    out[0, :nh, :nw] = x
    return out, (nh, nw)


@partial(jax.jit, static_argnames=("cfg", "input_hw"))
def _preprocess_device(image_uint8: jnp.ndarray, cfg: SamArchConfig,
                       input_hw: Tuple[int, int]) -> jnp.ndarray:
    """On-device preprocessing for UPSCALED inputs: uint8 image uploads at
    1/4 the bytes of the host-f32 path (the h2d transfer dominated AMG
    wall time); bilinear resize + normalize + pad run in one jit. For
    upscaling, PIL's antialiased bilinear equals plain half-pixel bilinear
    (filter support 1). The resized image is QUANTIZED back to uint8
    levels like the reference's (PIL returns a uint8 image that is then
    normalized, utils/transforms.py:30-38) — without it every pixel
    carries up to ~0.5/255 of drift that can flip near-threshold mask
    bits. Residual vs PIL: its int16 fixed-point filter coefficients
    (±1 LSB on rare pixels)."""
    from revisit_anything_tpu.ops.resize import bilinear_weight_matrix
    h, w = image_uint8.shape[:2]
    nh, nw = input_hw
    x = image_uint8.astype(jnp.float32)
    wh = jnp.asarray(bilinear_weight_matrix(nh, h))
    ww = jnp.asarray(bilinear_weight_matrix(nw, w))
    x = jnp.einsum("oh,hwc->owc", wh, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("pw,owc->opc", ww, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.clip(jnp.round(x), 0.0, 255.0)
    x = (x - jnp.asarray(SAM_PIXEL_MEAN)) / jnp.asarray(SAM_PIXEL_STD)
    return jnp.pad(x, ((0, cfg.image_size - nh),
                       (0, cfg.image_size - nw), (0, 0)))[None]


def resize_mats_and_rows(cfg: SamArchConfig, input_hw: Tuple[int, int],
                         orig_hw: Tuple[int, int], on_tpu: bool = None):
    """Composed per-axis resize matrices for the lowres→original mask
    postprocess, plus the number of token ROWS the mask head must
    actually decode.

    SAM pads the resized input to a 1024² square (sam.py preprocess), so
    for landscape inputs the unpad slice (``up_h[:input_h]``) zeroes
    every resize weight past lowres row ~input_h/4 — the mask head never
    needs those rows. The last USED lowres row is derived directly from
    the composed matrix; decoding only ceil(used/4) token rows drops
    only exactly-0.0-weight terms from the resize (bit-identical flags
    given the same logits; the mask-head matmuls see a different M dim,
    which on the per-row-deterministic MXU leaves the logits themselves
    unchanged too — tested to f32 associativity on CPU).

    ``on_tpu``: whether the consuming kernels lower through Mosaic (the
    lane rounding below applies). Pass it explicitly from host/planning
    code — the ``None`` default probes ``jax.default_backend()``, which
    INITIALIZES the JAX backend and can hang indefinitely against a dead
    axon tunnel (CLAUDE.md); callers that already know the backend (or
    must stay backend-free) should not rely on the default.

    Returns (wh [H, 4·gh], ww [W, 4·g], gh). NOTE: gh is
    BACKEND-DEPENDENT — on TPU it is rounded up for the Mosaic lane
    constraint (49 → 50 at 240x320), so block-layout logit shapes and the
    wh column count differ between backends for the same config. Final
    flags are unchanged (the extra columns are exactly 0.0), but never
    cache gh or intermediate logits across backends — always derive
    in-process (test_sam_model.test_mask_rows_cpu_tpu_row_counts_agree
    pins the cross-backend flag equality).
    """
    from revisit_anything_tpu.ops.resize import bilinear_weight_matrix
    up_h = bilinear_weight_matrix(cfg.image_size, cfg.lowres_size)
    wh = (bilinear_weight_matrix(orig_hw[0], input_hw[0])
          @ up_h[:input_hw[0]])
    ww = (bilinear_weight_matrix(orig_hw[1], input_hw[1])
          @ up_h[:input_hw[1]])
    used_cols = int(np.flatnonzero(np.abs(wh).sum(axis=0) > 0.0).max()) + 1
    gh = min(-(-used_cols // 4), cfg.grid)
    if on_tpu is None:
        on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        gh = _round_rows_for_lanes(gh, cfg.grid)
    return wh[:, :4 * gh], ww, gh


def _round_rows_for_lanes(gh: int, grid: int) -> int:
    """Round the decoded-row count UP until gh·grid is 128-divisible.

    Mosaic lane constraint: the probs-path mask head blocks the gh·grid
    position axis into the MINOR dim of its p1/p2 refs, which must be
    128-divisible (ops/maskhead._pick_block) — e.g. 240x320: gh 49 → 50,
    content 3136 → 3200 (blk 640). The extra rows are pad rows whose
    composed resize weights are exactly 0.0, so the flags are unchanged
    (only a few extra all-zero wh columns and some discarded mask-head
    positions). Applied only when the kernels really lower (TPU backend;
    interpret mode has no lane constraint, and the tiny CPU test grids
    could not satisfy it)."""
    while gh < grid and (gh * grid) % 128:
        gh += 1
    return gh


@partial(jax.jit, static_argnames=("cfg", "input_hw", "orig_hw", "amg"))
def _decode_batch(params: Params, cfg: SamArchConfig,
                  image_embedding: jnp.ndarray,
                  image_pe: jnp.ndarray,
                  points_1024: jnp.ndarray,
                  input_hw: Tuple[int, int],
                  orig_hw: Tuple[int, int],
                  amg: AmgConfig):
    """Decode one prompt batch and compute all per-candidate statistics.

    Returns (masks_bool [B*3, H, W], iou [B*3], stability [B*3],
    boxes [B*3, 4]) at the ORIGINAL image resolution.
    """
    bsz = points_1024.shape[0]
    sparse = embed_points(params, cfg, points_1024[:, None, :],
                          jnp.ones((bsz, 1), jnp.int32), pad=True)
    # batch=1: the dense_shared decode only reads dense_prompts[:1] — a
    # [bsz, 64, 64, 256] broadcast would materialize ~0.5 GB/batch of
    # identical rows as a jit output (measured as decode's residual
    # inter-batch overhead)
    dense = no_mask_dense_embedding(params, cfg, 1)

    # postprocess_masks (sam.py:144-174): lowres → 1024² → unpad → original.
    # The chain (bilinear 256→1024, slice to input, bilinear → original) is
    # a composition of per-axis linear maps — fused into ONE exact
    # [orig, 256] matrix per axis, never materializing the 1024² tensor
    # (which at 256 prompts × 3 masks is 3.2 GB f32). The decoder's 2x2
    # block layout is folded in as well (spatial row = 4i + 2a1 + a2): the
    # spatial 256² lowres tensor and its layout copies never exist. On TPU
    # the whole resize + the three thresholdings (mask, stability hi/lo)
    # run in one Pallas pass (ops/maskresize.py) so the f32 logits at
    # original resolution never touch HBM either — only uint8 flags do.
    from revisit_anything_tpu.ops.maskresize import (fused_resize_flags,
                                                     resize_flags_reference)
    g = cfg.grid
    on_tpu = jax.default_backend() == "tpu"   # under jit: backend is live
    wh, ww, gh = resize_mats_and_rows(cfg, input_hw, orig_hw, on_tpu=on_tpu)
    lowres_blk, iou = decode_masks(params, cfg, image_embedding, image_pe,
                                   sparse, dense, multimask=True,
                                   dense_shared=True, block_layout=True,
                                   mask_rows=gh)
    iou = iou.reshape(-1)

    thr = cfg.mask_threshold
    off = amg.stability_score_offset
    hgt, wid = orig_hw
    if on_tpu:
        # emit_stats: the kernel accumulates the per-axis reductions
        # (rows-any, per-row hi/lo counts, cols-any) while the logits are
        # live in registers, so the [B·3, H, W] flag image is never
        # re-read by the stats pass (probe_maskside2 P4: ~4 ms/query
        # loaded). The count / index math below is integer-exact and
        # bit-identical to the flag-image reductions it replaces.
        flags, rowst, colst = fused_resize_flags(lowres_blk, wh, ww, thr,
                                                 off, grid_hw=(gh, g),
                                                 emit_stats=True)
        n_m = flags.shape[1]
        flags = flags.reshape(-1, hgt, wid)
        # Stability score (utils/amg.py:156-176) — per-row counts ≤ W
        # are exact in f32.
        hi = jnp.sum(rowst[:, :, 4:4 + n_m], axis=1).reshape(-1)
        lo = jnp.sum(rowst[:, :, 8:8 + n_m], axis=1).reshape(-1)
        stability = hi / jnp.maximum(lo, 1.0)
        masks_bool = (flags & 2).astype(bool)
        # batched_mask_to_box (utils/amg.py:303-346): XYXY where x2/y2
        # are the LAST true pixel indices (no +1); empty → [0,0,0,0].
        rows = rowst[:, :, :n_m] > 0.0                   # [B, H, M]
        cols = colst[:, :n_m, :] > 0.0                   # [B, M, W]
        ridx = jnp.arange(hgt)[None, :, None]
        cidx = jnp.arange(wid)[None, None, :]
        top = jnp.min(jnp.where(rows, ridx, hgt), axis=1).reshape(-1)
        bottom = jnp.max(jnp.where(rows, ridx, -1), axis=1).reshape(-1)
        left = jnp.min(jnp.where(cols, cidx, wid), axis=2).reshape(-1)
        right = jnp.max(jnp.where(cols, cidx, -1), axis=2).reshape(-1)
        empty = ~jnp.any(rows, axis=1).reshape(-1)
    else:
        flags = resize_flags_reference(lowres_blk, wh, ww, thr, off,
                                       grid_hw=(gh, g))
        flags = flags.reshape(-1, hgt, wid)

        # Stability score (utils/amg.py:156-176) from the flag counts.
        hi = jnp.sum(flags >> 2, axis=(1, 2), dtype=jnp.int32
                     ).astype(jnp.float32)
        lo = jnp.sum(flags & 1, axis=(1, 2), dtype=jnp.int32
                     ).astype(jnp.float32)
        stability = hi / jnp.maximum(lo, 1.0)

        masks_bool = (flags & 2).astype(bool)
        # batched_mask_to_box (utils/amg.py:303-346): XYXY where x2/y2
        # are the LAST true pixel indices (no +1); empty → [0,0,0,0].
        rows = jnp.any(masks_bool, axis=2)
        cols = jnp.any(masks_bool, axis=1)
        ridx = jnp.arange(hgt)
        cidx = jnp.arange(wid)
        top = jnp.min(jnp.where(rows, ridx, hgt), axis=1)
        bottom = jnp.max(jnp.where(rows, ridx, -1), axis=1)
        left = jnp.min(jnp.where(cols, cidx, wid), axis=1)
        right = jnp.max(jnp.where(cols, cidx, -1), axis=1)
        empty = ~jnp.any(rows, axis=1)
    boxes = jnp.stack([left, top, right, bottom], axis=1)
    boxes = jnp.where(empty[:, None], 0, boxes).astype(jnp.float32)

    return masks_bool, iou, stability, boxes


def _pack_bits(masks: jnp.ndarray) -> jnp.ndarray:
    """bool [M, H, W] → uint8 [M, H, ceil(W/8)] (np.unpackbits layout) —
    device→host mask transfers shrink 8x (the tunnel readback dominated
    AMG wall time)."""
    m, h, w = masks.shape
    pad = (-w) % 8
    x = jnp.pad(masks, ((0, 0), (0, 0), (0, pad))).astype(jnp.uint8)
    x = x.reshape(m, h, (w + pad) // 8, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(x * weights, axis=-1, dtype=jnp.uint8)


@partial(jax.jit, static_argnames=("amg", "max_out", "crop_box",
                                   "orig_box"))
def _select_and_pack(masks, iou, stab, boxes, valid, amg: AmgConfig,
                     max_out: int, crop_box=None, orig_box=None):
    """On-device filtering + greedy NMS + top-K gather + bit-packing:
    only the kept masks' bits leave the device.

    ``crop_box``/``orig_box`` (XYXY tuples): drop candidates whose box
    touches the crop boundary but not the original image boundary
    (is_box_near_crop_edge, utils/amg.py:78-89, atol 20)."""
    from revisit_anything_tpu.ops.nms import nms_keep_mask
    keep = valid & (stab >= amg.stability_score_thresh)
    if amg.pred_iou_thresh > 0.0:        # reference guard (:296-298)
        keep = keep & (iou > amg.pred_iou_thresh)
    if crop_box is not None:
        x0, y0 = crop_box[0], crop_box[1]
        b = boxes + jnp.asarray([x0, y0, x0, y0], jnp.float32)
        near_crop = jnp.abs(b - jnp.asarray(crop_box, jnp.float32)) <= 20.0
        near_img = jnp.abs(b - jnp.asarray(orig_box, jnp.float32)) <= 20.0
        keep = keep & ~jnp.any(near_crop & ~near_img, axis=1)
    scores = jnp.where(keep, iou, -jnp.inf)
    nms_keep = nms_keep_mask(boxes, scores, amg.box_nms_thresh)
    final_scores = jnp.where(nms_keep & keep, iou, -jnp.inf)
    order = jnp.argsort(-final_scores)[:max_out]           # score desc
    n_kept = jnp.sum(final_scores > -jnp.inf)
    packed = _pack_bits(masks[order])
    return packed, order, n_kept


def _preprocess_any(image_rgb: np.ndarray, cfg: SamArchConfig):
    """Device preprocess for upscaled inputs (uint8 upload), PIL host path
    for downscaling. Returns ([1, S, S, 3] device array, input_hw)."""
    h, w = image_rgb.shape[:2]
    input_hw = resize_longest_side(h, w, cfg.image_size)
    if input_hw[0] >= h and input_hw[1] >= w:
        return _preprocess_device(jnp.asarray(image_rgb), cfg,
                                  input_hw), input_hw
    batched, input_hw = preprocess_image(image_rgb, cfg)
    return jnp.asarray(batched), input_hw


def generate_masks(params: Params, cfg: SamArchConfig,
                   image_rgb: np.ndarray,
                   amg: AmgConfig = AmgConfig(),
                   max_masks: int = 512) -> List[MaskRecord]:
    """Full automatic mask generation for one RGB uint8 image.

    Returns MaskRecords ordered by predicted IoU desc (torchvision-NMS keep
    order, matching the reference's output ordering). ``max_masks`` caps
    the device→host transfer (post-NMS mask counts are far below it in
    practice; hit only by pathological inputs).
    """
    if amg.crop_n_layers > 0:
        return _generate_multicrop(params, cfg, image_rgb, amg, max_masks)
    batched, input_hw = _preprocess_any(image_rgb, cfg)
    embedding = encode_image(params, cfg, batched)[0]
    return _generate_from_embedding(params, cfg, embedding, input_hw,
                                    image_rgb.shape[:2], amg, max_masks)


# Stable per-config encoder callables: data_parallel_apply keys its jit
# cache on function identity, so a fresh closure per batch would retrace
# (and recompile) the ViT encoder on every generate_masks_batch call.
_ENCODE_FNS: dict = {}


def _encode_fn_for(cfg: SamArchConfig):
    if cfg not in _ENCODE_FNS:
        _ENCODE_FNS[cfg] = lambda p, xb: encode_image(p, cfg, xb)
    return _ENCODE_FNS[cfg]


def generate_masks_batch(params: Params, cfg: SamArchConfig,
                         images_rgb: List[np.ndarray],
                         amg: AmgConfig = AmgConfig(),
                         max_masks: int = 512,
                         mesh=None) -> List[List[MaskRecord]]:
    """AMG over a batch of same-shape images: ONE encoder dispatch for the
    whole batch (amortizes weight HBM traffic and host↔device latency —
    the extraction stage's throughput mode), then per-image decoding.

    ``mesh``: shard the encoder batch over the mesh's data axis (multi-
    device extraction; prompt decoding stays per image on the default
    device)."""
    if not images_rgb:
        return []
    assert len({im.shape for im in images_rgb}) == 1, "same-shape batch"
    if amg.crop_n_layers > 0:
        # multicrop needs one encoder pass PER crop — no shared-batch
        # encode to amortize; fall through to the per-image path rather
        # than silently ignoring crop_n_layers
        return [_generate_multicrop(params, cfg, im, amg, max_masks)
                for im in images_rgb]
    pre = [_preprocess_any(im, cfg) for im in images_rgb]
    batched = jnp.concatenate([p[0] for p in pre], axis=0)
    if mesh is not None and mesh.devices.size > 1:
        from revisit_anything_tpu.parallel import data_parallel_apply
        # device array in, device array out — no host round-trips of the
        # f32 batch or the embeddings
        embeddings = data_parallel_apply(
            _encode_fn_for(cfg), params, batched, mesh)
    else:
        embeddings = encode_image(params, cfg, batched)
    return [
        _generate_from_embedding(params, cfg, embeddings[i], pre[i][1],
                                 images_rgb[i].shape[:2], amg, max_masks)
        for i in range(len(images_rgb))
    ]


def _crop_candidates(params: Params, cfg: SamArchConfig,
                     embedding: jnp.ndarray,
                     input_hw: Tuple[int, int],
                     crop_hw: Tuple[int, int],
                     amg: AmgConfig,
                     max_masks: int,
                     points_per_side: int,
                     crop_box=None,
                     orig_box=None):
    """Grid-decode one crop and return its post-NMS candidates as host
    arrays (masks bool [n, ch, cw] in the CROP frame, iou [n], stability
    [n], prompt points [n, 2] in crop coords) in NMS keep order."""
    h, w = crop_hw
    image_pe = dense_positional_embedding(params, cfg)[0]

    # point grid in crop coords → 1024-frame coords
    # (apply_coords: scale by resized/original per axis, transforms.py:40-50).
    grid = build_point_grid(points_per_side)
    pts_orig = grid * np.array([w, h], np.float32)
    scale = np.array([input_hw[1] / w, input_hw[0] / h], np.float32)
    pts_1024 = (pts_orig * scale).astype(np.float32)

    n = pts_1024.shape[0]
    bsz = min(amg.points_per_batch, n)
    pad = (-n) % bsz
    if pad:
        pts_1024 = np.concatenate(
            [pts_1024, np.zeros((pad, 2), np.float32)], axis=0)
        pts_orig = np.concatenate(
            [pts_orig, np.zeros((pad, 2), np.float32)], axis=0)
    valid_pts = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])

    # all decode batches stay on device; no host sync inside the loop
    dm, di, dst, dbx = [], [], [], []
    for s in range(0, len(pts_1024), bsz):
        mb, io, st, bx = _decode_batch(
            params, cfg, embedding, image_pe,
            jnp.asarray(pts_1024[s:s + bsz]), input_hw, (h, w), amg)
        dm.append(mb); di.append(io); dst.append(st); dbx.append(bx)

    masks_dev = jnp.concatenate(dm)
    iou_dev = jnp.concatenate(di)
    stab_dev = jnp.concatenate(dst)
    boxes_dev = jnp.concatenate(dbx)
    valid_dev = jnp.asarray(np.repeat(valid_pts, 3))

    max_out = min(max_masks, masks_dev.shape[0])
    packed, order, n_kept = _select_and_pack(
        masks_dev, iou_dev, stab_dev, boxes_dev, valid_dev, amg, max_out,
        crop_box=crop_box, orig_box=orig_box)

    n_kept = min(int(n_kept), max_out)
    if n_kept == 0:
        z = np.zeros((0,))
        return (np.zeros((0, h, w), bool), z, z, np.zeros((0, 2)),
                np.zeros((0, 4), np.float32))
    order = np.asarray(order)[:n_kept]
    packed_np = np.asarray(packed)[:n_kept]
    iou = np.asarray(iou_dev)[order]
    stab = np.asarray(stab_dev)[order]
    points = np.repeat(pts_orig, 3, axis=0)[order]
    boxes = np.asarray(boxes_dev)[order]          # crop-frame XYXY
    masks = np.unpackbits(packed_np, axis=-1)[:, :, :w].astype(bool)
    return masks, iou, stab, points, boxes


def _assemble_records(final_masks, iou, stab, points, crop_boxes_per_mask,
                      amg: AmgConfig) -> List[MaskRecord]:
    """MaskRecord assembly incl. the reference's final area filter
    (generate(): ann kept only if area > min_mask_region_area,
    automatic_mask_generator.py:192-194)."""
    records = []
    for j, seg in enumerate(final_masks):
        area = int(seg.sum())
        if area <= amg.min_mask_region_area:
            continue
        ys, xs = np.nonzero(seg)
        bbox = (float(xs.min()), float(ys.min()),
                float(xs.max() - xs.min()), float(ys.max() - ys.min()))
        records.append(MaskRecord(
            segmentation=seg,
            area=area,
            bbox=bbox,
            predicted_iou=float(iou[j]),
            point_coords=points[j][None, :].astype(np.float64),
            stability_score=float(stab[j]),
            crop_box=tuple(crop_boxes_per_mask[j]),
        ))
    return records


def _generate_from_embedding(params: Params, cfg: SamArchConfig,
                             embedding: jnp.ndarray,
                             input_hw: Tuple[int, int],
                             orig_hw: Tuple[int, int],
                             amg: AmgConfig,
                             max_masks: int) -> List[MaskRecord]:
    h, w = orig_hw
    masks, iou, stab, points, _ = _crop_candidates(
        params, cfg, embedding, input_hw, orig_hw, amg, max_masks,
        amg.points_per_side)
    if len(masks) == 0:
        return []
    final_masks = list(masks)
    keep = np.arange(len(final_masks))
    if amg.min_mask_region_area > 0 and final_masks:
        # the reference always passes max(box, crop) here, even with a
        # single crop (automatic_mask_generator.py generate :188-194)
        final_masks, keep = _postprocess_small_regions(
            final_masks, amg.min_mask_region_area,
            max(amg.box_nms_thresh, amg.crop_nms_thresh))
    return _assemble_records(final_masks, iou[keep], stab[keep],
                             points[keep],
                             [(0, 0, w, h)] * len(final_masks), amg)


def _generate_multicrop(params: Params, cfg: SamArchConfig,
                        image_rgb: np.ndarray,
                        amg: AmgConfig,
                        max_masks: int) -> List[MaskRecord]:
    """Multi-crop AMG (_generate_masks/_process_crop,
    automatic_mask_generator.py:198-265): per crop, run the scaled point
    grid with crop-edge filtering and per-crop NMS; uncrop masks/points to
    the original frame; cross-crop NMS with scores 1/area(crop_box)
    (smaller crops win)."""
    orig_h, orig_w = image_rgb.shape[:2]
    crop_boxes, layer_idxs = generate_crop_boxes(
        (orig_h, orig_w), amg.crop_n_layers, amg.crop_overlap_ratio)

    all_masks, all_iou, all_stab, all_pts, all_cb = [], [], [], [], []
    all_boxes = []
    for cb, layer in zip(crop_boxes, layer_idxs):
        x0, y0, x1, y1 = cb
        crop = image_rgb[y0:y1, x0:x1]
        batched, input_hw = _preprocess_any(crop, cfg)
        embedding = encode_image(params, cfg, batched)[0]
        pps = max(1, int(amg.points_per_side
                         / (amg.crop_n_points_downscale_factor ** layer)))
        masks, iou, stab, pts, bxs = _crop_candidates(
            params, cfg, embedding, input_hw, crop.shape[:2], amg,
            max_masks, pps, crop_box=tuple(cb),
            orig_box=(0, 0, orig_w, orig_h))
        if len(masks) == 0:
            continue
        # uncrop to the original frame (utils/amg.py:237-264)
        unc = np.zeros((len(masks), orig_h, orig_w), bool)
        unc[:, y0:y1, x0:x1] = masks
        all_masks.append(unc)
        all_iou.append(iou)
        all_stab.append(stab)
        all_pts.append(pts + np.array([x0, y0], np.float32))
        # uncrop_boxes_xyxy (utils/amg.py:229-236): offset the boxes the
        # decode already computed — no O(n·H·W) host nonzero re-scan
        all_boxes.append(bxs + np.array([x0, y0, x0, y0], np.float32))
        all_cb.extend([tuple(cb)] * len(masks))

    if not all_masks:
        return []
    masks = np.concatenate(all_masks)
    iou = np.concatenate(all_iou)
    stab = np.concatenate(all_stab)
    points = np.concatenate(all_pts)

    if len(crop_boxes) > 1:
        # cross-crop NMS preferring smaller crops (1/box_area scores,
        # automatic_mask_generator.py:210-222)
        from revisit_anything_tpu.ops.nms import nms_host
        boxes = np.concatenate(all_boxes).astype(np.float32)
        areas = np.array([(c[2] - c[0]) * (c[3] - c[1]) for c in all_cb],
                         np.float64)
        keep = nms_host(boxes, (1.0 / areas).astype(np.float32),
                        amg.crop_nms_thresh)
        masks = masks[keep]
        iou = iou[keep]
        stab = stab[keep]
        points = points[keep]
        all_cb = [all_cb[k] for k in keep]

    final_masks = list(masks)
    keep2 = np.arange(len(final_masks))
    if amg.min_mask_region_area > 0 and final_masks:
        final_masks, keep2 = _postprocess_small_regions(
            final_masks, amg.min_mask_region_area,
            max(amg.box_nms_thresh, amg.crop_nms_thresh))
    # MaskRecord/h5 schema stores crop_box XYWH (box_xyxy_to_xywh,
    # automatic_mask_generator.py:191); all_cb carries XYXY internally
    records = _assemble_records(
        final_masks, iou[keep2], stab[keep2], points[keep2],
        [(all_cb[k][0], all_cb[k][1],
          all_cb[k][2] - all_cb[k][0], all_cb[k][3] - all_cb[k][1])
         for k in keep2], amg)
    if len(records) > max_masks:
        # per-crop capping can admit up to (#crops)·max_masks candidates;
        # honor the documented overall cap, best predicted IoU first
        records.sort(key=lambda r: -r.predicted_iou)
        records = records[:max_masks]
    return records


def _postprocess_small_regions(masks: List[np.ndarray], min_area: int,
                               nms_thresh: float):
    """Remove small islands / fill small holes, then NMS that prefers
    unchanged masks (postprocess_small_regions,
    automatic_mask_generator.py:324-376)."""
    from revisit_anything_tpu.native import nms_native, remove_small_regions

    new_masks, unchanged_scores = [], []
    for m in masks:
        m2, ch_holes = remove_small_regions(m, min_area, "holes")
        m2, ch_islands = remove_small_regions(m2, min_area, "islands")
        new_masks.append(m2)
        unchanged_scores.append(float(not (ch_holes or ch_islands)))

    boxes = []
    for m in new_masks:
        ys, xs = np.nonzero(m)
        boxes.append([xs.min(), ys.min(), xs.max(), ys.max()]
                     if len(xs) else [0, 0, 0, 0])
    keep = nms_native(np.asarray(boxes, np.float32),
                      np.asarray(unchanged_scores, np.float32), nms_thresh)
    # reference postprocess_small_regions emits records in NMS keep
    # order (unchanged masks score 1.0 and come first,
    # automatic_mask_generator.py:370-375) — do NOT re-sort
    return [new_masks[i] for i in keep], keep
