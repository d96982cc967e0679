"""Offline extraction stage: images → mask/feature HDF5 artifacts.

The TPU equivalent of place_rec_SAM_DINO.py:19-142: SAM automatic masks at
half the DINO resolution (place_rec_SAM_DINO.py:51-63) and DINOv2 ViT-g/14
layer-31 value-facet dense features at full resolution, written in the
reference's h5 schemas so artifacts interoperate both ways.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import h5py
import numpy as np

import jax.numpy as jnp

from revisit_anything_tpu.io.h5io import (write_dino_features,
                                          write_image_masks)
from revisit_anything_tpu.models import dinov2 as dn
from revisit_anything_tpu.models.sam.amg import AmgConfig
from revisit_anything_tpu.models.sam.config import SamArchConfig
from revisit_anything_tpu.ops.vlad import l2_normalize
from revisit_anything_tpu.utils.profiling import stage_timer


def load_image_rgb(path: str) -> np.ndarray:
    """uint8 RGB image from disk."""
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


def _resize_cv2_bilinear(img: np.ndarray, wh: Tuple[int, int]) -> np.ndarray:
    """cv2.resize INTER_LINEAR — the reference's image resize
    (func_vpr.py:540-553)."""
    import cv2
    return cv2.resize(img, wh, interpolation=cv2.INTER_LINEAR)


# module-level RNG: the reference draws the random pixel from the GLOBAL
# numpy RNG (func_vpr.py:731-733) — a fresh default_rng(0) per call would
# hand every zero-mask image the identical "random" pixel
_FALLBACK_RNG = np.random.default_rng(0)


def _fallback_records(hw: Tuple[int, int]):
    """Synthetic masks for images where the AMG keeps nothing — the
    reference's FastSAM empty-output fallback (func_vpr.py:721-736: a
    full-frame mask + one random pixel), reused here for the SAM path
    too (a DOCUMENTED deviation: the reference SAM path would write an
    empty masks group, which its own preload_masks cannot stack)."""
    from revisit_anything_tpu.io.h5io import MaskRecord
    h, w = hw
    full = np.ones((h, w), dtype=bool)
    pixel = np.zeros((h, w), dtype=bool)
    ry = int(_FALLBACK_RNG.integers(0, h))
    rx = int(_FALLBACK_RNG.integers(0, w))
    pixel[ry, rx] = True
    # truthful XYWH bboxes (the reference fallback records carry only
    # 'segmentation'; our schema always writes every field)
    return [MaskRecord(full, h * w, (0, 0, w - 1, h - 1), 0.0,
                       np.zeros((1, 2)), 0.0, (0, 0, w, h)),
            MaskRecord(pixel, 1, (rx, ry, 0, 0), 0.0,
                       np.zeros((1, 2)), 0.0, (0, 0, w, h))]


def extract_sam_masks(image_paths: Sequence[str],
                      image_keys: Sequence[str],
                      out_h5_path: str,
                      sam_params,
                      sam_cfg: SamArchConfig,
                      target_hw: Tuple[int, int],
                      amg: AmgConfig = AmgConfig(),
                      progress: bool = True,
                      encode_batch: int = 0,
                      mesh="auto") -> None:
    """Run the automatic mask generator over images; write the reference's
    mask h5 schema (process_SAM_to_h5, func_vpr.py:664-679). Images are
    encoded ``encode_batch`` at a time (one ViT-H dispatch per batch;
    0 = auto: the device count when a mesh is active, else 1 — re-measure
    with the bench knob on directly-attached chips before changing the
    single-device default). With mesh="auto" on a multi-device host the
    encoder batch is sharded over the data axis."""
    from revisit_anything_tpu.models.sam.amg import generate_masks_batch
    from revisit_anything_tpu.parallel import resolve_mesh
    mesh = resolve_mesh(mesh)
    if encode_batch <= 0:
        encode_batch = (int(mesh.devices.size)
                        if mesh is not None and mesh.devices.size > 1 else 1)
    timer = stage_timer()
    with h5py.File(out_h5_path, "w") as f:
        for s in range(0, len(image_paths), encode_batch):
            paths = image_paths[s:s + encode_batch]
            keys = image_keys[s:s + encode_batch]
            with timer.stage("sam.load"):
                imgs = [_resize_cv2_bilinear(load_image_rgb(p),
                                             (target_hw[1], target_hw[0]))
                        for p in paths]
            with timer.stage("sam.generate"):
                per_image = generate_masks_batch(sam_params, sam_cfg,
                                                 imgs, amg, mesh=mesh)
            with timer.stage("sam.write"):
                for key, records in zip(keys, per_image):
                    if not records:
                        # Zero-mask fallback (func_vpr.py:721-736): a
                        # full-frame mask + a single-random-pixel mask keep
                        # the downstream segment table non-empty.
                        records = _fallback_records(target_hw)
                    write_image_masks(f, key, records)
                    if progress:
                        print(f"[sam] {key}: {len(records)} masks",
                              flush=True)


# Stable per-config forward callables: data_parallel_apply keys its jit
# cache on function identity — a fresh closure per call would recompile
# the ViT forward on every ref/query set (see parallel/data_parallel.py).
_DINO_FWD_FNS: dict = {}


def _dino_fwd_for(dino_cfg, layer, facet, dh, dw):
    key = (dino_cfg, layer, facet, dh, dw)
    if key not in _DINO_FWD_FNS:
        def fwd(p, xb):
            feats = dn.extract_dense(p, dino_cfg, xb, layer, facet)
            # [B, dh*dw, D] → [B, D, dh, dw], L2 over D
            feats = jnp.transpose(feats, (0, 2, 1)).reshape(
                xb.shape[0], -1, dh, dw)
            return l2_normalize(feats, axis=1)
        _DINO_FWD_FNS[key] = fwd
    return _DINO_FWD_FNS[key]


def extract_dino_features(image_paths: Sequence[str],
                          image_keys: Sequence[str],
                          out_h5_path: str,
                          dino_params,
                          dino_cfg: dn.DinoV2Config,
                          target_hw: Tuple[int, int],
                          layer: int = 31,
                          facet: str = "value",
                          batch_size: int = 8,
                          progress: bool = True,
                          mesh="auto") -> None:
    """DINOv2 dense value-facet features → h5 (`ift_dino` [1, D, dh, dw]),
    L2-normalized over channels like process_single_DINO (func_vpr.py:549-563).
    Images are batched per jit call; one static shape per dataset size.
    On a multi-device host the batch is sharded over the mesh's data axis
    (mesh="auto"; pass None to force single-device)."""
    from revisit_anything_tpu.parallel import (data_parallel_apply,
                                               resolve_mesh)
    mesh = resolve_mesh(mesh)
    timer = stage_timer()
    dh, dw = target_hw[0] // 14, target_hw[1] // 14
    fwd = _dino_fwd_for(dino_cfg, layer, facet, dh, dw)

    with h5py.File(out_h5_path, "w") as f:
        for s in range(0, len(image_paths), batch_size):
            paths = image_paths[s:s + batch_size]
            keys = image_keys[s:s + batch_size]
            with timer.stage("dino.load"):
                imgs = np.stack([
                    _resize_cv2_bilinear(load_image_rgb(p),
                                         (target_hw[1], target_hw[0]))
                    for p in paths])
                x = dn.preprocess(imgs)
            with timer.stage("dino.forward"):
                if mesh is not None and mesh.devices.size > 1:
                    feats_np = np.asarray(data_parallel_apply(
                        fwd, dino_params, x, mesh), dtype=np.float32)
                else:
                    feats_np = np.asarray(fwd(dino_params, jnp.asarray(x)),
                                          dtype=np.float32)
            with timer.stage("dino.write"):
                for i, key in enumerate(keys):
                    write_dino_features(f, key, feats_np[i:i + 1])
            if progress:
                print(f"[dino] {s + len(paths)}/{len(image_paths)}",
                      flush=True)


def extract_dinov1_features_to_h5(image_paths: Sequence[str],
                                  image_keys: Sequence[str],
                                  out_h5_path: str,
                                  params,
                                  cfg,
                                  target_hw: Tuple[int, int],
                                  stride: int = 4,
                                  layer: int = 11,
                                  facet: str = "key",
                                  load_size: int = 224,
                                  binned: bool = False,
                                  # the reference wrapper hard-codes
                                  # upsample=True (dino_wrapper.py:4-40)
                                  upsample: bool = True,
                                  batch_size: int = 8,
                                  progress: bool = True) -> None:
    """DINOv1 (legacy) dense features → h5 (`ift_dino` [1, D, gh, gw]).

    The collect_dino_features.py flow (DINO/collect_dino_features.py:
    32-109 / dino_wrapper.py): images at the dataset resolution, short
    side resized to ``load_size`` (torchvision F.resize int semantics),
    scaled to [0, 1] with NO ImageNet normalization (preprocess_image
    :9-23 only divides by 255, and VITFeatureExtractor.forward defaults
    apply_default_input_transform=False), stride-``stride`` patched ViT
    facet extraction at ``layer`` (ViTExtractor, head-minor channel
    order), optional GSP log binning, optional bilinear
    align_corners=True upsample back to ``target_hw`` (upsample_feat_vec
    :25-28). Features are stored RAW like the wrapper returns them (the
    reference has no DINOv1 h5 stage; our aggregation L2-normalizes on
    every load — pipeline/aggregate.py:97-100)."""
    from revisit_anything_tpu.models import dinov1 as d1
    timer = stage_timer()
    th, tw = target_hw
    # torchvision F.resize(int): smaller edge → size, other int-scaled
    if th <= tw:
        lh, lw = load_size, int(load_size * tw / th)
    else:
        lh, lw = int(load_size * th / tw), load_size
    gh, gw = d1.strided_grid(lh, lw, cfg.patch_size, stride)

    with h5py.File(out_h5_path, "w") as f:
        for s in range(0, len(image_paths), batch_size):
            paths = image_paths[s:s + batch_size]
            keys = image_keys[s:s + batch_size]
            with timer.stage("dinov1.load"):
                # /255 only — the reference applies NO ImageNet
                # normalization on this path (see docstring). The
                # load_size resize runs on the FLOAT image after /255
                # (the reference's torchvision F.resize acts on the
                # float tensor; an intermediate uint8 rounding would
                # drift every pixel by up to 0.5/255).
                from revisit_anything_tpu.ops.resize import (
                    bilinear_resize_torch)
                ds_res = np.stack([
                    _resize_cv2_bilinear(load_image_rgb(p), (tw, th))
                    for p in paths]).astype(np.float32) / 255.0
                x = np.asarray(bilinear_resize_torch(
                    ds_res.transpose(0, 3, 1, 2), (lh, lw))
                ).transpose(0, 2, 3, 1)
            with timer.stage("dinov1.forward"):
                # f32 forward: this is the offline parity artifact path
                # (the reference computes float32; f16 only behind its
                # use_16bit flag)
                feats = d1.extract_dense(params, cfg,
                                         jnp.asarray(x, jnp.float32),
                                         layer=layer, facet=facet,
                                         stride=stride)
                if binned:
                    feats = d1.log_bin(feats, (gh, gw))
                fm = jnp.transpose(feats, (0, 2, 1)).reshape(
                    len(paths), -1, gh, gw)
                if upsample:
                    from revisit_anything_tpu.ops.resize import (
                        bilinear_resize_align_corners)
                    fm = bilinear_resize_align_corners(
                        fm.astype(jnp.float32), (th, tw))
                feats_np = np.asarray(fm, dtype=np.float32)
            with timer.stage("dinov1.write"):
                for i, key in enumerate(keys):
                    write_dino_features(f, key, feats_np[i:i + 1])
            if progress:
                print(f"[dinoV1] {s + len(paths)}/{len(image_paths)}",
                      flush=True)


def extract_dinonv_features_to_h5(image_paths: Sequence[str],
                                  image_keys: Sequence[str],
                                  out_h5_path: str,
                                  vladbuff_params,
                                  cfg: "dn.DinoV2Config",
                                  target_hw: Tuple[int, int],
                                  batch_size: int = 8,
                                  progress: bool = True) -> None:
    """SegVLAD-FineT dense backbone features (768-d, UNnormalized — the
    reference stores them raw, func_vpr.py process_DINONV :1739-1760) →
    *_dinoNV_*.h5 with the ift_dino dataset name."""
    from revisit_anything_tpu.training.vladbuff import (
        extract_dinonv_features)
    timer = stage_timer()
    with h5py.File(out_h5_path, "w") as f:
        for s in range(0, len(image_paths), batch_size):
            paths = image_paths[s:s + batch_size]
            keys = image_keys[s:s + batch_size]
            with timer.stage("dinonv.load"):
                imgs = np.stack([
                    _resize_cv2_bilinear(load_image_rgb(p),
                                         (target_hw[1], target_hw[0]))
                    for p in paths])
                x = dn.preprocess(imgs)
            with timer.stage("dinonv.forward"):
                feats = extract_dinonv_features(vladbuff_params, cfg,
                                                jnp.asarray(x))
                feats_np = np.asarray(feats, dtype=np.float32)
            with timer.stage("dinonv.write"):
                for i, key in enumerate(keys):
                    write_dino_features(f, key, feats_np[i:i + 1])
            if progress:
                print(f"[dinoNV] {s + len(paths)}/{len(image_paths)}",
                      flush=True)


def extract_dinosalad_features_to_h5(image_paths: Sequence[str],
                                     image_keys: Sequence[str],
                                     out_h5_path: str,
                                     salad_params,
                                     cfg: "dn.DinoV2Config",
                                     target_hw: Tuple[int, int],
                                     batch_size: int = 8,
                                     progress: bool = True) -> None:
    """DINO-SALAD dense backbone features (channel-L2-normalized,
    process_dino_salad_ft_to_h5 func_vpr.py:1824-1852) → *_dinoSALAD_*.h5."""
    from revisit_anything_tpu.training.vladbuff import (
        extract_dinosalad_features)
    timer = stage_timer()
    with h5py.File(out_h5_path, "w") as f:
        for s in range(0, len(image_paths), batch_size):
            paths = image_paths[s:s + batch_size]
            keys = image_keys[s:s + batch_size]
            imgs = np.stack([
                _resize_cv2_bilinear(load_image_rgb(p),
                                     (target_hw[1], target_hw[0]))
                for p in paths])
            x = dn.preprocess(imgs)
            with timer.stage("dinosalad.forward"):
                feats = extract_dinosalad_features(salad_params, cfg,
                                                   jnp.asarray(x))
                feats_np = np.asarray(feats, dtype=np.float32)
            for i, key in enumerate(keys):
                write_dino_features(f, key, feats_np[i:i + 1])
            if progress:
                print(f"[dinoSALAD] {s + len(paths)}/{len(image_paths)}",
                      flush=True)
