"""HDF5 artifact I/O, bit-compatible with the reference stage layout.

Mask files (written by the reference's process_SAM_to_h5, func_vpr.py:664-679):
    <image_key>/masks/<j>/segmentation   bool [h, w]
    <image_key>/masks/<j>/area           scalar
    <image_key>/masks/<j>/bbox           [4] XYWH
    <image_key>/masks/<j>/predicted_iou  scalar
    <image_key>/masks/<j>/point_coords   [1, 2]
    <image_key>/masks/<j>/stability_score scalar
    <image_key>/masks/<j>/crop_box       [4]

Dense-feature files (process_dino_ft_to_h5, func_vpr.py:647-662):
    <image_key>/ift_dino                 float32 [1, D, dh, dw]

Mask subgroup keys are natural-sorted on read (reference uses natsort on
`masks/` keys, func_vpr.py:759). Writes use the reference's plain str(j)
keys for artifact bit-compatibility — consumers must natural-sort, never
rely on h5py's lexicographic iteration order.
"""

from __future__ import annotations

import dataclasses
import re
from typing import List, Sequence

import h5py
import numpy as np


@dataclasses.dataclass
class MaskRecord:
    """One SAM automatic-mask-generator output record."""
    segmentation: np.ndarray          # bool [h, w]
    area: int
    bbox: Sequence[float]             # XYWH
    predicted_iou: float
    point_coords: np.ndarray          # [1, 2]
    stability_score: float
    crop_box: Sequence[float]         # XYWH


_NUM_RE = re.compile(r"(\d+)")


def _natural_key(s: str):
    return [int(p) if p.isdigit() else p for p in _NUM_RE.split(s)]


def natsorted_keys(keys) -> List[str]:
    return sorted(keys, key=_natural_key)


def list_image_keys(h5: h5py.File) -> List[str]:
    """Image keys in NATURAL order: h5py iterates alphabetically
    ('img_10' before 'img_2'), while ground-truth rows and the reference
    (aggFt natsorts f.keys(), func_vpr.py:888) are natural-sorted —
    alphabetical order would pair predictions with the wrong gt rows."""
    return natsorted_keys(h5.keys())


def read_image_masks(h5: h5py.File, image_key: str,
                     min_area: int = 0,
                     segmentation_only: bool = False
                     ) -> List[MaskRecord]:
    """All masks of one image in natural order (preload_masks semantics,
    func_vpr.py:746-760). min_area filters like getIdxs (func_vpr.py:430);
    the production path passes 0 (all masks kept, func_vpr.py:762-786)."""
    group = h5[f"{image_key}/masks"]
    records: List[MaskRecord] = []
    for k in natsorted_keys(group.keys()):
        g = group[k]
        seg = None
        if "area" in g:
            area = int(g["area"][()])
        else:
            # FastSAM-style artifacts carry only 'segmentation'
            # (func_vpr.py:694-701) — read it ONCE for both the area
            # fallback and the record
            seg = g["segmentation"][()].astype(bool)
            area = int(seg.sum())
        if min_area and area <= min_area:
            continue
        if seg is None:
            seg = g["segmentation"][()].astype(bool)
        if segmentation_only:
            records.append(MaskRecord(seg, area, (0, 0, 0, 0), 0.0,
                                      np.zeros((1, 2)), 0.0, (0, 0, 0, 0)))
        else:
            records.append(MaskRecord(
                segmentation=seg,
                area=area,
                bbox=tuple(np.asarray(g["bbox"][()]).tolist())
                if "bbox" in g else (0, 0, 0, 0),
                predicted_iou=float(g["predicted_iou"][()])
                if "predicted_iou" in g else 0.0,
                point_coords=np.asarray(g["point_coords"][()])
                if "point_coords" in g else np.zeros((1, 2)),
                stability_score=float(g["stability_score"][()])
                if "stability_score" in g else 0.0,
                crop_box=tuple(np.asarray(g["crop_box"][()]).tolist())
                if "crop_box" in g else (0, 0, 0, 0),
            ))
    return records


def write_image_masks(h5: h5py.File, image_key: str,
                      records: Sequence[MaskRecord]) -> None:
    """Write AMG records under <image_key>/masks/<j>/<field> (the
    process_SAM_to_h5 schema, func_vpr.py:664-679)."""
    base = h5.require_group(image_key).require_group("masks")
    for j, rec in enumerate(records):
        g = base.require_group(str(j))
        g.create_dataset("segmentation", data=rec.segmentation.astype(bool),
                         compression="gzip")
        g.create_dataset("area", data=rec.area)
        g.create_dataset("bbox", data=np.asarray(rec.bbox))
        g.create_dataset("predicted_iou", data=rec.predicted_iou)
        g.create_dataset("point_coords", data=np.asarray(rec.point_coords))
        g.create_dataset("stability_score", data=rec.stability_score)
        g.create_dataset("crop_box", data=np.asarray(rec.crop_box))


def read_dino_features(h5: h5py.File, image_key: str) -> np.ndarray:
    """Dense features [1, D, dh, dw] float32 for one image."""
    return h5[image_key]["ift_dino"][()]


def write_dino_features(h5: h5py.File, image_key: str,
                        features: np.ndarray) -> None:
    """Write [1, D, dh, dw] float32 under <image_key>/ift_dino
    (process_dino_ft_to_h5 schema, func_vpr.py:647-662)."""
    g = h5.require_group(image_key)
    g.create_dataset("ift_dino", data=np.asarray(features, dtype=np.float32))


def read_all_masks_bool(h5: h5py.File, image_key: str) -> np.ndarray:
    """Stacked bool [M, h, w] segmentations for one image."""
    recs = read_image_masks(h5, image_key, segmentation_only=True)
    if not recs:
        return np.zeros((0, 1, 1), dtype=bool)
    return np.stack([r.segmentation for r in recs])


def count_masks(h5: h5py.File) -> int:
    """Total mask count across all images (countNumMasksInDataset,
    func_vpr.py:788-798)."""
    total = 0
    for key in h5.keys():
        grp = h5[key]
        if "masks" in grp:
            total += len(grp["masks"].keys())
    return total
