"""ctypes bindings for the native maskops library (native/maskops.cpp).

Builds the shared library on first use (g++, cached next to the source);
every function has a pure-numpy fallback so the package works without a
compiler. Covers the reference's third-party native mask utilities:
RLE encode/decode (utils/amg.py:107-146), connectedComponents small-region
postprocessing (:267-300), torchvision box NMS.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "maskops.cpp")


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SRC):
            return None
        so = os.path.join(os.path.dirname(_SRC), "libmaskops.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", so],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.CalledProcessError) as e:
            print(f"[native] maskops unavailable ({e}); numpy fallbacks",
                  file=sys.stderr)
            return None

        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.rle_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i32p]
        lib.rle_encode.restype = ctypes.c_int
        lib.rle_decode.argtypes = [i32p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, u8p]
        lib.rle_decode.restype = None
        lib.connected_components.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                             i32p, i32p]
        lib.connected_components.restype = ctypes.c_int
        lib.remove_small_regions.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                             ctypes.c_int, ctypes.c_int]
        lib.remove_small_regions.restype = ctypes.c_int
        lib.nms.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float, i32p]
        lib.nms.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def rle_encode(mask: np.ndarray) -> dict:
    """Bool [H, W] → SAM uncompressed RLE {'size': [H, W], 'counts': [...]}
    (column-major runs, first count is zeros)."""
    h, w = mask.shape
    m = np.ascontiguousarray(mask.astype(np.uint8))
    lib = _build_and_load()
    if lib is not None:
        counts = np.empty(h * w + 1, np.int32)
        n = lib.rle_encode(m, h, w, counts)
        return {"size": [h, w], "counts": counts[:n].tolist()}
    # normalize to strict 0/1 BEFORE the run detection: a uint8 mask of
    # 255s would fail a `== 1` foreground test (and int8 overflow makes
    # it -1), dropping the leading zero count and parity-inverting the
    # decoded mask — the native path already treats any nonzero as
    # foreground
    flat = (np.asfortranarray(mask).reshape(-1, order="F") != 0
            ).astype(np.int8)
    changes = np.nonzero(np.diff(flat))[0] + 1
    edges = np.concatenate([[0], changes, [len(flat)]])
    counts = np.diff(edges).tolist()
    if flat[0] == 1:
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def rle_decode(rle: dict) -> np.ndarray:
    """SAM uncompressed RLE → bool [H, W]."""
    h, w = rle["size"]
    counts = np.asarray(rle["counts"], np.int32)
    lib = _build_and_load()
    if lib is not None:
        out = np.zeros(h * w, np.uint8).reshape(h, w)
        lib.rle_decode(np.ascontiguousarray(counts), len(counts), h, w, out)
        return out.astype(bool)
    flat = np.zeros(h * w, bool)
    idx, val = 0, False
    for c in counts:
        if val:
            flat[idx:idx + c] = True
        idx += c
        val = not val
    return flat.reshape(w, h).T


def connected_components(mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """8-connectivity labeling. Returns (labels [H, W] int32 with 0 =
    background, areas [n_labels+1])."""
    h, w = mask.shape
    m = np.ascontiguousarray(mask.astype(np.uint8))
    lib = _build_and_load()
    if lib is not None:
        labels = np.zeros((h, w), np.int32)
        areas = np.zeros(h * w + 1, np.int32)
        n = lib.connected_components(m, h, w, labels, areas)
        return labels, areas[:n + 1]
    # pure-scipy fallback (scipy IS a declared dependency; cv2 is not).
    # areas[0] is 0 on BOTH paths (the native path never accumulates the
    # background label) — callers must not read a background area there.
    from scipy import ndimage
    labels, n = ndimage.label(m, structure=np.ones((3, 3), np.int32))
    areas = np.bincount(labels.ravel(), minlength=n + 1).astype(np.int32)
    areas[0] = 0
    return labels.astype(np.int32), areas


def remove_small_regions(mask: np.ndarray, area_thresh: int,
                         mode: str) -> Tuple[np.ndarray, bool]:
    """AMG postprocess_small_regions building block (utils/amg.py:267-300).
    mode 'islands' removes small foreground components; 'holes' fills small
    background components."""
    assert mode in ("islands", "holes")
    m = np.ascontiguousarray(mask.astype(np.uint8))
    lib = _build_and_load()
    if lib is not None:
        changed = lib.remove_small_regions(m, m.shape[0], m.shape[1],
                                           int(area_thresh),
                                           1 if mode == "holes" else 0)
        return m.astype(bool), bool(changed)
    work = ~mask if mode == "holes" else mask.copy()
    labels, areas = connected_components(work)
    small = np.zeros(len(areas), bool)
    small[1:] = areas[1:] < area_thresh
    if mode == "islands" and len(areas) > 1 and small[1:].all():
        # every foreground component below threshold: keep the largest
        # (amg.py:286-289); modified=True because small regions existed
        best = 1 + int(np.argmax(areas[1:]))
        out = labels == best
        return out, True
    target = small[labels]
    out = mask.copy()
    out[target] = mode == "holes"
    return out, bool(target.any())


def nms_native(boxes: np.ndarray, scores: np.ndarray,
               iou_thresh: float) -> np.ndarray:
    """Greedy NMS via the C++ library (falls back to ops.nms.nms_host)."""
    lib = _build_and_load()
    if lib is None:
        from revisit_anything_tpu.ops.nms import nms_host
        return nms_host(boxes, scores, iou_thresh)
    b = np.ascontiguousarray(boxes, np.float32)
    s = np.ascontiguousarray(scores, np.float32)
    keep = np.empty(len(b), np.int32)
    n = lib.nms(b, s, len(b), float(iou_thresh), keep)
    return keep[:n].astype(np.int64)
