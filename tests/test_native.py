"""Native maskops (C++/ctypes) vs torch/cv2/numpy oracles."""

import numpy as np
import pytest
import torch

from revisit_anything_tpu import native
from revisit_anything_tpu.ops.nms import nms_host


def torch_rle_oracle(mask: np.ndarray) -> list:
    """Independent oracle of SAM's uncompressed RLE (column-major runs,
    leading zero-count)."""
    flat = torch.from_numpy(mask).t().flatten()  # fortran order
    counts = []
    cur, run = False, 0
    for v in flat.tolist():
        if bool(v) == cur:
            run += 1
        else:
            counts.append(run)   # emits the leading 0-count when flat[0]=1
            cur = bool(v)
            run = 1
    counts.append(run)
    return counts


def test_native_builds():
    assert native.native_available(), "g++ build of maskops failed"


def test_rle_roundtrip(rng):
    for shape in ((17, 23), (64, 64), (1, 5)):
        mask = rng.random(shape) > 0.6
        rle = native.rle_encode(mask)
        np.testing.assert_array_equal(native.rle_decode(rle), mask)


def test_rle_matches_oracle(rng):
    mask = rng.random((13, 9)) > 0.5
    rle = native.rle_encode(mask)
    assert rle["counts"] == torch_rle_oracle(mask)
    assert sum(rle["counts"]) == mask.size


def test_rle_empty_and_full():
    empty = np.zeros((8, 8), bool)
    full = np.ones((8, 8), bool)
    assert native.rle_encode(empty)["counts"] == [64]
    assert native.rle_encode(full)["counts"] == [0, 64]
    np.testing.assert_array_equal(native.rle_decode(native.rle_encode(full)),
                                  full)


def test_connected_components_vs_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    mask = (rng.random((40, 50)) > 0.7).astype(np.uint8)
    labels, areas = native.connected_components(mask.astype(bool))
    n_ref, labels_ref, stats, _ = cv2.connectedComponentsWithStats(mask, 8)
    assert len(areas) == n_ref  # same component count (+bg)
    # label ids may differ; compare partition via co-labeling
    for lbl in range(1, len(areas)):
        sel = labels == lbl
        ref_ids = np.unique(labels_ref[sel])
        assert len(ref_ids) == 1 and ref_ids[0] != 0
        assert areas[lbl] == stats[ref_ids[0], 4]


def test_remove_small_regions_islands():
    mask = np.zeros((20, 20), bool)
    mask[2:10, 2:10] = True        # area 64
    mask[15, 15] = True            # area 1 → removed
    out, changed = native.remove_small_regions(mask, 10, "islands")
    assert changed
    assert out[5, 5] and not out[15, 15]


def test_remove_small_regions_holes():
    mask = np.ones((20, 20), bool)
    mask[10, 10] = False           # 1-px hole → filled
    mask[0:5, 0:5] = False         # 25-px hole at corner → kept
    out, changed = native.remove_small_regions(mask, 10, "holes")
    assert changed
    assert out[10, 10] and not out[2, 2]


def test_native_nms_matches_host(rng):
    xy = rng.random((100, 2)) * 200
    wh = rng.random((100, 2)) * 50 + 1
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.random(100).astype(np.float32)
    ours = native.nms_native(boxes, scores, 0.5)
    ref = nms_host(boxes, scores, 0.5)
    np.testing.assert_array_equal(ours, ref)


def test_islands_keeps_largest_when_all_small():
    """amg.py:286-289: if every foreground region is below threshold,
    keep the largest instead of emptying the mask."""
    from revisit_anything_tpu.native import remove_small_regions
    m = np.zeros((20, 20), bool)
    m[2:5, 2:5] = True          # 9 px
    m[10:14, 10:14] = True      # 16 px — the largest
    out, changed = remove_small_regions(m, 50, "islands")
    assert changed
    assert out.sum() == 16 and out[10:14, 10:14].all()


def test_numpy_fallbacks_without_native_lib(monkeypatch):
    """The documented no-compiler path: scipy/numpy fallbacks must agree
    with the native library (incl. areas[0] == 0 on both)."""
    import revisit_anything_tpu.native as nat
    rng = np.random.default_rng(3)
    m = rng.random((30, 40)) > 0.6

    labels_n, areas_n = nat.connected_components(m)
    rle_n = nat.rle_encode(m)
    rsr_n = nat.remove_small_regions(m, 5, "islands")

    monkeypatch.setattr(nat, "_build_and_load", lambda: None)
    labels_f, areas_f = nat.connected_components(m)
    # label ids may differ; component structure and area multiset must not
    assert labels_n.astype(bool).sum() == labels_f.astype(bool).sum()
    assert sorted(areas_n[1:].tolist()) == sorted(areas_f[1:].tolist())
    assert areas_n[0] == areas_f[0] == 0
    assert nat.rle_encode(m) == rle_n
    np.testing.assert_array_equal(nat.remove_small_regions(m, 5,
                                                           "islands")[0],
                                  rsr_n[0])


def test_rle_encode_fallback_handles_uint8_255(monkeypatch):
    """The numpy fallback must treat ANY nonzero value as foreground
    like the native path — a uint8 mask of 255s once failed the ==1
    test (int8 overflow → -1) and decoded parity-inverted."""
    from revisit_anything_tpu import native

    monkeypatch.setattr(native, "_build_and_load", lambda: None)
    m = np.full((4, 6), 255, np.uint8)
    m[0, 0] = 0
    rle = native.rle_encode(m)
    assert rle["counts"][0] == 1                 # leading zero run
    back = native.rle_decode(rle)
    np.testing.assert_array_equal(back, m != 0)
