"""Analysis utilities tests."""

import numpy as np

from revisit_anything_tpu.retrieval.analysis import (
    calc_margins, create_triplets, get_validation_recalls, match_grid,
    seg_area_covered)


def test_create_triplets():
    preds = [[3, 1, 2], [0, 4, 5], [9, 9, 9]]
    gt = [[1], [0], []]
    t = create_triplets(preds, gt)
    # q0: neg=3 (top wrong), pos=1 (first hit); q1: pos=0 hit first, neg=4
    assert t == [(0, 1, 3), (1, 0, 4)]


def test_calc_margins(rng):
    db = rng.standard_normal((6, 8)).astype(np.float32)
    q = db[[2, 4]] + 0.01
    triplets = [(0, 2, 3), (1, 4, 0)]
    m = calc_margins(q, db, triplets)
    assert (m > 0).all()    # positives are near-copies → positive margins


def test_seg_area_covered():
    masks = np.zeros((2, 10, 10), bool)
    masks[0, :5] = True
    masks[1, :, :5] = True
    assert abs(seg_area_covered(masks) - 0.75) < 1e-9
    assert seg_area_covered(np.zeros((0, 4, 4), bool)) == 0.0


def test_validation_recalls(rng):
    db = rng.standard_normal((50, 16)).astype(np.float32)
    q = db[[3, 7, 11]] + 0.001
    gt = [[3], [7], [999]]  # third gt unreachable
    r = get_validation_recalls(db, q, gt, k_values=(1, 5),
                               print_results=False)
    assert r[1] >= 2 / 3 - 1e-9
    assert r[5] >= r[1]


def test_match_grid(rng):
    q = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
    preds = [rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
             for _ in range(3)]
    grid = match_grid(q, preds, [True, False, True])
    assert grid.dtype == np.uint8
    assert grid.shape[1] == 4 * (40 + 8)
