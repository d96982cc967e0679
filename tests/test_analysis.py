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
    """Reference semantics: PER-MASK fractions (func_vpr.py:1631-1645),
    not a union coverage."""
    masks = np.zeros((2, 10, 10), bool)
    masks[0, :5] = True
    masks[1, :, :5] = True
    assert seg_area_covered(masks) == [0.5, 0.5]
    assert seg_area_covered(np.zeros((0, 4, 4), bool)) == []


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


def test_prediction_comparison_and_grids(tmp_path, rng):
    """predictions.py equivalent: corrected/broken bookkeeping + CSV +
    3-panel grids (VLAD-BuFF/predictions.py:120-313)."""
    import os

    from PIL import Image

    from revisit_anything_tpu.retrieval.analysis import (
        compare_method_predictions, save_prediction_analysis)

    gt = [[0], [1], [2], []]
    preds_base = [np.array([0]), np.array([5]), np.array([2]),
                  np.array([0])]
    preds_new = [np.array([0]), np.array([1]), np.array([4]),
                 np.array([0])]
    rows = compare_method_predictions(preds_base, preds_new, gt)
    assert len(rows) == 3                     # empty-gt query skipped
    assert rows[1]["CorrectedByYourMethod"] and not rows[1]["BrokenByYourMethod"]
    assert rows[2]["BrokenByYourMethod"]
    assert not rows[0]["CorrectedByYourMethod"]

    qdir, ddir = tmp_path / "q", tmp_path / "db"
    qdir.mkdir(); ddir.mkdir()
    qp, dp = [], []
    for i in range(4):
        p = str(qdir / f"q{i}.png")
        Image.fromarray(rng.integers(0, 255, (32, 48, 3),
                                     dtype=np.uint8)).save(p)
        qp.append(p)
    for i in range(6):
        p = str(ddir / f"d{i}.png")
        Image.fromarray(rng.integers(0, 255, (32, 48, 3),
                                     dtype=np.uint8)).save(p)
        dp.append(p)
    out = str(tmp_path / "analysis")
    csv_path, n = save_prediction_analysis(rows, qp, dp, preds_base,
                                           preds_new, out)
    assert os.path.exists(csv_path) and n == 2
    assert len(os.listdir(os.path.join(out, "correct"))) == 1
    assert len(os.listdir(os.path.join(out, "incorrect"))) == 1


def test_map_counts_empty_gt_queries_in_denominator():
    """Reference calculate_map averages AP over ALL queries, including
    empty-gt ones (func_vpr.py:391-392)."""
    from revisit_anything_tpu.retrieval.recall import calculate_map
    preds = [[0], [1], [2], [3]]
    gt = [[0], [1], [], []]          # two perfect hits, two empty-gt
    assert calculate_map(preds, gt) == 0.5
