"""NMS correctness: jax vs host cross-check, invariants, hand cases.

(torchvision is unavailable in this environment; the host and device
implementations are independent code paths and must agree exactly, plus
greedy-NMS invariants are asserted directly.)
"""

import numpy as np

from revisit_anything_tpu.ops.nms import box_iou_matrix, nms_host, nms_keep_mask


def random_boxes(rng, n=200, size=300):
    xy = rng.random((n, 2)) * size
    wh = rng.random((n, 2)) * 60 + 1
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def np_iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    area = lambda c: max(c[2] - c[0], 0) * max(c[3] - c[1], 0)
    union = area(a) + area(b) - inter
    return inter / union if union else 0.0


def test_jax_and_host_agree(rng):
    for n, thr in ((150, 0.3), (200, 0.5), (64, 0.7)):
        boxes = random_boxes(rng, n=n)
        scores = rng.random(n).astype(np.float32)
        ref = nms_host(boxes, scores, thr)
        keep = np.asarray(nms_keep_mask(boxes, scores, thr))
        np.testing.assert_array_equal(np.sort(ref), np.where(keep)[0])


def test_greedy_invariants(rng):
    boxes = random_boxes(rng, n=120)
    scores = rng.random(120).astype(np.float32)
    thr = 0.5
    keep = nms_host(boxes, scores, thr)
    kept = set(keep.tolist())
    # kept boxes pairwise IoU <= thr
    for i in keep:
        for j in keep:
            if i != j:
                assert np_iou(boxes[i], boxes[j]) <= thr + 1e-6
    # every suppressed box overlaps a higher-scored kept box
    for i in range(len(boxes)):
        if i in kept:
            continue
        assert any(np_iou(boxes[i], boxes[j]) > thr and scores[j] >= scores[i]
                   for j in keep)


def test_iou_matrix_matches_scalar(rng):
    boxes = random_boxes(rng, n=20)
    mat = np.asarray(box_iou_matrix(boxes))
    for i in range(20):
        for j in range(20):
            np.testing.assert_allclose(mat[i, j], np_iou(boxes[i], boxes[j]),
                                       atol=1e-5)


def test_jax_nms_masks_invalid_entries(rng):
    boxes = random_boxes(rng, n=50)
    scores = rng.random(50).astype(np.float32)
    scores[10:20] = -np.inf
    keep = np.asarray(nms_keep_mask(boxes, scores, 0.5))
    assert not keep[10:20].any()


def test_identical_boxes_keep_one():
    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (5, 1))
    scores = np.array([0.1, 0.9, 0.5, 0.3, 0.2], np.float32)
    keep = np.asarray(nms_keep_mask(boxes, scores, 0.5))
    assert keep.sum() == 1 and keep[1]
    assert list(nms_host(boxes, scores, 0.5)) == [1]


def test_disjoint_boxes_all_kept():
    boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 50, 50]],
                     np.float32)
    scores = np.array([0.5, 0.9, 0.1], np.float32)
    assert sorted(nms_host(boxes, scores, 0.5).tolist()) == [0, 1, 2]
    assert np.asarray(nms_keep_mask(boxes, scores, 0.5)).all()

def test_deep_suppression_chain():
    """Worst case for the Jacobi-sweep device NMS: a maximal suppression
    chain (box i overlaps only box i+1, scores descending) whose greedy
    result alternates keep/suppress — the fixpoint needs ~N/2 sweeps and
    must still be exact."""
    n = 101
    # unit-height boxes, each shifted by 0.4: IoU(i, i+1) ≈ 0.43 > 0.4,
    # IoU(i, i+2) ≈ 0.05 < 0.4
    boxes = np.stack([
        np.arange(n) * 0.4, np.zeros(n),
        np.arange(n) * 0.4 + 1.0, np.ones(n)], axis=1).astype(np.float32)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    keep = np.asarray(nms_keep_mask(boxes, scores, 0.4))
    host = nms_host(boxes, scores, 0.4)
    expect = np.zeros(n, bool)
    expect[host] = True
    np.testing.assert_array_equal(keep, expect)
    # greedy on a chain keeps every other box
    assert keep[0] and not keep[1] and keep[2]


def test_nms_host_never_keeps_padding_scores():
    from revisit_anything_tpu.ops.nms import nms_host
    boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 50, 50]],
                     np.float32)
    scores = np.array([1.0, -np.inf, 0.5], np.float32)
    keep = nms_host(boxes, scores, 0.5)
    assert 1 not in list(keep)
    assert list(keep) == [0, 2]
