"""Analysis utilities: triplets, margins, segment coverage, eval harness.

Mirrors the reference's analysis functions (func_vpr.py:1553-1645:
create_triplets / calc_margins / calc_margins_global / segAreaCovered) and
the VLAD-BuFF validation harness (utils/validation.py get_validation_recalls,
eval.py multi-dataset loop) with the FAISS search replaced by the on-TPU
kNN.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from revisit_anything_tpu.ops.knn import knn_l2


def create_triplets(preds: Sequence[Sequence[int]],
                    gt: Sequence[Sequence[int]]
                    ) -> List[Tuple[int, int, int]]:
    """(query, positive, hardest-negative) triplets from predictions
    (func_vpr.py:1553-1570): the negative is the top-ranked WRONG
    prediction; the positive is the first gt hit in the prediction list
    (or the first gt entry when never hit)."""
    triplets = []
    for q, (pred_q, gt_q) in enumerate(zip(preds, gt)):
        if len(gt_q) == 0:
            continue
        gt_set = set(int(g) for g in gt_q)
        neg = next((int(p) for p in pred_q if int(p) not in gt_set), None)
        pos = next((int(p) for p in pred_q if int(p) in gt_set),
                   int(gt_q[0]))
        if neg is not None:
            triplets.append((q, pos, neg))
    return triplets


def calc_margins(query_desc: np.ndarray, db_desc: np.ndarray,
                 triplets: Sequence[Tuple[int, int, int]]) -> np.ndarray:
    """Per-triplet SIMILARITY margin sim(q, pos) − sim(q, neg) — the
    whole-image analogue is calc_margins_global (func_vpr.py:1610-1629:
    ``imFt_r_pos @ imFt_query − imFt_r_neg @ imFt_query``). Reported as
    inner products, not L2 distances: for unit-norm descriptors
    d = sqrt(2−2·sim) is a NONLINEAR transform, so distance margins
    would have a systematically different distribution than reference
    margin histograms."""
    margins = []
    for q, pos, neg in triplets:
        sp = float(np.dot(query_desc[q], db_desc[pos]))
        sn = float(np.dot(query_desc[q], db_desc[neg]))
        margins.append(sp - sn)
    return np.asarray(margins)


def seg_area_covered(masks: np.ndarray) -> list:
    """PER-MASK covered-area fractions (func_vpr.py segAreaCovered
    :1631-1645 — the reference reports each mask's own area / image area
    as a flat list, not a union coverage)."""
    return [float(np.asarray(m).mean()) for m in masks]


def get_validation_recalls(db_desc: np.ndarray,
                           query_desc: np.ndarray,
                           gt: Sequence[Sequence[int]],
                           k_values: Sequence[int] = (1, 5, 10, 15, 20, 25),
                           dataset_name: str = "",
                           print_results: bool = True
                           ) -> Dict[int, float]:
    """VLAD-BuFF validation recalls (utils/validation.py:7-58): top-k
    search over whole-image descriptors, Recall@k for each k."""
    kmax = max(k_values)
    _, idx = knn_l2(jnp.asarray(query_desc, jnp.float32),
                    jnp.asarray(db_desc, jnp.float32), min(kmax, len(db_desc)))
    idx = np.asarray(idx)
    correct = np.zeros(len(k_values))
    for qi, gt_q in enumerate(gt[:len(idx)]):
        # empty-gt queries stay in the denominator as misses — the
        # reference divides by len(predictions) (validation.py:48)
        gt_set = set(int(g) for g in gt_q)
        hits = [int(p) in gt_set for p in idx[qi]]
        for ki, k in enumerate(k_values):
            if any(hits[:k]):
                correct[ki] += 1
    recalls = {k: float(c) / max(len(idx), 1)
               for k, c in zip(k_values, correct)}
    if print_results:
        row = " | ".join(f"R@{k}: {v * 100:.2f}" for k, v in recalls.items())
        print(f"[{dataset_name}] {row}")
    return recalls


def match_grid(query_image: np.ndarray,
               pred_images: Sequence[np.ndarray],
               correct: Sequence[bool],
               border: int = 4) -> np.ndarray:
    """Qualitative match strip (predictions.py-style): query followed by
    predictions, green/red borders for correct/incorrect. Returns an RGB
    uint8 image."""
    def with_border(img, color):
        out = np.full((img.shape[0] + 2 * border,
                       img.shape[1] + 2 * border, 3), color, np.uint8)
        out[border:-border, border:-border] = img
        return out

    h = min(im.shape[0] for im in [query_image, *pred_images])
    def fit(im):
        if im.shape[0] != h:
            import cv2
            w = int(im.shape[1] * h / im.shape[0])
            im = cv2.resize(im, (w, h))
        return im

    panels = [with_border(fit(query_image), (255, 255, 0))]
    for im, ok in zip(pred_images, correct):
        panels.append(with_border(fit(im),
                                  (0, 200, 0) if ok else (220, 0, 0)))
    hmax = max(p.shape[0] for p in panels)
    padded = [np.pad(p, ((0, hmax - p.shape[0]), (0, 0), (0, 0)))
              for p in panels]
    return np.concatenate(padded, axis=1)


def compare_method_predictions(preds_baseline, preds_method, gt):
    """Per-query top-1 comparison of two rank-fusion/model variants — the
    quantitative core of VLAD-BuFF/predictions.py:120-231: which queries
    the candidate method corrects vs breaks relative to a baseline.

    Returns a list of dict rows (QueryIndex, BaselineCorrect,
    MethodCorrect, CorrectedByYourMethod, BrokenByYourMethod).
    """
    rows = []
    for qi, gt_q in enumerate(gt):
        if len(gt_q) == 0:
            continue
        gt_set = set(int(g) for g in gt_q)
        b_ok = int(preds_baseline[qi][0]) in gt_set
        m_ok = int(preds_method[qi][0]) in gt_set
        rows.append({
            "QueryIndex": qi,
            "BaselineCorrect": b_ok,
            "MethodCorrect": m_ok,
            "CorrectedByYourMethod": (not b_ok) and m_ok,
            "BrokenByYourMethod": b_ok and (not m_ok),
        })
    return rows


def save_prediction_analysis(rows, query_paths, db_paths, preds_baseline,
                             preds_method, out_dir,
                             baseline_name="baseline",
                             method_name="method",
                             max_images: int = 50):
    """Write the predictions.py artifact set (:232-313): an analysis CSV
    plus 3-panel (query | baseline top-1 | method top-1) grids under
    correct/ and incorrect/ — green border on the winning method's panel.
    Returns (csv_path, n_grids)."""
    import csv as csvmod
    import os

    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "prediction_analysis.csv")
    with open(csv_path, "w", newline="") as f:
        wr = csvmod.DictWriter(f, fieldnames=list(rows[0].keys()) if rows
                               else ["QueryIndex"])
        wr.writeheader()
        wr.writerows(rows)

    n_grids = 0
    for sub in ("correct", "incorrect"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    for row in rows:
        if not (row["CorrectedByYourMethod"] or row["BrokenByYourMethod"]):
            continue
        if n_grids >= max_images:
            break
        qi = row["QueryIndex"]
        corrected = row["CorrectedByYourMethod"]
        q_img = np.asarray(Image.open(query_paths[qi]).convert("RGB"))
        b_img = np.asarray(Image.open(
            db_paths[int(preds_baseline[qi][0])]).convert("RGB"))
        m_img = np.asarray(Image.open(
            db_paths[int(preds_method[qi][0])]).convert("RGB"))
        grid = match_grid(q_img, [b_img, m_img],
                          [not corrected, corrected])
        sub = "correct" if corrected else "incorrect"
        name = (f"{baseline_name}_vs_{method_name}_"
                f"{'corrected' if corrected else 'broken'}_q{qi}.png")
        Image.fromarray(grid).save(os.path.join(out_dir, sub, name))
        n_grids += 1
    return csv_path, n_grids
