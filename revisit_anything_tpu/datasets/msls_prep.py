"""MSLS raw-data preparation — the msls_data_clean equivalent.

The reference ships two-step filter scripts that reduce the raw MSLS val
dump to the evaluation subsets and verify the produced counts against
expectations (dataloaders/msls_data_clean/README.md:7-36: CPH 12556 db /
498 q, SF 6315 db / 242 q). Here the filter is driven directly by the
SALAD gt npy files: an image belongs to the subset iff it appears in the
(natsorted) per-city db/query name lists.
"""

from __future__ import annotations

import os
import shutil
from typing import List, Tuple

import numpy as np

EXPECTED_COUNTS = {"cph": (12556, 498), "sf": (6315, 242)}


def city_image_lists(gt_root: str, city: str) -> Tuple[List[str], List[str]]:
    """(db_names, query_names) for a city from the SALAD npy files, in the
    reference's natsorted order."""
    from revisit_anything_tpu.io.h5io import _natural_key
    db_images = np.load(os.path.join(gt_root, "msls_val_dbImages.npy"))
    q_idx = np.load(os.path.join(gt_root, "msls_val_qIdx.npy"))
    q_images = np.load(os.path.join(gt_root, "msls_val_qImages.npy"))[q_idx]
    from revisit_anything_tpu.datasets.gt import msls_city_of
    db = sorted((str(p) for p in db_images if msls_city_of(p) == city),
                key=_natural_key)
    q = sorted((str(p) for p in q_images if msls_city_of(p) == city),
               key=_natural_key)
    return db, q


def filter_city_images(gt_root: str, city: str, raw_root: str,
                       out_root: str, copy: bool = True
                       ) -> Tuple[int, int]:
    """Materialize the evaluation subset (database/ + query/ dirs) from a
    raw MSLS dump; returns (n_db, n_q) copied."""
    db, q = city_image_lists(gt_root, city)
    counts = []
    for sub, names in (("database", db), ("query", q)):
        out_dir = os.path.join(out_root, sub)
        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for name in names:
            src = os.path.join(raw_root, os.path.basename(name))
            if not os.path.exists(src):
                src = os.path.join(raw_root, name)
            if os.path.exists(src):
                if copy:
                    shutil.copy2(src, os.path.join(
                        out_dir, os.path.basename(name)))
                n += 1
        counts.append(n)
    return counts[0], counts[1]


def verify_counts(city: str, n_db: int, n_q: int,
                  strict: bool = False) -> bool:
    """Count verification like the reference's clean scripts (printed
    match/mismatch; strict=True raises)."""
    exp_db, exp_q = EXPECTED_COUNTS[city]
    ok = (n_db, n_q) == (exp_db, exp_q)
    status = "MATCH" if ok else "MISMATCH"
    print(f"[msls:{city}] db {n_db}/{exp_db} q {n_q}/{exp_q} -> {status}")
    if strict and not ok:
        raise ValueError(
            f"msls {city} counts {n_db}/{n_q} != expected {exp_db}/{exp_q}")
    return ok
