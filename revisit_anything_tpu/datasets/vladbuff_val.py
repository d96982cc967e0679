"""VLAD-BuFF benchmark validation/eval datasets.

The reference evaluates global descriptors on 10+ benchmark sets whose
image lists (and, where applicable, ground truth) ship as npy files under
VLAD-BuFF/datasets/ and are loaded by per-dataset classes in
VLAD-BuFF/dataloaders/val/*.py. All follow one of three gt patterns:

- "npy":  a pickled object array of positive db indices per query
  (Nordland, SPED, Pittsburgh variants);
- "utm":  db/query UTM coordinates parsed from the image filename
  ("...@east@north@...") with a radius NearestNeighbors query
  (AmsterTime, StLucia, Tokyo247, Sfsm — val/*Dataset.py:42-69);
- "msls": qIdx/pIdx npy pairs (MapillaryDataset);
- "none": held-out test sets without public gt (msls_test).

``load_vladbuff_val`` reproduces those loaders generically; the gt_root
defaults to the reference's shipped npy directory when mounted.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np

DEFAULT_GT_ROOT = "/root/reference/VLAD-BuFF/datasets"

# name → (subdir, db stem, q stem, gt mode[, radius])
REGISTRY = {
    "nordland": ("Nordland", "Nordland_dbImages.npy",
                 "Nordland_qImages.npy", ("npy", "Nordland_gt.npy")),
    "sped": ("SPED", "SPED_dbImages.npy", "SPED_qImages.npy",
             ("npy", "SPED_gt.npy")),
    "pitts30k_val": ("Pittsburgh", "pitts30k_val_dbImages.npy",
                     "pitts30k_val_qImages.npy",
                     ("npy", "pitts30k_val_gt.npy")),
    "pitts30k_test": ("Pittsburgh", "pitts30k_test_dbImages.npy",
                      "pitts30k_test_qImages.npy",
                      ("npy", "pitts30k_test_gt.npy")),
    "pitts250k_test": ("Pittsburgh", "pitts250k_test_dbImages.npy",
                       "pitts250k_test_qImages.npy",
                       ("npy", "pitts250k_test_gt.npy")),
    "amstertime": ("amstertime", "amstertime_dbImages.npy",
                   "amstertime_qImages.npy", ("utm", 25.0)),
    "st_lucia": ("st_lucia", "st_lucia_dbImages.npy",
                 "st_lucia_qImages.npy", ("utm", 25.0)),
    "tokyo247": ("tokyo247", "tokyo247_dbImages.npy",
                 "tokyo247_qImages.npy", ("utm", 25.0)),
    "sfsm": ("sfsm", "sfsm_dbImages.npy", "sfsm_qImages.npy",
             ("utm", 25.0)),
    "msls_test": ("msls_test", "msls_test_dbImages.npy",
                  "msls_test_qImages.npy", ("none",)),
}


@dataclasses.dataclass
class VladBuffValSet:
    name: str
    db_images: List[str]            # image paths relative to dataset root
    q_images: List[str]
    ground_truth: Optional[List[np.ndarray]]   # positives per query

    @property
    def num_references(self) -> int:
        return len(self.db_images)

    @property
    def num_queries(self) -> int:
        return len(self.q_images)

    @property
    def images(self) -> List[str]:
        """References then queries — the eval.py descriptor order."""
        return list(self.db_images) + list(self.q_images)


def load_vladbuff_val(name: str,
                      gt_root: Optional[str] = None) -> VladBuffValSet:
    """Load one benchmark set's image lists + ground truth."""
    if name not in REGISTRY:
        raise KeyError(f"unknown benchmark {name!r}; known: "
                       f"{sorted(REGISTRY)}")
    gt_root = gt_root or DEFAULT_GT_ROOT
    subdir, db_npy, q_npy, gt_spec = REGISTRY[name]
    base = os.path.join(gt_root, subdir)
    db = [str(s) for s in np.load(os.path.join(base, db_npy),
                                  allow_pickle=True)]
    q = [str(s) for s in np.load(os.path.join(base, q_npy),
                                 allow_pickle=True)]

    from revisit_anything_tpu.datasets.gt import (radius_positives,
                                                  utm_from_paths)
    mode = gt_spec[0]
    if mode == "npy":
        gt_path = os.path.join(base, gt_spec[1])
        if not os.path.exists(gt_path):
            raise FileNotFoundError(
                f"{name} ground truth not found: {gt_path} — download the "
                "VLAD-BuFF gt npys (its README) into the gt root; only "
                "'none'-mode sets are genuinely gt-less")
        gt = list(np.load(gt_path, allow_pickle=True))
    elif mode == "utm":
        gt = radius_positives(utm_from_paths(db), utm_from_paths(q),
                              gt_spec[1])
    elif mode == "none":
        gt = None
    else:
        raise ValueError(mode)
    return VladBuffValSet(name, db, q, gt)


def load_msls_val(gt_root: Optional[str] = None,
                  npy_dir: str = "msls_val") -> VladBuffValSet:
    """MSLS val via the SALAD qIdx/pIdx npys (MapillaryDataset.py):
    qImages + per-query positive db indices."""
    gt_root = gt_root or DEFAULT_GT_ROOT
    base = os.path.join(gt_root, npy_dir)
    q = [str(s) for s in np.load(os.path.join(base, "msls_val_qImages.npy"),
                                 allow_pickle=True)]
    q_idx = np.load(os.path.join(base, "msls_val_qIdx.npy"))
    p_idx = np.load(os.path.join(base, "msls_val_pIdx.npy"),
                    allow_pickle=True)
    db_path = os.path.join(base, "msls_val_dbImages.npy")
    if not os.path.exists(db_path):
        raise FileNotFoundError(
            f"msls_val database list not found: {db_path} — the shipped "
            "reference directory has only qIdx/pIdx/qImages; download "
            "msls_val_dbImages.npy (gt indices are db positions)")
    db = [str(s) for s in np.load(db_path, allow_pickle=True)]
    queries = [q[i] for i in q_idx]
    gt = [np.asarray(p, dtype=np.int64) for p in p_idx]
    return VladBuffValSet("msls_val", db, queries, gt)
