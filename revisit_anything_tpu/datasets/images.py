"""Dataset image listing (natural sort, reference conventions)."""

from __future__ import annotations

import os
from typing import List, Tuple

from revisit_anything_tpu.config import DatasetConfig
from revisit_anything_tpu.io.h5io import natsorted_keys

# used by training/data.py's GSV-Cities directory scan (NOT gt-indexed
# — a whitelist is safe there); the gt-indexed list_images below is
# deliberately unfiltered
IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".tif",
              ".tiff", ".webp", ".ppm")


def list_images(directory: str) -> List[str]:
    """Every regular file in the directory, natural-sorted — the
    reference enumerates with natsorted(os.listdir()) UNFILTERED
    (place_rec_SAM_DINO.py:114), and gt positives index that full
    listing. An extension whitelist here once silently dropped entries
    (e.g. .tif) and shifted every subsequent index against gt — a
    silently-wrong recall. A stray non-image file now fails loudly at
    load time, exactly like the reference's cv2.imread would."""
    names = [f for f in os.listdir(directory)
             if not os.path.isdir(os.path.join(directory, f))]
    return [os.path.join(directory, f) for f in natsorted_keys(names)]


def list_dataset_images(ds: DatasetConfig,
                        data_root: str) -> Tuple[List[str], List[str]]:
    """(reference_paths, query_paths) for a dataset, natural-sorted — the
    image enumeration every reference stage relies on."""
    ref_dir = os.path.join(data_root, ds.name, ds.data_subpath_ref)
    q_dir = os.path.join(data_root, ds.name, ds.data_subpath_query)
    return list_images(ref_dir), list_images(q_dir)
