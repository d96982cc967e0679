"""Dataset image listing (natural sort, reference conventions)."""

from __future__ import annotations

import os
from typing import List, Tuple

from revisit_anything_tpu.config import DatasetConfig
from revisit_anything_tpu.io.h5io import natsorted_keys

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".tif",
              ".tiff", ".webp", ".ppm")


def list_images(directory: str) -> List[str]:
    names = [f for f in os.listdir(directory)
             if f.lower().endswith(IMAGE_EXTS)]
    return [os.path.join(directory, f) for f in natsorted_keys(names)]


def list_dataset_images(ds: DatasetConfig,
                        data_root: str) -> Tuple[List[str], List[str]]:
    """(reference_paths, query_paths) for a dataset, natural-sorted — the
    image enumeration every reference stage relies on."""
    ref_dir = os.path.join(data_root, ds.name, ds.data_subpath_ref)
    q_dir = os.path.join(data_root, ds.name, ds.data_subpath_query)
    return list_images(ref_dir), list_images(q_dir)
