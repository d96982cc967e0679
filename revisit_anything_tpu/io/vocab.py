"""Vocabulary (cluster-center) loading.

The reference caches kmeans centers as torch-saved tensors at
cache/vocabulary/dinov2_vitg14/l31_value_c32/{id}/c_centers.pt
(vlad_c_centers_pt_gen.py:148-150). torch is a host-side I/O dependency
only — centers become numpy immediately; nothing torch touches the compute
path.
"""

from __future__ import annotations

import os

import numpy as np


def load_cluster_centers(path: str) -> np.ndarray:
    """Load a c_centers tensor (.pt via torch, or .npy/.npz) → float32 [C, D]."""
    if path.endswith((".npy",)):
        arr = np.load(path)
    elif path.endswith(".npz"):
        arr = np.load(path)["c_centers"]
    else:
        import torch  # local import: host-side IO only
        arr = torch.load(path, map_location="cpu",
                         weights_only=True).numpy()
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim != 2:
        raise ValueError(f"cluster centers must be 2-D, got {arr.shape}")
    return arr


def save_cluster_centers(path: str, centers: np.ndarray) -> None:
    """Save centers in the reference's .pt format (or .npy)."""
    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
    if path.endswith(".npy"):
        np.save(path, np.asarray(centers, dtype=np.float32))
    else:
        import torch
        torch.save(torch.from_numpy(np.asarray(centers, dtype=np.float32)),
                   path)
