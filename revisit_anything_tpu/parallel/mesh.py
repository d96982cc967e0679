"""Device-mesh helpers.

The reference has no distributed layer at all (SURVEY §2.7 — single CUDA
device, no NCCL/MPI). On TPU, scale-out is mesh-native: a 1-D "data" axis
for the embarrassingly-parallel per-image work (extraction, aggregation)
and an optional "model" axis for tensor-parallel training; XLA inserts the
collectives (psum/all_gather) from sharding annotations — no transport
code.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Create a mesh over all local devices. Default: 1-D data mesh."""
    devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh shape {shape} != #devices {len(devices)}")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def auto_data_mesh(min_devices: int = 2) -> Optional[Mesh]:
    """1-D data mesh over all local devices, or None on a single device.

    The production entry points (extract/evaluate/serve) call this to
    scale out automatically when run on a multi-chip host — the reference
    has no such layer at all (single CUDA device, SURVEY §2.7)."""
    devices = jax.devices()
    if len(devices) < min_devices:
        return None
    return Mesh(np.asarray(devices), ("data",))


def resolve_mesh(mesh) -> Optional[Mesh]:
    """Normalize a mesh argument: "auto" → auto_data_mesh(), None → None,
    Mesh → itself."""
    if mesh == "auto":
        return auto_data_mesh()
    return mesh


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) dim over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0,
                    value=0) -> Tuple[np.ndarray, int]:
    """Pad ``axis`` to a multiple (for even sharding); returns (padded, n_pad)."""
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=value), pad
