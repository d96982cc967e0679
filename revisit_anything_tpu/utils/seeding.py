"""Determinism helpers.

The reference seeds numpy/torch/cudnn on module import (utilities.py:505-519,
:1011). In JAX randomness is explicit (jax.random keys), so only host-side
numpy/python RNGs need seeding; device compute is deterministic by default.
"""

from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int = 42) -> np.random.Generator:
    """Seed python and numpy global RNGs; return a fresh numpy Generator."""
    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed)
