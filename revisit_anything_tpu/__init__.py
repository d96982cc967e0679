"""revisit_anything_tpu — a TPU-native SegVLAD / visual place recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
AnyLoc / Revisit-Anything (SegVLAD, ECCV 2024) reference pipeline:

- SAM ViT-H automatic mask generation and DINOv2 dense patch featurization
  as batched, statically-shaped XLA/Pallas inference graphs
  (see ``revisit_anything_tpu.models``).
- Segment-descriptor aggregation — mask→patch pooling, order-K SuperSegment
  expansion over a Delaunay adjacency graph, hard-assign VLAD against cached
  cluster centers, PCA projection — as fused TPU kernels
  (see ``revisit_anything_tpu.ops``).
- FAISS-free retrieval: on-TPU inner-product kNN + similarity-weighted
  Borda counting over database-image bins
  (see ``revisit_anything_tpu.retrieval``), shardable over a device mesh
  (see ``revisit_anything_tpu.parallel``).
- Artifact I/O bit-compatible with the reference's HDF5/pt/pkl layout
  (see ``revisit_anything_tpu.io``).

The package is functionally organized: model parameters are plain pytrees,
forward passes are pure functions, and everything on the compute path is
jit-compatible with static shapes.
"""

__version__ = "0.1.0"

import os as _os

if not _os.environ.get("RAT_NO_COMPILE_CACHE"):
    # XLA compiles are expensive in the target environment; persist compiled
    # executables across processes. Opt out with RAT_NO_COMPILE_CACHE=1.
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ.get("RAT_COMPILE_CACHE_DIR",
                                       _os.path.expanduser("~/.jax_cache")))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from revisit_anything_tpu import config  # noqa: F401
