"""Segment-VLAD aggregation stage: artifacts → per-segment descriptors.

The TPU re-design of the reference's per-image loop
(place_rec_main.py:244-342 + seg_vlad_gpu_single): masks are padded to
shape buckets so the fused VLAD kernel compiles once per bucket, not per
image; Delaunay adjacency stays on the host (tiny input, bit-compatible
Qhull); descriptors stream out as one [n_segments, C*D] bank.
"""

from __future__ import annotations

import bisect
import dataclasses
from typing import List, Sequence, Tuple

import h5py
import numpy as np

import jax.numpy as jnp

from revisit_anything_tpu.io.h5io import read_all_masks_bool, read_dino_features
from revisit_anything_tpu.ops.adjacency import delaunay_adjacency
from revisit_anything_tpu.ops.masks import (mask_centroids, mask_pool_matrices,
                                            pool_masks_to_patch_grid)
from revisit_anything_tpu.ops.vlad import l2_normalize, segment_vlad
from revisit_anything_tpu.utils.profiling import stage_timer

# Mask-count buckets: per-image segment counts are ragged (a few to a few
# hundred); padding to the next bucket bounds recompiles to len(BUCKETS).
MASK_BUCKETS = (8, 16, 32, 64, 96, 128, 192, 256, 384, 512)


def _bucket(n: int) -> int:
    n = max(n, 1)
    if n > MASK_BUCKETS[-1]:
        # beyond the largest bucket: round up to a multiple of 128 so huge
        # mask sets (reference artifacts have no 512 cap) still aggregate
        return -(-n // 128) * 128
    return MASK_BUCKETS[bisect.bisect_left(MASK_BUCKETS, n)]


@dataclasses.dataclass
class SegmentBank:
    """Flat segment-descriptor table over a whole image set."""
    descriptors: np.ndarray           # [n_segments, dim]
    image_indices: np.ndarray         # [n_segments] image id per segment
    # explicit image count: trailing images with zero segments never
    # appear in image_indices, and deriving the count from max()+1 would
    # silently drop them (their recall rows must exist as misses)
    num_images: int = None

    @property
    def seg_ranges(self) -> List[np.ndarray]:
        derived = int(self.image_indices.max()) + 1 if len(
            self.image_indices) else 0
        n_img = self.num_images if self.num_images is not None else derived
        return [np.where(self.image_indices == i)[0] for i in range(n_img)]


def image_segment_vlad(masks: np.ndarray,
                       feats: np.ndarray,
                       centers: np.ndarray,
                       pool_a: np.ndarray,
                       pool_b: np.ndarray,
                       order: int,
                       num_clusters: int = None) -> np.ndarray:
    """Segment VLADs for one image; pads the mask count to a bucket so the
    jitted kernel re-compiles only per bucket.

    Args:
      masks: [M, h, w] bool stored-resolution masks.
      feats: [D, dh, dw] L2-normalized dense features (h5 layout).
      centers: [C, D] cluster centers.
      pool_a/pool_b: pooling matrices from mask_pool_matrices.
      order: SuperSegment order (0 → no adjacency).
    """
    num_clusters = num_clusters or centers.shape[0]
    m = len(masks)
    if m == 0:
        return np.zeros((0, num_clusters * feats.shape[0]), np.float32)
    mb = _bucket(m)

    padded = np.zeros((mb,) + masks.shape[1:], bool)
    padded[:m] = masks
    patch_masks = pool_masks_to_patch_grid(jnp.asarray(padded),
                                           jnp.asarray(pool_a),
                                           jnp.asarray(pool_b))

    adj = None
    if order:
        a = delaunay_adjacency(mask_centroids(masks), order)
        ap = np.zeros((mb, mb), bool)
        ap[:m, :m] = a
        adj = jnp.asarray(ap)

    d, dh, dw = feats.shape
    # L2-normalize over channels like the reference does on EVERY load
    # (func_vpr.py:1085) — the main dino h5s store normalized features
    # (idempotent) but the dinoNV finetuned h5s store raw ones.
    desc = l2_normalize(jnp.asarray(feats.reshape(d, dh * dw).T), axis=1)
    vlads = segment_vlad(desc, jnp.asarray(centers), patch_masks, adj,
                         num_clusters=num_clusters)
    return np.asarray(vlads[:m])


def compute_segment_vlads(masks_h5_path: str,
                          dino_h5_path: str,
                          image_keys: Sequence[str],
                          centers: np.ndarray,
                          order: int,
                          mask_hw: Tuple[int, int],
                          desired_hw: Tuple[int, int],
                          num_clusters: int = None,
                          progress: bool = True) -> SegmentBank:
    """The reference's per-image SegLoc loop (place_rec_main.py:244-342).
    num_clusters defaults to the vocabulary size."""
    num_clusters = num_clusters or centers.shape[0]
    timer = stage_timer()
    pool_a, pool_b = mask_pool_matrices(mask_hw, desired_hw)
    descs, im_inds = [], []
    with h5py.File(masks_h5_path, "r") as mh5, \
            h5py.File(dino_h5_path, "r") as dh5:
        for i, key in enumerate(image_keys):
            with timer.stage("agg.read"):
                masks = read_all_masks_bool(mh5, key)
                feats = read_dino_features(dh5, key)[0]   # [D, dh, dw]
            with timer.stage("agg.vlad"):
                v = image_segment_vlad(masks, feats, centers,
                                       pool_a, pool_b, order,
                                       num_clusters)
            descs.append(v)
            im_inds.extend([i] * len(v))
            if progress and (i + 1) % 50 == 0:
                print(f"[segvlad] {i + 1}/{len(image_keys)}", flush=True)
    if not descs:
        return SegmentBank(np.zeros((0, 0), np.float32),
                           np.zeros((0,), np.int64),
                           num_images=len(image_keys))
    return SegmentBank(np.concatenate(descs).astype(np.float32),
                       np.asarray(im_inds, dtype=np.int64),
                       num_images=len(image_keys))


def global_vlads_from_h5(dino_h5_path: str,
                         image_keys: Sequence[str],
                         centers: np.ndarray,
                         desired_hw: Tuple[int, int] = None,
                         num_clusters: int = None) -> np.ndarray:
    """AnyLoc whole-image VLADs (func_vpr.py aggFt :949-956, aggType
    'vlad', segment=False): the reference aggregates the RAW [dh·dw]
    patch grid — its upsample call in this branch is commented out
    (func_vpr.py:950-951) — so no interpolation happens here either.
    ``desired_hw`` is accepted and ignored for call-site compatibility.
    """
    from revisit_anything_tpu.ops.vlad import global_vlad

    num_clusters = num_clusters or centers.shape[0]
    out = []
    with h5py.File(dino_h5_path, "r") as f:
        for key in image_keys:
            feats = read_dino_features(f, key)[0]        # [D, dh, dw]
            d = feats.shape[0]
            desc = l2_normalize(
                jnp.asarray(feats.reshape(d, -1).T), axis=1)
            out.append(np.asarray(
                global_vlad(desc, jnp.asarray(centers), num_clusters)))
    return np.stack(out)
