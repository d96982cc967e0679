"""Online serving: raw query image → top-k database images.

The offline pipeline (pipeline/extract.py → aggregate.py → evaluate.py)
round-trips artifacts through the host between stages — right for batch
evaluation, wrong for serving single queries over a narrow host↔device
transport. This server keeps the whole query on device:

- ONE uint8 image upload per query (~0.5-1 MB); SAM's half-res resize +
  1024-frame resize + normalization AND DINO's crop/normalize both run on
  device from that single upload (the resizes compose into one exact
  per-axis bilinear matrix — ops/resize.py);
- masks never leave the device: AMG filtering/NMS/top-K selection keeps the
  winning masks resident, and only their centroids (a few KB) come back to
  the host for the Qhull Delaunay adjacency (bit-compatible with the
  reference, ops/adjacency.py);
- the retrieval tail (mask→patch pooling, segment VLAD, PCA, kNN, weighted
  Borda) is the fused single-dispatch pipeline/query.py kernel.

Per query that is: one ~1 MB upload, TWO program dispatches (the fused
pre-Delaunay front `_query_front_fused` and the fused retrieval tail),
two tiny syncs (centroids, top-k ids), and a ~16 KB adjacency upload.
Everything else pipelines asynchronously; ``query_many`` overlaps the
host phases of in-flight queries (measured ≥98% of the device-compute
ceiling).

The device work is shape-static at ``max_masks`` rows regardless of how
many masks survive (padding rows are all-false and vote zero), so latency
is data-independent and there is exactly one compiled program.

Reference behavior covered: place_rec_SAM_DINO.py extraction semantics
(SAM at half res, DINO at full res), place_rec_main.py:186-375 per-query
path, with identical math.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from revisit_anything_tpu.config import (BORDA_TOPK, KNN_TOPK,
                                         RECALL_TOPK)
from revisit_anything_tpu.models import dinov2 as dn
from revisit_anything_tpu.models.sam.amg import (AmgConfig, _decode_batch,
                                                 build_point_grid,
                                                 resize_longest_side)
from revisit_anything_tpu.models.sam.config import (SAM_PIXEL_MEAN,
                                                    SAM_PIXEL_STD,
                                                    SamArchConfig)
from revisit_anything_tpu.models.sam.encoder import encode_image
from revisit_anything_tpu.models.sam.prompt import dense_positional_embedding
from revisit_anything_tpu.ops.adjacency import delaunay_adjacency
from revisit_anything_tpu.ops.masks import mask_pool_matrices
from revisit_anything_tpu.ops.nms import nms_keep_mask
from revisit_anything_tpu.ops.resize import bilinear_weight_matrix
from revisit_anything_tpu.pipeline.query import (query_segment_rows,
                                                 query_topk_images)

# huge-norm guard rows can never surface in the kNN
# (score = q·d − ||d||²/2); used for capacity padding, shard padding and
# removed entries alike. Single definition shared with the fused query's
# guard detection (sims < -4 cutoff).
from revisit_anything_tpu.pipeline.query import DB_GUARD as _GUARD


@jax.jit
def _db_sq_norms(db):
    """[Nd] f32 squared row norms, recomputed once per database swap and
    fed to query_topk_images(db_norms=...): the in-program per-query
    recompute was a full extra database read (round-5 tail probe).
    Guard rows square to inf — the same -inf-score exclusion the
    in-program form produced. Sharded dbs yield matching row-sharded
    norms (elementwise + lane reduce)."""
    dbf = db.astype(jnp.float32)
    return jnp.sum(dbf * dbf, axis=1)


# NOT donated: concurrent query threads may still hold the previous
# database array (query_many pipelines); donation would delete it under
# them. An insert therefore copies the db once on device (~1 ms for a
# 1M-row f32 db) and in-flight queries keep answering from the
# pre-insert snapshot — inserts are rare next to queries.
@jax.jit
def _db_insert(db, db_ids, rows, cursor, image_id):
    """Write one image's segment rows into the capacity-padded database
    at ``cursor``. Guard rows in ``rows`` keep their (unused) image id:
    they can never be retrieved."""
    db = jax.lax.dynamic_update_slice(db, rows.astype(db.dtype),
                                      (cursor, 0))
    ids = jnp.full((rows.shape[0],), image_id, db_ids.dtype)
    db_ids = jax.lax.dynamic_update_slice(db_ids, ids, (cursor,))
    return db, db_ids


@jax.jit
def _compact_insert_many(db, db_ids, rows, n_kept, image_ids, cursor):
    """Batched insert: compact a chunk of images' static row blocks and
    write them with ONE database copy.

    ``rows`` [B, kmax, dim] — per image, kept rows first then guards;
    ``n_kept`` [B] int32; ``image_ids`` [B] int32. Output row j of the
    stacked block belongs to image i with within-image index k = j −
    offset_i (exclusive cumsum); rows past the compacted total are guard
    rows (overwritten by the next insert, exactly like the single-insert
    guard tail). One dynamic_update_slice per (db, ids) — the database is
    copied ONCE per call instead of once per image (the per-image copy
    made bulk re-indexing O(images × db_bytes), round-3 verdict item 6).
    """
    b, kmax, dim = rows.shape
    cum = jnp.cumsum(n_kept)
    off = cum - n_kept                           # exclusive cumsum
    j = jnp.arange(b * kmax, dtype=jnp.int32)
    i = jnp.searchsorted(cum.astype(jnp.int32), j, side="right")
    i_c = jnp.minimum(i, b - 1).astype(jnp.int32)
    k = j - off[i_c].astype(jnp.int32)
    valid = (i < b) & (k < n_kept[i_c])
    flat = i_c * kmax + jnp.where(valid, k, 0)
    stacked = jnp.take(rows.reshape(b * kmax, dim), flat, axis=0)
    stacked = jnp.where(valid[:, None],
                        stacked, jnp.asarray(_GUARD, rows.dtype))
    ids = jnp.where(valid, image_ids[i_c], image_ids[0]).astype(
        db_ids.dtype)
    db = jax.lax.dynamic_update_slice(db, stacked.astype(db.dtype),
                                      (cursor, 0))
    db_ids = jax.lax.dynamic_update_slice(db_ids, ids, (cursor,))
    return db, db_ids


@jax.jit
def _db_remove(db, db_ids, image_id):
    """Turn an image's rows into guard rows (its votes drop to zero)."""
    kill = db_ids == image_id
    return jnp.where(kill[:, None], jnp.asarray(_GUARD, db.dtype), db)


@partial(jax.jit, static_argnames=("cfg", "pad_to"))
def _sam_preprocess_fused(img_u8: jnp.ndarray, rh: jnp.ndarray,
                          rw: jnp.ndarray, cfg: SamArchConfig,
                          pad_to: int) -> jnp.ndarray:
    """uint8 [H, W, 3] → [1, S, S, 3] normalized SAM input in one jit.

    ``rh``/``rw`` are the PRE-COMPOSED per-axis bilinear matrices mapping
    original rows/cols directly to the 1024-frame (full→half-res cv2 resize
    and half→1024 ResizeLongestSide collapse into one matrix each — both
    are half-pixel bilinear maps, so their product is exact).

    The resized image is quantized back to uint8 levels before
    normalization like the reference's (both its resizes emit uint8
    images). Residual vs the reference: the intermediate half-res
    quantization is folded through the composed matrices un-rounded, and
    PIL/cv2 use fixed-point filter coefficients — worth ≤ ±1 level on
    rare pixels vs the ~0.5-level drift everywhere without rounding.
    """
    x = img_u8.astype(jnp.float32)
    x = jnp.einsum("oh,hwc->owc", rh, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("pw,owc->opc", rw, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.clip(jnp.round(x), 0.0, 255.0)
    x = (x - jnp.asarray(SAM_PIXEL_MEAN)) / jnp.asarray(SAM_PIXEL_STD)
    nh, nw = x.shape[0], x.shape[1]
    return jnp.pad(x, ((0, pad_to - nh), (0, pad_to - nw), (0, 0)))[None]


@partial(jax.jit, static_argnames=("amg", "kmax"))
def _select_masks_centroids(masks: jnp.ndarray, iou: jnp.ndarray,
                            stab: jnp.ndarray, boxes: jnp.ndarray,
                            valid: jnp.ndarray, amg: AmgConfig, kmax: int):
    """Filter + NMS + top-``kmax`` gather, keeping masks ON DEVICE.

    Returns (masks [kmax, h, w] bool — IoU-desc NMS-keep order, padding
    rows all-false; stats [2*kmax+1] f32 — centroid (x, y) pairs then
    n_kept, packed into one array so the host needs a single readback).
    """
    keep = valid & (stab >= amg.stability_score_thresh)
    if amg.pred_iou_thresh > 0.0:        # reference guard (:296-298)
        keep = keep & (iou > amg.pred_iou_thresh)
    scores = jnp.where(keep, iou, -jnp.inf)
    nms_keep = nms_keep_mask(boxes, scores, amg.box_nms_thresh)
    final_scores = jnp.where(nms_keep & keep, iou, -jnp.inf)
    # fewer candidates than the mask capacity (small point grids with a
    # large max_masks): gather what exists, pad to the static kmax
    k_take = min(kmax, int(final_scores.shape[0]))
    order = jnp.argsort(-final_scores)[:k_take]
    n_kept = jnp.minimum(jnp.sum(final_scores > -jnp.inf), k_take)

    sel = masks[order]
    if k_take < kmax:
        sel = jnp.pad(sel, ((0, kmax - k_take), (0, 0), (0, 0)))
    row_valid = jnp.arange(kmax) < n_kept
    sel = sel & row_valid[:, None, None]

    h, w = sel.shape[1], sel.shape[2]
    m = sel.astype(jnp.float32)
    total = jnp.sum(m, axis=(1, 2))
    cy = jnp.einsum("khw,h->k", m, jnp.arange(h, dtype=jnp.float32))
    cx = jnp.einsum("khw,w->k", m, jnp.arange(w, dtype=jnp.float32))
    denom = jnp.maximum(total, 1.0)
    cents = jnp.stack([cx / denom, cy / denom], axis=1)   # (x, y) like
    stats = jnp.concatenate(                              # mask_centroids
        [cents.reshape(-1), n_kept[None].astype(jnp.float32)])
    return sel, stats


@partial(jax.jit, static_argnames=("cfg", "layer", "facet", "crop"))
def _dino_desc_device(params, cfg: dn.DinoV2Config, img_u8: jnp.ndarray,
                      layer: int, facet: str,
                      crop: Tuple[int, int, int, int]) -> jnp.ndarray:
    """uint8 [H, W, 3] → L2-normalized dense descriptors [P, D] f32,
    with dn.preprocess (ImageNet normalize + center crop to patch
    multiples) fused on device."""
    top, left, hn, wn = crop
    x = img_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(dn.IMAGENET_MEAN)) / jnp.asarray(dn.IMAGENET_STD)
    x = x[top:top + hn, left:left + wn][None].astype(jnp.bfloat16)
    feats = dn.extract_dense(params, cfg, x, layer, facet)
    d = feats[0].astype(jnp.float32)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnames=("sam_cfg", "dino_cfg", "input_hw",
                                   "orig_hw", "amg", "kmax", "pad_to",
                                   "dino_layer", "dino_facet", "crop"))
def _query_front_fused(sam_params, dino_params, sam_cfg: SamArchConfig,
                       dino_cfg: dn.DinoV2Config, img_u8: jnp.ndarray,
                       rh, rw, image_pe, pts, valid, pool_a, pool_b,
                       input_hw: Tuple[int, int], orig_hw: Tuple[int, int],
                       amg: AmgConfig, kmax: int, pad_to: int,
                       dino_layer: int, dino_facet: str,
                       crop: Tuple[int, int, int, int]):
    """The ENTIRE pre-Delaunay device front of one query as ONE program:
    SAM preprocess → encode → all prompt batches (lax.scan) → select/NMS →
    mask→patch pooling, plus the DINO dense extract.

    Why one dispatch: through the axon tunnel each jit invocation and each
    jit output buffer carries a fixed host↔device overhead; the unfused
    front (preprocess + encode + 8 decode batches + select + pool + dino ≈
    12 dispatches, ~37 output buffers) measured a CONSTANT ~224 ms/query
    even while the device stages summed to ~116 ms at idle
    (scripts/probe_pipeline_bound.py) — i.e. serving was dispatch-bound,
    not compute-bound. Fused: 1 dispatch, 3 output buffers. On
    directly-attached TPUs the same fusion removes ~10 host round-trips
    of dispatch latency per query.

    Returns (patch_masks [kmax, P], stats [2*kmax+1], desc [P, D]) — the
    raw masks never leave the program (the pool consumes them in-place).
    """
    batched = _sam_preprocess_fused(img_u8, rh, rw, sam_cfg, pad_to)
    emb = encode_image(sam_params, sam_cfg, batched)[0]

    bsz = amg.points_per_batch
    n_b = pts.shape[0] // bsz

    def body(carry, p):
        mb, io, st, bx = _decode_batch(sam_params, sam_cfg, emb, image_pe,
                                       p, input_hw, orig_hw, amg)
        return carry, (mb, io, st, bx)

    _, (dm, di, dst, dbx) = jax.lax.scan(
        body, 0, pts.reshape(n_b, bsz, 2))
    masks, stats = _select_masks_centroids(
        dm.reshape(-1, orig_hw[0], orig_hw[1]), di.reshape(-1),
        dst.reshape(-1), dbx.reshape(-1, 4), valid, amg, kmax)

    from revisit_anything_tpu.ops.masks import pool_masks_to_patch_grid
    pm = pool_masks_to_patch_grid(masks, pool_a, pool_b)
    desc = _dino_desc_device(dino_params, dino_cfg, img_u8,
                             dino_layer, dino_facet, crop)
    return pm, stats, desc


@dataclasses.dataclass
class ServingIndex:
    """Prebuilt retrieval state (the build-index CLI artifact)."""
    centers: np.ndarray            # [C, D] VLAD vocabulary
    pca_mean: np.ndarray           # [C*D]
    pca_components: np.ndarray     # [pca_dim, C*D]
    pca_variance: np.ndarray       # [pca_dim]
    pca_whiten: bool
    db: np.ndarray                 # [Nd, pca_dim] normalized db segments
    db_image_ids: np.ndarray       # [Nd]
    num_ref_images: int
    order: int = 3
    # device storage dtype for the database rows. "bfloat16" halves HBM
    # (a 1M-segment 1024-d db: 4 GB f32 → 2 GB) — the kNN matmul still
    # accumulates f32 on the MXU, only the one-time bf16 rounding of the
    # stored rows applies (≤4e-3 relative; rank flips only at near-ties).
    # Databases beyond one chip shard over the mesh's data axis instead
    # (SegVLADServer mesh handling below).
    db_dtype: str = "float32"

    @classmethod
    def from_npz(cls, path) -> "ServingIndex":
        """Load from a path OR an already-opened np.load result (callers
        that also need auxiliary keys avoid reading the npz twice)."""
        z = path if hasattr(path, "files") else np.load(path)
        ids = z["db_image_ids"]
        if "num_ref_images" in z:                  # persisted (snapshots)
            n_ref = int(z["num_ref_images"])
        else:
            n_ref = int(ids.max()) + 1 if len(ids) else 0
        return cls(centers=z["centers"], pca_mean=z["pca_mean"],
                   pca_components=z["pca_components"],
                   pca_variance=z["pca_variance"],
                   pca_whiten=bool(z["pca_whiten"]), db=z["db"],
                   db_image_ids=ids,
                   num_ref_images=n_ref,
                   order=int(z["order"]),
                   db_dtype=str(z["db_dtype"]) if "db_dtype" in z
                   else "float32")


class SegVLADServer:
    """Persistent online-query server for one (models, index) pair.

    Args:
      full_hw: the dataset 'desired' resolution — queries must arrive at
        this size (resize arbitrary inputs on the host first).
      sam_hw: SAM extraction resolution (half of full_hw for every
        reference dataset except AmsterTime — config.py).
      max_masks: static device mask capacity; masks beyond it (post-NMS,
        IoU-desc) are dropped. Reference post-NMS counts are far below 128.
    """

    def __init__(self, *, sam_params, sam_cfg: SamArchConfig,
                 dino_params, dino_cfg: dn.DinoV2Config,
                 index: ServingIndex,
                 full_hw: Tuple[int, int], sam_hw: Tuple[int, int],
                 amg: Optional[AmgConfig] = None,
                 dino_layer: int = 31, dino_facet: str = "value",
                 max_masks: int = 128,
                 knn_topk: int = KNN_TOPK, borda_topk: int = BORDA_TOPK,
                 top_images: int = RECALL_TOPK,
                 mesh="auto",
                 db_capacity: Optional[int] = None,
                 max_ref_images: Optional[int] = None,
                 insert_chunk: int = 16):
        self.sam_params = sam_params
        self.sam_cfg = sam_cfg
        self.dino_params = dino_params
        self.dino_cfg = dino_cfg
        self.amg = amg or AmgConfig()
        self.full_hw = tuple(full_hw)
        self.sam_hw = tuple(sam_hw)
        self.dino_layer = dino_layer
        self.dino_facet = dino_facet
        self.kmax = max_masks
        self.knn_topk = knn_topk
        self.borda_topk = borda_topk
        self.top_images = top_images
        self.order = index.order
        self.num_clusters = index.centers.shape[0]
        self.num_ref_images = index.num_ref_images
        # images per batched-insert dispatch: each chunk costs ONE db
        # copy and one state swap (add_reference_images)
        self._insert_chunk = max(1, int(insert_chunk))

        fh, fw = self.full_hw
        sh, sw = self.sam_hw
        self.input_hw = resize_longest_side(sh, sw, sam_cfg.image_size)

        # Composed resize matrices: full res → SAM half res → 1024 frame.
        down_h = bilinear_weight_matrix(sh, fh)
        down_w = bilinear_weight_matrix(sw, fw)
        up_h = bilinear_weight_matrix(self.input_hw[0], sh)
        up_w = bilinear_weight_matrix(self.input_hw[1], sw)
        self._rh = jnp.asarray(up_h @ down_h)
        self._rw = jnp.asarray(up_w @ down_w)

        # DINO center crop to patch multiples (dn.preprocess semantics —
        # torchvision round-half-even offsets, dn.center_crop_offsets).
        hn, wn = (fh // 14) * 14, (fw // 14) * 14
        top, left = dn.center_crop_offsets(fh, fw, hn, wn)
        self._crop = (top, left, hn, wn)

        # AMG point grid in the 1024 frame (apply_coords scaling).
        grid = build_point_grid(self.amg.points_per_side)
        pts_orig = grid * np.array([sw, sh], np.float32)
        scale = np.array([self.input_hw[1] / sw, self.input_hw[0] / sh],
                         np.float32)
        pts = (pts_orig * scale).astype(np.float32)
        bsz = self.amg.points_per_batch
        pad = (-len(pts)) % bsz
        self._n_pts = len(pts)
        if pad:
            pts = np.concatenate([pts, np.zeros((pad, 2), np.float32)])
        self._pts_dev = jnp.asarray(pts)
        self._valid_dev = jnp.asarray(
            np.repeat(np.concatenate([np.ones(self._n_pts, bool),
                                      np.zeros(pad, bool)]), 3))
        self._bsz = bsz

        pool_a, pool_b = mask_pool_matrices(self.sam_hw, self.full_hw)
        self._pool_a = jnp.asarray(pool_a)
        self._pool_b = jnp.asarray(pool_b)

        # Device-resident retrieval state. On a multi-device host the
        # database rows are sharded over the mesh's data axis (each chip
        # holds Nd/d rows — the serving answer to databases beyond one
        # chip's HBM); jit propagates the sharding through the fused
        # retrieval tail and inserts the gather collectives.
        from revisit_anything_tpu.parallel import resolve_mesh
        self._mesh = resolve_mesh(mesh)
        self._centers = jnp.asarray(index.centers.astype(np.float32))
        self._pca_mean = jnp.asarray(index.pca_mean.astype(np.float32))
        self._pca_comps = jnp.asarray(index.pca_components.astype(np.float32))
        self._pca_var = jnp.asarray(index.pca_variance.astype(np.float32))
        self._whiten = bool(index.pca_whiten)
        db_np_dtype = jnp.dtype(index.db_dtype)
        db = index.db.astype(db_np_dtype)
        db_ids = index.db_image_ids.astype(np.int32)

        # Incremental mode: pad the database to a static row capacity with
        # guard rows; adds/removes then never change shapes (ONE compiled
        # query program for the life of the server) and each insert is a
        # copy-on-insert device update (see _db_insert). Composes with a
        # mesh: the capacity-padded rows shard over the data axis and
        # inserts are dynamic-update-slices on the sharded array (GSPMD
        # routes each write to the owning shard).
        self._cursor = None
        if db_capacity is not None:
            if db_capacity < len(db):
                raise ValueError(f"db_capacity {db_capacity} < existing "
                                 f"database rows {len(db)}")
            self._cursor = len(db)
            self._capacity = int(db_capacity)
            # Borda bin capacity: one id per added image, each consuming
            # >= 1 row in practice; explicit max_ref_images overrides.
            if (max_ref_images is not None
                    and max_ref_images < index.num_ref_images):
                # ids >= max_ref_images would silently fall out of the
                # vote segment_sum: in the db, costing kNN compute, but
                # never retrievable
                raise ValueError(
                    f"max_ref_images {max_ref_images} < the index's "
                    f"existing {index.num_ref_images} image ids")
            self.num_ref_images = int(
                max_ref_images if max_ref_images is not None
                else index.num_ref_images + (db_capacity - len(db)))
            self._next_image_id = index.num_ref_images
            pad = db_capacity - len(db)
            db = np.concatenate(
                [db, np.full((pad, db.shape[1]), _GUARD, db_np_dtype)])
            db_ids = np.concatenate(
                [db_ids, np.zeros((pad,), np.int32)])
        self._db_dtype = str(index.db_dtype)
        self._db_sharding = None
        self._ids_sharding = None
        if self._mesh is not None and self._mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            d = int(self._mesh.devices.size)
            pad = (-len(db)) % d
            if pad:
                # shard padding: guard rows, never surface (id unread —
                # guard hits vote zero in query_topk_images)
                db = np.concatenate(
                    [db, np.full((pad, db.shape[1]), _GUARD, db_np_dtype)])
                db_ids = np.concatenate(
                    [db_ids, np.zeros((pad,), np.int32)])
            self._db_sharding = NamedSharding(self._mesh, P("data", None))
            self._ids_sharding = NamedSharding(self._mesh, P("data"))
            db_dev = jax.device_put(jnp.asarray(db), self._db_sharding)
            self._db_state = (
                db_dev,
                jax.device_put(jnp.asarray(db_ids), self._ids_sharding),
                _db_sq_norms(db_dev))
        else:
            db_dev = jnp.asarray(db)
            self._db_state = (db_dev, jnp.asarray(db_ids),
                              _db_sq_norms(db_dev))
        # Inserts/removes serialize on this lock; queries stay lock-free
        # by reading the (db, ids, norms) triple through ONE attribute
        # load of _db_state (a torn read of separate attributes could
        # pair a post-insert db with pre-insert ids/norms, mislabeling
        # or mis-scoring the new rows).
        import threading
        self._mutate_lock = threading.Lock()

        self._image_pe = dense_positional_embedding(sam_params, sam_cfg)[0]

        from revisit_anything_tpu.ops.masks import pool_masks_to_patch_grid
        self._pool = pool_masks_to_patch_grid

    # ----- device stages (all async dispatches) -----

    def _amg_device(self, img_dev):
        """Image → (device masks [kmax, sh, sw], stats array)."""
        batched = _sam_preprocess_fused(img_dev, self._rh, self._rw,
                                        self.sam_cfg,
                                        self.sam_cfg.image_size)
        emb = encode_image(self.sam_params, self.sam_cfg, batched)[0]
        dm, di, dst, dbx = [], [], [], []
        for s in range(0, self._pts_dev.shape[0], self._bsz):
            mb, io, st, bx = _decode_batch(
                self.sam_params, self.sam_cfg, emb, self._image_pe,
                self._pts_dev[s:s + self._bsz], self.input_hw, self.sam_hw,
                self.amg)
            dm.append(mb); di.append(io); dst.append(st); dbx.append(bx)
        return _select_masks_centroids(
            jnp.concatenate(dm), jnp.concatenate(di), jnp.concatenate(dst),
            jnp.concatenate(dbx), self._valid_dev, self.amg, self.kmax)

    def _front(self, img_dev):
        """One-dispatch query front: (patch_masks, stats, desc)."""
        return _query_front_fused(
            self.sam_params, self.dino_params, self.sam_cfg, self.dino_cfg,
            img_dev, self._rh, self._rw, self._image_pe, self._pts_dev,
            self._valid_dev, self._pool_a, self._pool_b,
            self.input_hw, self.sam_hw, self.amg, self.kmax,
            self.sam_cfg.image_size, self.dino_layer, self.dino_facet,
            self._crop)

    def _adjacency(self, stats_np: np.ndarray) -> Tuple[np.ndarray, int]:
        n = int(stats_np[-1])
        adj = np.zeros((self.kmax, self.kmax), dtype=bool)
        if n > 0 and self.order > 0:
            cents = stats_np[:2 * self.kmax].reshape(self.kmax, 2)[:n]
            adj[:n, :n] = delaunay_adjacency(cents.astype(np.float64),
                                             self.order)
        elif n > 0:
            adj[:n, :n] = np.eye(n, dtype=bool)
        return adj, n

    # ----- database state (atomic pair) -----

    @property
    def num_images(self) -> int:
        """Number of image ids in use (NOT the Borda bin capacity, which
        includes incremental headroom)."""
        return int(self._next_image_id if self._cursor is not None
                   else self.num_ref_images)

    @property
    def _db(self):
        return self._db_state[0]

    @property
    def _db_ids(self):
        return self._db_state[1]

    @property
    def _db_norms(self):
        """Precomputed [Nd] f32 squared row norms — recomputed once per
        database SWAP (init/insert/remove/restore) instead of per query:
        the in-program recompute was a full extra 410 MB database read
        on every query (round-5 tail probe)."""
        return self._db_state[2]

    # ----- public API -----

    def query(self, img_uint8: np.ndarray) -> np.ndarray:
        """One query image (uint8 RGB at full_hw) → top image ids."""
        assert img_uint8.shape[:2] == self.full_hw, (
            f"expected {self.full_hw}, got {img_uint8.shape[:2]} — resize "
            "on the host first")
        img_dev = jax.device_put(img_uint8)               # single upload
        patch_masks, stats, desc = self._front(img_dev)    # ONE dispatch
        stats_np = np.asarray(stats)                       # SYNC 1 (tiny)
        adj, _ = self._adjacency(stats_np)

        db, db_ids, db_norms = self._db_state   # ONE load: consistent
        top = query_topk_images(
            desc, patch_masks, jnp.asarray(adj), self._centers,
            self._pca_mean, self._pca_comps, self._pca_var,
            db, db_ids,
            num_clusters=self.num_clusters,
            num_ref_images=self.num_ref_images,
            knn_topk=self.knn_topk, borda_topk=self.borda_topk,
            top_images=self.top_images, whiten=self._whiten,
            db_norms=db_norms)
        return np.asarray(top)                             # SYNC 2 (tiny)

    def query_many(self, imgs: Sequence[np.ndarray],
                   workers: int = 4) -> List[np.ndarray]:
        """Pipelined queries: host phases (Delaunay, sync waits) of one
        query overlap device compute of the others."""
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=workers) as pool:
            return list(pool.map(self.query, imgs))

    # ----- incremental index updates (db_capacity mode) -----

    def add_reference_images(self,
                             imgs: Sequence[np.ndarray]) -> List[int]:
        """Extract + aggregate NEW database images on the live server and
        insert their segment rows — no index rebuild, no recompile (the
        database keeps its static capacity shape; in-flight queries keep
        answering from the pre-insert snapshot — see _db_insert's
        no-donation note). On a mesh the capacity-sharded database
        accepts inserts the same way (the update lands on the owning
        shards).

        Each image runs the same device path as a query (AMG → DINO →
        pool → Delaunay → VLAD → PCA → normalize), pipelined across the
        batch; images are then inserted in chunks of ``insert_chunk``
        with ONE device-side database copy + state swap per chunk
        (_compact_insert_many) — bulk re-indexing costs
        O(chunks × db_bytes), not O(images × db_bytes). Kept rows
        compact across the whole chunk exactly like consecutive
        single-image inserts. Returns the assigned database image ids.
        Requires ``db_capacity=...`` at construction.
        """
        if self._cursor is None:
            raise ValueError("incremental inserts need SegVLADServer("
                             "db_capacity=...)")
        for img in imgs:
            assert img.shape[:2] == self.full_hw, (
                f"expected {self.full_hw}, got {img.shape[:2]}")

        def _prep(img):
            """Per-image device front + host Delaunay → compacted static
            row block. Pure w.r.t. server state — safe to pipeline."""
            img_dev = jax.device_put(img)
            pm, stats, desc = self._front(img_dev)
            stats_np = np.asarray(stats)
            adj, n_kept = self._adjacency(stats_np)
            rows, _ = query_segment_rows(
                desc, pm, jnp.asarray(adj), self._centers,
                self._pca_mean, self._pca_comps, self._pca_var,
                num_clusters=self.num_clusters, whiten=self._whiten,
                guard_value=_GUARD)
            return rows, n_kept

        from concurrent.futures import ThreadPoolExecutor
        ids: List[int] = []
        with self._mutate_lock:     # serialize concurrent inserts: an
            # unsynchronized cursor read-modify-write would let two
            # threads write the same row block (one image silently
            # unretrievable, persisted by snapshot_index)
            pos = 0
            while pos < len(imgs):
                # chunking keeps the stacked write inside capacity: each
                # chunk costs ONE db copy (vs one per image before)
                room = (self._capacity - self._cursor) // self.kmax
                if room < 1:
                    raise RuntimeError(
                        f"serving index capacity exhausted "
                        f"({self._cursor}+{self.kmax} > {self._capacity})")
                room = min(room, self.num_ref_images - self._next_image_id)
                if room < 1:
                    raise RuntimeError("image-id (Borda bin) capacity "
                                       "exhausted — raise max_ref_images")
                chunk = imgs[pos:pos + min(room, self._insert_chunk)]
                # pipeline the per-image fronts: host phases (stats sync,
                # Delaunay) of one image overlap device compute of others
                if len(chunk) > 1:
                    with ThreadPoolExecutor(max_workers=4) as pool:
                        prepped = list(pool.map(_prep, chunk))
                else:
                    prepped = [_prep(chunk[0])]
                kept = np.asarray([int(k) for _, k in prepped],
                                  np.int32)
                chunk_ids = np.arange(len(chunk), dtype=np.int32) \
                    + self._next_image_id
                db, db_ids = _compact_insert_many(
                    self._db, self._db_ids,
                    jnp.stack([r for r, _ in prepped]),
                    jnp.asarray(kept), jnp.asarray(chunk_ids),
                    np.int32(self._cursor))
                if self._db_sharding is not None:
                    # keep the row sharding stable across inserts (a no-op
                    # when GSPMD already kept it)
                    db = jax.device_put(db, self._db_sharding)
                    db_ids = jax.device_put(db_ids, self._ids_sharding)
                # ONE swap: in-flight queries see either the old or the
                # new consistent (db, ids, norms) triple, never a mix.
                # (The norms recompute reads the db once per CHUNK —
                # same order as _compact_insert_many's own copy.)
                self._db_state = (db, db_ids, _db_sq_norms(db))
                # kept rows lead each static block and the chunk is
                # compacted; the stacked guard tail is overwritten by the
                # next insert
                self._cursor += int(kept.sum())
                ids.extend(int(i) for i in chunk_ids)
                self._next_image_id += len(chunk)
                pos += len(chunk)
        return ids

    def remove_reference_image(self, image_id: int) -> None:
        """Drop a database image from retrieval: its rows become guard
        rows (zero votes, never in any top-k). Rows are not reclaimed —
        capacity is append-only; rebuild the index to compact."""
        if self._cursor is None:
            raise ValueError("incremental removal needs SegVLADServer("
                             "db_capacity=...)")
        with self._mutate_lock:
            db = _db_remove(self._db, self._db_ids, np.int32(image_id))
            if self._db_sharding is not None:
                db = jax.device_put(db, self._db_sharding)
            self._db_state = (db, self._db_ids, _db_sq_norms(db))

    def snapshot_index(self, path: Optional[str] = None,
                       image_keys: Optional[Sequence[str]] = None
                       ) -> ServingIndex:
        """Freeze the current database — incremental adds/removes
        included — into a ServingIndex (compacted: removed images' guard
        rows are dropped). With ``path``, also writes the build-index npz
        (loadable by ``ServingIndex.from_npz`` / the query CLI).

        ``image_keys``: display names per image id for the query CLI;
        defaults to ``image_<id>`` per used image id."""
        with self._mutate_lock:     # consistent (db, ids, cursor) view
            db_dev, ids_dev = self._db_state[:2]
            n = self._cursor if self._cursor is not None else len(
                np.asarray(ids_dev))
            db = np.asarray(db_dev[:n], np.float32)
            db_ids = np.asarray(ids_dev[:n])
            # the TRUE image-id bound, not the Borda bin capacity: an
            # incremental server's num_ref_images includes unused
            # headroom bins; persisting THAT would re-inflate on every
            # snapshot/restore-with-db_capacity cycle and push
            # _next_image_id past the real images
            n_images = (self._next_image_id if self._cursor is not None
                        else self.num_ref_images)
        live = np.all(db < _GUARD / 2, axis=1)         # drop guard rows
        db, db_ids = db[live], db_ids[live]
        idx = ServingIndex(
            centers=np.asarray(self._centers),
            pca_mean=np.asarray(self._pca_mean),
            pca_components=np.asarray(self._pca_comps),
            pca_variance=np.asarray(self._pca_var),
            pca_whiten=self._whiten, db=db, db_image_ids=db_ids,
            num_ref_images=n_images, order=self.order,
            db_dtype=self._db_dtype)
        if path is not None:
            if image_keys is None:
                image_keys = [f"image_{i}" for i in range(n_images)]
            # rows persist as f32 on disk; db_dtype records the server's
            # DEVICE storage choice so a snapshot/restore round-trip
            # keeps e.g. a bfloat16 database at half HBM
            np.savez_compressed(
                path, db=db.astype(np.float32),
                db_dtype=np.asarray(self._db_dtype),
                db_image_ids=db_ids,
                image_keys=np.asarray(list(image_keys), dtype=str),
                num_ref_images=np.asarray(n_images),
                centers=idx.centers, pca_mean=idx.pca_mean,
                pca_components=idx.pca_components,
                pca_variance=idx.pca_variance,
                pca_whiten=np.asarray(bool(idx.pca_whiten)),
                order=np.asarray(self.order),
                mask_h=np.asarray(self.sam_hw[0]),
                mask_w=np.asarray(self.sam_hw[1]),
                dino_h=np.asarray(self.full_hw[0]),
                dino_w=np.asarray(self.full_hw[1]))
        return idx
