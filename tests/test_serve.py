"""Serving-path tests: SegVLADServer vs the staged pipeline (small random
models on the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisit_anything_tpu.models import dinov2 as dn
from revisit_anything_tpu.models.sam import SamArchConfig, init_sam_params
from revisit_anything_tpu.models.sam.amg import AmgConfig, generate_masks
from revisit_anything_tpu.ops.adjacency import delaunay_adjacency
from revisit_anything_tpu.ops.masks import mask_centroids
from revisit_anything_tpu.pipeline.serve import SegVLADServer, ServingIndex

SAM_SMALL = SamArchConfig(encoder_dim=64, encoder_depth=2, encoder_heads=4,
                          global_attn_indexes=(1,), image_size=128,
                          patch_size=16, window_size=4, prompt_dim=32,
                          decoder_heads=4, decoder_mlp_dim=128,
                          iou_head_hidden=32)
DINO_SMALL = dn.DinoV2Config(embed_dim=64, depth=2, num_heads=4,
                             ffn="mlp", pretrain_grid=(8, 8))

H, W = 112, 112


@pytest.fixture(scope="module")
def models():
    sam_params = init_sam_params(SAM_SMALL, jax.random.PRNGKey(0))
    dino_params = dn.init_params(DINO_SMALL, jax.random.PRNGKey(1))
    return sam_params, dino_params


def _index(rng, n_segs=200, n_images=20, clusters=8, dim=64, pca_dim=16):
    db = rng.standard_normal((n_segs, pca_dim)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    return ServingIndex(
        centers=rng.standard_normal((clusters, dim)).astype(np.float32),
        pca_mean=np.zeros((clusters * dim,), np.float32),
        pca_components=rng.standard_normal(
            (pca_dim, clusters * dim)).astype(np.float32) * 0.1,
        pca_variance=np.ones((pca_dim,), np.float32),
        pca_whiten=True, db=db,
        db_image_ids=np.repeat(np.arange(n_images), n_segs // n_images),
        num_ref_images=n_images, order=3)


@pytest.fixture(scope="module")
def server(models):
    sam_params, dino_params = models
    rng = np.random.default_rng(3)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    return SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=_index(rng), full_hw=(H, W), sam_hw=(H // 2, W // 2),
        amg=amg, dino_layer=1, max_masks=32, top_images=5)


def _image(rng):
    img = rng.integers(60, 200, (H, W, 3), dtype=np.uint8)
    for _ in range(4):
        cy, cx = rng.integers(10, H - 10), rng.integers(10, W - 10)
        r = rng.integers(6, 20)
        yy, xx = np.ogrid[:H, :W]
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = rng.integers(0, 255, 3)
    return img


def test_query_runs_and_is_deterministic(server):
    rng = np.random.default_rng(0)
    img = _image(rng)
    top1 = server.query(img)
    top2 = server.query(img)
    assert top1.shape == (5,)
    np.testing.assert_array_equal(top1, top2)


def test_query_many_matches_single(server):
    rng = np.random.default_rng(1)
    imgs = [_image(rng) for _ in range(3)]
    singles = [server.query(im) for im in imgs]
    batched = server.query_many(imgs, workers=3)
    for a, b in zip(singles, batched):
        np.testing.assert_array_equal(a, b)


def test_device_amg_matches_generate_masks(models):
    """With full_hw == sam_hw (identity down-resize) the device AMG must
    produce exactly the masks of the staged generate_masks path, and the
    device centroids must match host mask_centroids."""
    sam_params, dino_params = models
    rng = np.random.default_rng(7)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    srv = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=_index(rng), full_hw=(H, W), sam_hw=(H, W),
        amg=amg, dino_layer=1, max_masks=32)

    img = _image(rng)
    masks_dev, stats = srv._amg_device(jax.device_put(img))
    stats_np = np.asarray(stats)
    n = int(stats_np[-1])

    records = generate_masks(sam_params, SAM_SMALL, img, amg, max_masks=32)
    assert n == len(records)
    dev = np.asarray(masks_dev)[:n]
    ref = np.stack([r.segmentation for r in records])
    np.testing.assert_array_equal(dev, ref)
    # padding rows all-false
    assert not np.asarray(masks_dev)[n:].any()

    cents_dev = stats_np[:2 * srv.kmax].reshape(srv.kmax, 2)[:n]
    cents_host = mask_centroids(ref)
    np.testing.assert_allclose(cents_dev, cents_host, atol=1e-3)


def test_serving_matches_staged_query(models):
    """Full serve.query equals the same math run through the staged ops
    (pool → VLAD → PCA → kNN → Borda) with the same inputs."""
    from revisit_anything_tpu.ops.masks import (mask_pool_matrices,
                                                pool_masks_to_patch_grid)
    from revisit_anything_tpu.pipeline.query import query_topk_images
    from revisit_anything_tpu.pipeline.serve import _dino_desc_device

    sam_params, dino_params = models
    rng = np.random.default_rng(11)
    idx = _index(rng)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    srv = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=idx, full_hw=(H, W), sam_hw=(H // 2, W // 2),
        amg=amg, dino_layer=1, max_masks=32)

    img = _image(rng)
    top_served = srv.query(img)

    # staged re-computation from the same device AMG output
    masks_dev, stats = srv._amg_device(jax.device_put(img))
    stats_np = np.asarray(stats)
    n = int(stats_np[-1])
    masks = np.asarray(masks_dev)[:n]
    adj = np.zeros((srv.kmax, srv.kmax), bool)
    adj[:n, :n] = delaunay_adjacency(mask_centroids(masks), 3)

    desc = _dino_desc_device(dino_params, DINO_SMALL, jnp.asarray(img),
                             1, "value", srv._crop)
    pool_a, pool_b = mask_pool_matrices((H // 2, W // 2), (H, W))
    pm = pool_masks_to_patch_grid(masks_dev, jnp.asarray(pool_a),
                                  jnp.asarray(pool_b))
    top_staged = np.asarray(query_topk_images(
        desc, pm, jnp.asarray(adj), jnp.asarray(idx.centers),
        jnp.asarray(idx.pca_mean), jnp.asarray(idx.pca_components),
        jnp.asarray(idx.pca_variance), jnp.asarray(idx.db),
        jnp.asarray(idx.db_image_ids.astype(np.int32)),
        num_clusters=8, num_ref_images=idx.num_ref_images,
        top_images=5, whiten=True))
    np.testing.assert_array_equal(top_served, top_staged)


def test_serving_with_fused_decode_tail_matches_split(models):
    """The production TPU decode runs ops/decode_fused.py (gated off on
    CPU for test speed); force it through the FULL serving path in
    interpret mode and pin query answers against the split-kernel server
    — the integration-level guarantee behind the kernel-level parity
    tests (tests/test_decode_fused.py)."""
    from revisit_anything_tpu.models.sam import decoder as dec_mod
    sam_params, dino_params = models
    rng = np.random.default_rng(41)
    idx = _index(rng)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    kw = dict(sam_params=sam_params, sam_cfg=SAM_SMALL,
              dino_params=dino_params, dino_cfg=DINO_SMALL,
              index=idx, full_hw=(H, W), sam_hw=(H // 2, W // 2),
              amg=amg, dino_layer=1, max_masks=32, top_images=5)
    img = _image(rng)
    # the probs path must be forced too: _use_probs_path gates on TPU
    from revisit_anything_tpu.models.sam.amg import _decode_batch
    from revisit_anything_tpu.models.sam.decoder import decode_masks
    from revisit_anything_tpu.pipeline import serve as serve_mod

    def clear():
        # the flags are trace-time and the whole front is module-jitted:
        # without clearing, the second variant silently reuses the
        # first's cached computation
        serve_mod._query_front_fused.clear_cache()
        _decode_batch.clear_cache()
        decode_masks.clear_cache()

    old_probs, old_tail = dec_mod._PROBS_PATH, dec_mod._FUSED_TAIL
    try:
        dec_mod._PROBS_PATH = "on"
        dec_mod._FUSED_TAIL = "off"
        clear()
        top_split = SegVLADServer(mesh=None, **kw).query(img)
        dec_mod._FUSED_TAIL = "on"
        clear()
        top_fused = SegVLADServer(mesh=None, **kw).query(img)
    finally:
        dec_mod._PROBS_PATH, dec_mod._FUSED_TAIL = old_probs, old_tail
        clear()
    np.testing.assert_array_equal(top_split, top_fused)


def test_serving_sharded_db_matches_unsharded(models):
    """mesh-sharded database serving equals the single-device answer on the
    8-device CPU mesh (db rows not divisible by the device count)."""
    from revisit_anything_tpu.parallel import make_mesh
    sam_params, dino_params = models
    rng = np.random.default_rng(21)
    idx = _index(rng, n_segs=203, n_images=29)
    idx.db_image_ids = np.repeat(np.arange(29), 7)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    kw = dict(sam_params=sam_params, sam_cfg=SAM_SMALL,
              dino_params=dino_params, dino_cfg=DINO_SMALL,
              index=idx, full_hw=(H, W), sam_hw=(H // 2, W // 2),
              amg=amg, dino_layer=1, max_masks=32, knn_topk=50)
    srv_single = SegVLADServer(mesh=None, **kw)
    srv_mesh = SegVLADServer(mesh=make_mesh((8,), ("data",)), **kw)
    img = _image(rng)
    np.testing.assert_array_equal(srv_single.query(img),
                                  srv_mesh.query(img))


def test_bf16_db_matches_f32_topk(models):
    """db_dtype='bfloat16' (half-HBM serving database) must produce the
    same top-k images as f32 storage on separated synthetic data."""
    import dataclasses
    sam_params, dino_params = models
    rng = np.random.default_rng(11)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    idx32 = _index(rng)
    idx16 = dataclasses.replace(idx32, db_dtype="bfloat16")

    def build(index):
        return SegVLADServer(
            sam_params=sam_params, sam_cfg=SAM_SMALL,
            dino_params=dino_params, dino_cfg=DINO_SMALL, index=index,
            full_hw=(H, W), sam_hw=(H // 2, W // 2), amg=amg,
            dino_layer=1, max_masks=32, top_images=5)

    img = _image(np.random.default_rng(4))
    top32 = build(idx32).query(img)
    top16 = build(idx16).query(img)
    np.testing.assert_array_equal(top32, top16)


def test_packed_params_serving_matches_plain(models):
    """SegVLADServer with PackedParams (utils/packing.py — the warmup
    fix: one device buffer per model) answers identically to plain
    pytree params."""
    import jax as _jax
    from revisit_anything_tpu.utils.packing import pack
    sam_params, dino_params = models
    rng = np.random.default_rng(31)
    idx = _index(rng)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)

    def build(sp, dp):
        return SegVLADServer(
            sam_params=sp, sam_cfg=SAM_SMALL, dino_params=dp,
            dino_cfg=DINO_SMALL, index=idx, full_hw=(H, W),
            sam_hw=(H // 2, W // 2), amg=amg, dino_layer=1,
            max_masks=32, top_images=5)

    srv_plain = build(sam_params, dino_params)
    srv_packed = build(_jax.jit(pack)(sam_params),
                       _jax.jit(pack)(dino_params))
    img = _image(rng)
    np.testing.assert_array_equal(srv_plain.query(img),
                                  srv_packed.query(img))


def test_incremental_add_then_retrieve(models):
    """db_capacity mode: images added to the LIVE server are retrievable
    (an identical query ranks its own image first), and removal drops
    them from the top-k."""
    sam_params, dino_params = models
    rng = np.random.default_rng(7)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    idx = _index(rng)
    srv = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=idx, full_hw=(H, W), sam_hw=(H // 2, W // 2),
        amg=amg, dino_layer=1, max_masks=32, top_images=5,
        db_capacity=600, mesh=None)
    new_imgs = [_image(rng) for _ in range(3)]
    ids = srv.add_reference_images(new_imgs)
    assert ids == [20, 21, 22]      # appended after the 20 index images

    def rank(top, iid):
        pos = np.flatnonzero(np.asarray(top) == iid)
        return int(pos[0]) if len(pos) else len(top)

    # an identical query must rank its own image above the other added
    # images (absolute top-1 is not guaranteed against the random
    # prebuilt rows: with random weights their vote volume competes)
    for img, iid in zip(new_imgs, ids):
        top = srv.query(img)
        assert rank(top, iid) < min(rank(top, o)
                                    for o in ids if o != iid), (top, iid)

    srv.remove_reference_image(ids[1])
    top = srv.query(new_imgs[1])
    # removed image votes zero: the surviving added images outrank it
    assert rank(top, ids[1]) == len(top)


def test_batched_insert_matches_per_image(models):
    """A multi-image chunk (ONE db copy, _compact_insert_many) must leave
    the database BIT-identical to per-image inserts (insert_chunk=1):
    same compaction, same ids, same cursor."""
    sam_params, dino_params = models
    rng = np.random.default_rng(23)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    idx = _index(rng)

    def build(chunk):
        return SegVLADServer(
            sam_params=sam_params, sam_cfg=SAM_SMALL,
            dino_params=dino_params, dino_cfg=DINO_SMALL,
            index=idx, full_hw=(H, W), sam_hw=(H // 2, W // 2),
            amg=amg, dino_layer=1, max_masks=32, top_images=5,
            db_capacity=600, mesh=None, insert_chunk=chunk)

    imgs = [_image(rng) for _ in range(4)]
    srv_b = build(4)        # one chunk of 4 → one copy
    srv_s = build(1)        # four single-image chunks
    ids_b = srv_b.add_reference_images(imgs)
    ids_s = srv_s.add_reference_images(imgs)
    assert ids_b == ids_s
    assert srv_b._cursor == srv_s._cursor
    db_b = np.asarray(srv_b._db, np.float32)
    db_s = np.asarray(srv_s._db, np.float32)
    np.testing.assert_array_equal(db_b, db_s)
    # ids must agree on LIVE rows; guard rows' ids are unreadable by
    # construction (guard score −inf) and the two paths stamp them
    # differently (per-image: the last image's id; batched: the chunk's
    # first id) — snapshot_index drops them either way
    from revisit_anything_tpu.pipeline.serve import _GUARD
    live = np.all(db_b < _GUARD / 2, axis=1)
    np.testing.assert_array_equal(np.asarray(srv_b._db_ids)[live],
                                  np.asarray(srv_s._db_ids)[live])


def test_batched_insert_chunk_capacity_split(models):
    """A batch larger than the remaining full-block room must split into
    chunks and still insert every image (the stacked guard tail may not
    exceed capacity mid-batch)."""
    sam_params, dino_params = models
    rng = np.random.default_rng(29)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    idx = _index(rng)
    srv = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=idx, full_hw=(H, W), sam_hw=(H // 2, W // 2),
        amg=amg, dino_layer=1, max_masks=32, top_images=5,
        db_capacity=len(idx.db) + 3 * 32, mesh=None, insert_chunk=8)
    imgs = [_image(rng) for _ in range(2)]
    ids = srv.add_reference_images(imgs)    # room=3 blocks, chunk of 2 ok
    assert len(ids) == 2
    for img, iid in zip(imgs, ids):
        assert iid in list(np.asarray(srv.query(img)))


def test_incremental_matches_prebuilt(models):
    """A server whose rows arrived incrementally answers exactly like one
    whose index was built with those rows up front."""
    sam_params, dino_params = models
    rng = np.random.default_rng(11)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    idx = _index(rng)
    srv_inc = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=idx, full_hw=(H, W), sam_hw=(H // 2, W // 2),
        amg=amg, dino_layer=1, max_masks=32, top_images=5,
        db_capacity=400, mesh=None)
    new_img = _image(rng)
    (new_id,) = srv_inc.add_reference_images([new_img])
    used = srv_inc._cursor

    # prebuilt: same rows, same Borda bin count
    db2 = np.asarray(srv_inc._db[:used], np.float32)
    ids2 = np.asarray(srv_inc._db_ids[:used])
    import dataclasses
    idx2 = dataclasses.replace(
        idx, db=db2, db_image_ids=ids2,
        num_ref_images=srv_inc.num_ref_images)
    srv_pre = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=idx2, full_hw=(H, W), sam_hw=(H // 2, W // 2),
        amg=amg, dino_layer=1, max_masks=32, top_images=5, mesh=None)
    q = _image(rng)
    np.testing.assert_array_equal(srv_inc.query(q), srv_pre.query(q))
    np.testing.assert_array_equal(srv_inc.query(new_img),
                                  srv_pre.query(new_img))


def test_incremental_sharded_matches_single_device(models):
    """Incremental add/remove/snapshot on an 8-way-sharded server match
    the single-device server bit-for-bit (the two flagship serving
    features — live inserts and sharded databases — compose)."""
    from revisit_anything_tpu.parallel import make_mesh
    sam_params, dino_params = models
    rng = np.random.default_rng(23)
    idx = _index(rng, n_segs=203, n_images=29)
    idx.db_image_ids = np.repeat(np.arange(29), 7)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    kw = dict(sam_params=sam_params, sam_cfg=SAM_SMALL,
              dino_params=dino_params, dino_cfg=DINO_SMALL,
              index=idx, full_hw=(H, W), sam_hw=(H // 2, W // 2),
              amg=amg, dino_layer=1, max_masks=32, top_images=5,
              db_capacity=400)
    srv_one = SegVLADServer(mesh=None, **kw)
    srv_mesh = SegVLADServer(mesh=make_mesh((8,), ("data",)), **kw)

    new_imgs = [_image(rng) for _ in range(3)]
    ids_one = srv_one.add_reference_images(new_imgs)
    ids_mesh = srv_mesh.add_reference_images(new_imgs)
    assert ids_one == ids_mesh
    assert srv_one._cursor == srv_mesh._cursor

    q = _image(rng)
    np.testing.assert_array_equal(srv_one.query(q), srv_mesh.query(q))
    for img in new_imgs:
        np.testing.assert_array_equal(srv_one.query(img),
                                      srv_mesh.query(img))

    srv_one.remove_reference_image(ids_one[1])
    srv_mesh.remove_reference_image(ids_mesh[1])
    np.testing.assert_array_equal(srv_one.query(new_imgs[1]),
                                  srv_mesh.query(new_imgs[1]))

    snap_one = srv_one.snapshot_index()
    snap_mesh = srv_mesh.snapshot_index()
    np.testing.assert_array_equal(snap_one.db, snap_mesh.db)
    np.testing.assert_array_equal(snap_one.db_image_ids,
                                  snap_mesh.db_image_ids)


def test_snapshot_preserves_db_dtype(models, tmp_path):
    """A bfloat16-database server's snapshot must record db_dtype so a
    restore keeps the half-HBM storage choice (ADVICE r2)."""
    import dataclasses
    sam_params, dino_params = models
    rng = np.random.default_rng(29)
    idx = dataclasses.replace(_index(rng), db_dtype="bfloat16")
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    srv = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=idx, full_hw=(H, W), sam_hw=(H // 2, W // 2),
        amg=amg, dino_layer=1, max_masks=32, top_images=5,
        db_capacity=300, mesh=None)
    srv.add_reference_images([_image(rng)])
    path = str(tmp_path / "snap16.npz")
    snap = srv.snapshot_index(path)
    assert snap.db_dtype == "bfloat16"
    loaded = ServingIndex.from_npz(path)
    assert loaded.db_dtype == "bfloat16"


def test_snapshot_roundtrip(models, tmp_path):
    """snapshot_index after incremental add+remove reloads into a server
    that answers identically (removed image's guard rows compacted)."""
    sam_params, dino_params = models
    rng = np.random.default_rng(13)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    srv = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=_index(rng), full_hw=(H, W), sam_hw=(H // 2, W // 2),
        amg=amg, dino_layer=1, max_masks=32, top_images=5,
        db_capacity=400, mesh=None)
    a, b = _image(rng), _image(rng)
    ids = srv.add_reference_images([a, b])
    srv.remove_reference_image(ids[0])

    path = str(tmp_path / "snap.npz")
    idx2 = srv.snapshot_index(path)
    assert not np.any(np.all(idx2.db >= 5e5, axis=1))   # compacted
    loaded = ServingIndex.from_npz(path)
    np.testing.assert_array_equal(loaded.db, idx2.db)

    srv2 = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=idx2, full_hw=(H, W), sam_hw=(H // 2, W // 2),
        amg=amg, dino_layer=1, max_masks=32, top_images=5, mesh=None)
    q = _image(rng)
    np.testing.assert_array_equal(srv.query(q), srv2.query(q))


def test_snapshot_empty_database_roundtrip(models, tmp_path):
    """Removing every image then snapshotting yields an empty-but-loadable
    index (from_npz must not crash on empty db_image_ids)."""
    sam_params, dino_params = models
    rng = np.random.default_rng(17)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    idx = _index(rng, n_segs=20, n_images=4)
    srv = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=idx, full_hw=(H, W), sam_hw=(H // 2, W // 2),
        amg=amg, dino_layer=1, max_masks=32, top_images=5,
        db_capacity=100, mesh=None)
    for i in range(4):
        srv.remove_reference_image(i)
    path = str(tmp_path / "empty.npz")
    snap = srv.snapshot_index(path)
    assert len(snap.db) == 0
    loaded = ServingIndex.from_npz(path)
    assert len(loaded.db) == 0
    # the snapshot records the TRUE image-id bound (ids 0-3 were used,
    # removal does not reclaim them) — NOT the server's inflated Borda
    # bin capacity (srv.num_ref_images includes unused headroom)
    assert loaded.num_ref_images == 4


def test_fused_front_matches_unfused_chain(server):
    """The single-dispatch query front (_query_front_fused: preprocess →
    encode → scanned decode batches → select/NMS → pool + DINO) must
    reproduce the unfused stage chain exactly (the TPU A/B measured
    bit-identical top-k; this pins it on the CPU backend too)."""
    import jax.numpy as jnp
    from revisit_anything_tpu.pipeline.serve import _dino_desc_device

    rng = np.random.default_rng(23)
    img = _image(rng)
    img_dev = jax.device_put(img)

    pm_f, stats_f, desc_f = server._front(img_dev)

    masks_dev, stats_u = server._amg_device(img_dev)
    pm_u = server._pool(masks_dev, server._pool_a, server._pool_b)
    desc_u = _dino_desc_device(server.dino_params, server.dino_cfg,
                               img_dev, server.dino_layer,
                               server.dino_facet, server._crop)
    np.testing.assert_array_equal(np.asarray(pm_f), np.asarray(pm_u))
    np.testing.assert_allclose(np.asarray(stats_f), np.asarray(stats_u),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(desc_f), np.asarray(desc_u),
                               rtol=0, atol=1e-6)


def test_concurrent_inserts_are_serialized(models):
    """Two threads inserting concurrently must not corrupt the cursor or
    overwrite each other's row blocks (the insert path serializes on a
    lock; queries read the (db, ids) pair through one atomic load)."""
    from concurrent.futures import ThreadPoolExecutor
    sam_params, dino_params = models
    rng = np.random.default_rng(23)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    srv = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=_index(rng), full_hw=(H, W), sam_hw=(H // 2, W // 2),
        amg=amg, dino_layer=1, max_masks=32, top_images=5,
        db_capacity=800, mesh=None)
    imgs = [_image(rng) for _ in range(4)]
    with ThreadPoolExecutor(max_workers=4) as pool:
        id_lists = list(pool.map(
            lambda im: srv.add_reference_images([im]), imgs))
    ids = sorted(i for lst in id_lists for i in lst)
    assert ids == [20, 21, 22, 23]
    # every inserted image's rows are live and labeled with its own id
    db_ids = np.asarray(srv._db_ids[:srv._cursor])
    db = np.asarray(srv._db[:srv._cursor], np.float32)
    live = np.all(db < 1e5, axis=1)
    for iid in ids:
        assert np.any(live & (db_ids == iid)), iid


def test_snapshot_persists_true_image_count(models, tmp_path):
    """An incremental server's snapshot must record the TRUE image-id
    bound, not the Borda bin capacity — otherwise every
    snapshot/restore-with-db_capacity cycle inflates the bin space and
    pushes _next_image_id past the real images."""
    sam_params, dino_params = models
    rng = np.random.default_rng(29)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    srv = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=_index(rng), full_hw=(H, W), sam_hw=(H // 2, W // 2),
        amg=amg, dino_layer=1, max_masks=32, top_images=5,
        db_capacity=400, mesh=None)
    (new_id,) = srv.add_reference_images([_image(rng)])
    assert new_id == 20
    path = str(tmp_path / "snap.npz")
    idx2 = srv.snapshot_index(path)
    assert idx2.num_ref_images == 21           # 20 prebuilt + 1 added
    # restore with headroom again: the next image continues at 21
    srv2 = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=ServingIndex.from_npz(path), full_hw=(H, W),
        sam_hw=(H // 2, W // 2), amg=amg, dino_layer=1, max_masks=32,
        top_images=5, db_capacity=400, mesh=None)
    assert srv2._next_image_id == 21
    (nid,) = srv2.add_reference_images([_image(rng)])
    assert nid == 21
    # a second snapshot cycle does not inflate
    assert srv2.snapshot_index().num_ref_images == 22


def test_max_ref_images_below_existing_ids_rejected(models):
    sam_params, dino_params = models
    rng = np.random.default_rng(31)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    with pytest.raises(ValueError):
        SegVLADServer(
            sam_params=sam_params, sam_cfg=SAM_SMALL,
            dino_params=dino_params, dino_cfg=DINO_SMALL,
            index=_index(rng), full_hw=(H, W), sam_hw=(H // 2, W // 2),
            amg=amg, dino_layer=1, max_masks=32, top_images=5,
            db_capacity=400, max_ref_images=5, mesh=None)


def test_landscape_serving_pad_row_restriction(models):
    """Landscape inputs activate the decoder's pad-row skipping (SAM
    pads to a square; amg.resize_mats_and_rows drops zero-weight mask
    rows). The full serving AMG must still match the independent
    generate_masks harness mask-for-mask, and queries stay
    deterministic."""
    from revisit_anything_tpu.models.sam.amg import resize_mats_and_rows

    sam_params, dino_params = models
    rng = np.random.default_rng(41)
    hw = (84, 112)                       # landscape: input 96x128, gh 7/8
    input_hw = (96, 128)
    _, _, gh = resize_mats_and_rows(SAM_SMALL, input_hw, hw)
    assert gh < SAM_SMALL.grid           # restriction active

    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    srv = SegVLADServer(
        sam_params=sam_params, sam_cfg=SAM_SMALL,
        dino_params=dino_params, dino_cfg=DINO_SMALL,
        index=_index(rng), full_hw=hw, sam_hw=hw,
        amg=amg, dino_layer=1, max_masks=32, top_images=5)

    img = rng.integers(60, 200, hw + (3,), dtype=np.uint8)
    yy, xx = np.ogrid[:hw[0], :hw[1]]
    for _ in range(4):
        cy, cx = rng.integers(10, hw[0] - 10), rng.integers(10, hw[1] - 10)
        r = rng.integers(6, 16)
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = rng.integers(
            0, 255, 3)

    masks_dev, stats = srv._amg_device(jax.device_put(img))
    n = int(np.asarray(stats)[-1])
    records = generate_masks(sam_params, SAM_SMALL, img, amg, max_masks=32)
    assert n == len(records) > 0
    np.testing.assert_array_equal(
        np.asarray(masks_dev)[:n],
        np.stack([r.segmentation for r in records]))

    top1 = srv.query(img)
    top2 = srv.query(img)
    np.testing.assert_array_equal(top1, top2)
    assert top1.shape == (5,)
