"""Automatic mask generator harness tests (small random SAM)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax

from revisit_anything_tpu.io.h5io import MaskRecord
from revisit_anything_tpu.models.sam import SamArchConfig, init_sam_params
from revisit_anything_tpu.models.sam.amg import (
    AmgConfig, build_point_grid, generate_masks, preprocess_image,
    resize_longest_side)
from revisit_anything_tpu.ops.resize import bilinear_resize_torch


SMALL = SamArchConfig(encoder_dim=64, encoder_depth=2, encoder_heads=4,
                      global_attn_indexes=(1,), image_size=128,
                      patch_size=16, window_size=4, prompt_dim=32,
                      decoder_heads=4, decoder_mlp_dim=128,
                      iou_head_hidden=32)


def test_point_grid_reference_semantics():
    g = build_point_grid(4)
    assert g.shape == (16, 2)
    # cell centers: offset 1/8, spacing 1/4
    np.testing.assert_allclose(sorted(set(g[:, 0])), [0.125, 0.375, 0.625, 0.875])
    # row-major over y: first 4 points share y
    assert len(set(g[:4, 1])) == 1


def test_resize_longest_side():
    assert resize_longest_side(480, 640, 1024) == (768, 1024)
    assert resize_longest_side(600, 800, 1024) == (768, 1024)
    assert resize_longest_side(256, 256, 1024) == (1024, 1024)


def test_bilinear_resize_matches_torch_half_pixel(rng):
    x = rng.standard_normal((5, 32, 32)).astype(np.float32)
    ours = np.asarray(bilinear_resize_torch(x, (128, 96)))
    ref = F.interpolate(torch.from_numpy(x).unsqueeze(0), (128, 96),
                        mode="bilinear", align_corners=False).squeeze(0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # downsample too (no antialias in torch default)
    ours = np.asarray(bilinear_resize_torch(x, (13, 17)))
    ref = F.interpolate(torch.from_numpy(x).unsqueeze(0), (13, 17),
                        mode="bilinear", align_corners=False).squeeze(0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_preprocess_pads_and_normalizes(rng):
    img = rng.integers(0, 255, (60, 100, 3), dtype=np.uint8)
    out, (nh, nw) = preprocess_image(img, SMALL)
    assert out.shape == (1, 128, 128, 3)
    assert (nh, nw) == (77, 128)
    # padding region is exactly zero
    assert np.all(out[0, nh:] == 0) and np.all(out[0, :, nw:] == 0)


@pytest.fixture(scope="module")
def small_sam():
    return init_sam_params(SMALL, jax.random.PRNGKey(0))


def permissive_cfg():
    return AmgConfig(points_per_side=8, points_per_batch=32,
                     pred_iou_thresh=-1e9, stability_score_thresh=0.0,
                     box_nms_thresh=0.7)


def test_generate_masks_record_consistency(rng, small_sam):
    img = rng.integers(0, 255, (60, 100, 3), dtype=np.uint8)
    records = generate_masks(small_sam, SMALL, img, permissive_cfg())
    assert len(records) > 0
    ious = [r.predicted_iou for r in records]
    assert ious == sorted(ious, reverse=True), "must be NMS keep order"
    for r in records[:10]:
        assert isinstance(r, MaskRecord)
        assert r.segmentation.shape == (60, 100)
        assert r.area == int(r.segmentation.sum())
        if r.area > 0:
            ys, xs = np.nonzero(r.segmentation)
            x0, y0, bw, bh = r.bbox
            assert x0 == xs.min() and y0 == ys.min()
            assert bw == xs.max() - xs.min() and bh == ys.max() - ys.min()
        assert 0 <= r.point_coords[0, 0] <= 100
        assert 0 <= r.point_coords[0, 1] <= 60


def test_generate_masks_nms_suppresses_duplicates(rng, small_sam):
    img = rng.integers(0, 255, (60, 100, 3), dtype=np.uint8)
    records = generate_masks(small_sam, SMALL, img, permissive_cfg())
    # no two kept boxes with IoU > 0.7
    def iou(a, b):
        ax0, ay0, aw, ah = a.bbox; bx0, by0, bw2, bh2 = b.bbox
        ax1, ay1 = ax0 + aw, ay0 + ah
        bx1, by1 = bx0 + bw2, by0 + bh2
        ix = max(0, min(ax1, bx1) - max(ax0, bx0))
        iy = max(0, min(ay1, by1) - max(ay0, by0))
        inter = ix * iy
        union = aw * ah + bw2 * bh2 - inter
        return inter / union if union else 0.0
    for i in range(min(len(records), 15)):
        for j in range(i + 1, min(len(records), 15)):
            assert iou(records[i], records[j]) <= 0.7 + 1e-6


def test_generate_masks_deterministic(rng, small_sam):
    img = rng.integers(0, 255, (40, 64, 3), dtype=np.uint8)
    r1 = generate_masks(small_sam, SMALL, img, permissive_cfg())
    r2 = generate_masks(small_sam, SMALL, img, permissive_cfg())
    assert len(r1) == len(r2)
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a.segmentation, b.segmentation)
        assert a.predicted_iou == b.predicted_iou


def test_strict_thresholds_filter_everything(rng, small_sam):
    img = rng.integers(0, 255, (40, 64, 3), dtype=np.uint8)
    strict = AmgConfig(points_per_side=4, points_per_batch=16,
                       pred_iou_thresh=1e9)
    assert generate_masks(small_sam, SMALL, img, strict) == []


def test_device_preprocess_matches_pil_upscale(rng):
    """For upscaled inputs the device preprocess is parity-exact with the
    PIL path (PIL bilinear == half-pixel bilinear when upscaling)."""
    import jax.numpy as jnp
    from revisit_anything_tpu.models.sam.amg import (_preprocess_device,
                                                     preprocess_image)
    img = rng.integers(0, 255, (60, 100, 3), dtype=np.uint8)
    host, input_hw = preprocess_image(img, SMALL)
    dev = np.asarray(_preprocess_device(jnp.asarray(img), SMALL, input_hw))
    # PIL rounds resized pixels to uint8 before normalization; the device
    # path stays float — differences are bounded by ~1 uint8 quantization
    # step (1/57.375 in normalized units).
    np.testing.assert_allclose(dev, host, atol=1.6 / 57.12)


def test_generate_masks_batch_matches_single(rng, small_sam):
    from revisit_anything_tpu.models.sam.amg import generate_masks_batch
    imgs = [rng.integers(0, 255, (60, 100, 3), dtype=np.uint8)
            for _ in range(3)]
    batched = generate_masks_batch(small_sam, SMALL, imgs, permissive_cfg())
    singles = [generate_masks(small_sam, SMALL, im, permissive_cfg())
               for im in imgs]
    assert len(batched) == 3
    for b, s in zip(batched, singles):
        assert len(b) == len(s)
        for rb, rs in zip(b, s):
            np.testing.assert_array_equal(rb.segmentation, rs.segmentation)
            # batch-3 vs batch-1 encoder gemms reduce in different
            # orders — scores agree to f32 ULP, not bit-exactly
            np.testing.assert_allclose(rb.predicted_iou, rs.predicted_iou,
                                       rtol=1e-5, atol=1e-7)


def test_generate_crop_boxes_matches_reference_math():
    """Oracle transcription of utils/amg.py:200-235 (crop_len, overlap,
    XYXY clamping)."""
    import math
    from revisit_anything_tpu.models.sam.amg import generate_crop_boxes

    for im_h, im_w, n_layers, ratio in [(480, 640, 1, 512 / 1500),
                                        (600, 800, 2, 0.3),
                                        (333, 777, 1, 0.2)]:
        boxes, layers = generate_crop_boxes((im_h, im_w), n_layers, ratio)
        assert boxes[0] == [0, 0, im_w, im_h] and layers[0] == 0
        exp_boxes, exp_layers = [[0, 0, im_w, im_h]], [0]
        short = min(im_h, im_w)
        for i in range(n_layers):
            nps = 2 ** (i + 1)
            ov = int(ratio * short * (2 / nps))
            cw = int(math.ceil((ov * (nps - 1) + im_w) / nps))
            ch = int(math.ceil((ov * (nps - 1) + im_h) / nps))
            for x0 in [int((cw - ov) * k) for k in range(nps)]:
                for y0 in [int((ch - ov) * k) for k in range(nps)]:
                    exp_boxes.append([x0, y0, min(x0 + cw, im_w),
                                      min(y0 + ch, im_h)])
                    exp_layers.append(i + 1)
        assert boxes == exp_boxes and layers == exp_layers
        assert len(boxes) == 1 + sum((2 ** (i + 1)) ** 2
                                     for i in range(n_layers))


def test_multicrop_generate(small_sam):
    """crop_n_layers=1: records from 5 crops, crop_box fields set, no two
    kept boxes overlap above crop_nms_thresh across crops."""
    params, cfg = small_sam, SMALL
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (60, 100, 3), dtype=np.uint8)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0,
                    crop_n_layers=1)
    records = generate_masks(params, cfg, img, amg)
    assert len(records) > 0
    crop_boxes = {r.crop_box for r in records}
    assert (0, 0, 100, 60) in crop_boxes or len(crop_boxes) >= 1
    for r in records:
        assert r.segmentation.shape == (60, 100)
        assert r.area == int(r.segmentation.sum()) and r.area > 0
        x0, y0, w_, h_ = r.crop_box                    # XYWH schema
        # mask must lie within its crop box
        ys, xs = np.nonzero(r.segmentation)
        assert xs.min() >= x0 and xs.max() < x0 + w_
        assert ys.min() >= y0 and ys.max() < y0 + h_

    def iou_of(a, b):
        inter = np.logical_and(a.segmentation, b.segmentation).sum()
        union = np.logical_or(a.segmentation, b.segmentation).sum()
        return inter / union if union else 0.0

    def box(r):
        ys, xs = np.nonzero(r.segmentation)
        return xs.min(), ys.min(), xs.max(), ys.max()

    def box_iou(r1, r2):
        ax0, ay0, ax1, ay1 = box(r1)
        bx0, by0, bx1, by1 = box(r2)
        ix = max(0, min(ax1, bx1) - max(ax0, bx0))
        iy = max(0, min(ay1, by1) - max(ay0, by0))
        inter = ix * iy
        ua = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
        return inter / ua if ua else 0.0

    for i in range(len(records)):
        for j in range(i + 1, len(records)):
            assert box_iou(records[i], records[j]) <= 0.7 + 1e-6


def test_multicrop_single_crop_equals_plain(small_sam):
    """crop_n_layers=0 through the multicrop entry must equal the plain
    path (same single full-image crop)."""
    from revisit_anything_tpu.models.sam.amg import _generate_multicrop
    params, cfg = small_sam, SMALL
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (60, 100, 3), dtype=np.uint8)
    amg = AmgConfig(points_per_side=6, points_per_batch=36,
                    pred_iou_thresh=-1e9, stability_score_thresh=0.0)
    plain = generate_masks(params, cfg, img, amg)
    multi = _generate_multicrop(params, cfg, img, amg, 512)
    assert len(plain) == len(multi)
    for a, b in zip(plain, multi):
        np.testing.assert_array_equal(a.segmentation, b.segmentation)
        assert a.predicted_iou == b.predicted_iou
