"""Resize parity vs torch F.interpolate (the reference's convention)."""

import numpy as np
import torch
import torch.nn.functional as F

from revisit_anything_tpu.ops.resize import (
    bilinear_resize_align_corners, nearest_resize)


def test_nearest_matches_torch_upsample(rng):
    x = rng.random((3, 120, 160)).astype(np.float32)
    ours = np.asarray(nearest_resize(x, (240, 320)))
    ref = F.interpolate(torch.from_numpy(x).unsqueeze(0), [240, 320],
                        mode="nearest").squeeze(0).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_nearest_matches_torch_downsample(rng):
    x = (rng.random((2, 77, 131)) > 0.5).astype(np.float32)
    ours = np.asarray(nearest_resize(x, (30, 51)))
    ref = F.interpolate(torch.from_numpy(x).unsqueeze(0), [30, 51],
                        mode="nearest").squeeze(0).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_nearest_bool_masks(rng):
    m = rng.random((4, 240, 320)) > 0.7
    ours = np.asarray(nearest_resize(m, (480, 640)))
    ref = F.interpolate(torch.from_numpy(m).float().unsqueeze(0), [480, 640],
                        mode="nearest").squeeze(0).bool().numpy()
    np.testing.assert_array_equal(ours, ref)


def test_bilinear_align_corners_matches_torch(rng):
    x = rng.random((5, 34, 45)).astype(np.float32)
    ours = np.asarray(bilinear_resize_align_corners(x, (480, 640)))
    ref = F.interpolate(torch.from_numpy(x).unsqueeze(0), [480, 640],
                        mode="bilinear", align_corners=True).squeeze(0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_identity_resize(rng):
    x = rng.random((2, 16, 24)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(nearest_resize(x, (16, 24))), x)
    np.testing.assert_array_equal(
        np.asarray(bilinear_resize_align_corners(x, (16, 24))), x)


def test_sincos_pos_embed_matches_reference_semantics():
    """Oracle check of the MAE-style sincos embedding (utilities.py:291-390)."""
    from revisit_anything_tpu.ops.posembed import (
        get_1d_sincos_pos_embed_from_grid, get_2d_sincos_pos_embed)
    pos = np.arange(5, dtype=np.float64)
    emb = get_1d_sincos_pos_embed_from_grid(8, pos)
    omega = 1.0 / 10000 ** (np.arange(4) / 4.0)
    np.testing.assert_allclose(emb[3, :4], np.sin(3 * omega), atol=1e-12)
    np.testing.assert_allclose(emb[3, 4:], np.cos(3 * omega), atol=1e-12)

    full = get_2d_sincos_pos_embed(16, 4, cls_token=True)
    assert full.shape == (17, 16)
    np.testing.assert_array_equal(full[0], 0.0)
