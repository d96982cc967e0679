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
