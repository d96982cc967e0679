"""Mask→patch-grid pooling parity vs the reference's resize+scatter scheme."""

import numpy as np
import torch
import torch.nn.functional as F

from revisit_anything_tpu.ops.masks import (
    mask_centroids, mask_pool_matrices, masks_to_boxes,
    pool_masks_to_patch_grid)


def reference_patch_masks(masks_np, dst_hw, patch=14):
    """Oracle: the reference's pixel→patch pipeline (torch nearest resize,
    then scatter through the clip(i//14) index table,
    place_rec_main.py:187-194 + func_vpr.py:1088-1092)."""
    H, W = dst_hw
    dh, dw = H // patch, W // patch
    idx = np.empty((H, W, 2), dtype=np.int64)
    for i in range(H):
        for j in range(W):
            idx[i, j] = [min(i // patch, dh - 1), min(j // patch, dw - 1)]
    ind = np.ravel_multi_index(idx.reshape(-1, 2).T, (dh, dw))

    m = torch.from_numpy(masks_np)
    m = F.interpolate(m.float().unsqueeze(0), [H, W],
                      mode="nearest").squeeze(0).bool().reshape(len(masks_np), -1)
    out = np.zeros((len(masks_np), dh * dw), dtype=bool)
    where = torch.argwhere(m).numpy()
    out[where[:, 0], ind[where[:, 1]]] = True
    return out


def test_pool_masks_matches_reference_halfres(rng):
    # SAM masks at half res (240x320), DINO at 480x640 — the 17places config.
    masks = rng.random((7, 240, 320)) > 0.95
    A, B = mask_pool_matrices((240, 320), (480, 640))
    ours = np.asarray(pool_masks_to_patch_grid(masks, A, B))
    ref = reference_patch_masks(masks, (480, 640))
    np.testing.assert_array_equal(ours, ref)


def test_pool_masks_matches_reference_same_res(rng):
    # AmsterTime: masks stored at full 256x256 resolution.
    masks = rng.random((5, 256, 256)) > 0.9
    A, B = mask_pool_matrices((256, 256), (256, 256))
    ours = np.asarray(pool_masks_to_patch_grid(masks, A, B))
    ref = reference_patch_masks(masks, (256, 256))
    np.testing.assert_array_equal(ours, ref)


def test_pool_masks_nondivisible_grid(rng):
    # 600x800 (VPAir): 600/14 = 42.86 → dh=42, 12 remainder rows fold into
    # the last patch row.
    masks = rng.random((3, 300, 400)) > 0.97
    A, B = mask_pool_matrices((300, 400), (600, 800))
    ours = np.asarray(pool_masks_to_patch_grid(masks, A, B))
    ref = reference_patch_masks(masks, (600, 800))
    np.testing.assert_array_equal(ours, ref)


def test_mask_centroids(rng):
    masks = rng.random((6, 64, 48)) > 0.8
    got = mask_centroids(masks)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        np.testing.assert_allclose(got[i], [xs.mean(), ys.mean()])


def test_masks_to_boxes(rng):
    masks = np.zeros((3, 32, 40), dtype=bool)
    masks[0, 4:10, 5:20] = True
    masks[1, 0, 39] = True
    # masks[2] empty
    boxes = np.asarray(masks_to_boxes(masks))
    np.testing.assert_array_equal(boxes[0], [5, 4, 19, 9])
    np.testing.assert_array_equal(boxes[1], [39, 0, 39, 0])
    np.testing.assert_array_equal(boxes[2], [0, 0, 0, 0])
