"""Segment-VLAD parity vs a float64 torch oracle of the reference math."""

import numpy as np
import torch
import torch.nn.functional as F

from revisit_anything_tpu.ops.vlad import (
    global_vlad, hard_assignment, l2_normalize, segment_vlad)


def oracle_segment_vlad(desc, centers, masks, adj):
    """Independent float64 oracle of vlad_single + vlad_matmuls_per_cluster
    (func_vpr.py:1140-1210): hard labels from normalized centers, residuals
    vs raw centers, per-cluster `bool(adj @ masks_c) @ residuals_c`,
    intra-norm, concat, L2-norm."""
    q = torch.from_numpy(desc).double()
    c = torch.from_numpy(centers).double()
    m = torch.from_numpy(masks).double()
    a = (torch.from_numpy(adj).double() if adj is not None
         else torch.eye(len(masks)).double())

    labels = torch.argmax(q @ F.normalize(c, dim=1).T, dim=1)
    residuals = q - c[labels]
    num_c = centers.shape[0]
    vlads = []
    for li in range(num_c):
        inds = torch.where(labels == li)[0]
        nbr = (a @ m[:, inds]).bool().double()
        v = nbr @ residuals[inds, :]
        vlads.append(F.normalize(v, dim=1))
    out = torch.stack(vlads).permute(1, 0, 2).reshape(len(masks), -1)
    return F.normalize(out, dim=1).numpy()


def make_case(rng, P=120, D=64, M=9, C=8):
    desc = rng.standard_normal((P, D)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    centers = rng.standard_normal((C, D)).astype(np.float32)
    masks = rng.random((M, P)) > 0.7
    masks[0] = False  # padding-style empty mask row
    adj = rng.random((M, M)) > 0.6
    np.fill_diagonal(adj, True)
    return desc, centers, masks, adj


def test_segment_vlad_matches_oracle(rng):
    desc, centers, masks, adj = make_case(rng)
    ours = np.asarray(segment_vlad(desc, centers, masks, adj,
                                   num_clusters=centers.shape[0]))
    ref = oracle_segment_vlad(desc, centers, masks, adj)
    np.testing.assert_allclose(ours, ref, atol=5e-6)


def test_segment_vlad_no_adjacency(rng):
    desc, centers, masks, _ = make_case(rng)
    ours = np.asarray(segment_vlad(desc, centers, masks, None,
                                   num_clusters=centers.shape[0]))
    ref = oracle_segment_vlad(desc, centers, masks, None)
    np.testing.assert_allclose(ours, ref, atol=5e-6)


def test_empty_mask_row_is_zero(rng):
    desc, centers, masks, adj = make_case(rng)
    adj[0] = False  # fully disconnected padded row
    out = np.asarray(segment_vlad(desc, centers, masks, adj,
                                  num_clusters=centers.shape[0]))
    np.testing.assert_array_equal(out[0], 0.0)


def test_output_rows_unit_norm(rng):
    desc, centers, masks, adj = make_case(rng)
    out = np.asarray(segment_vlad(desc, centers, masks, adj,
                                  num_clusters=centers.shape[0]))
    norms = np.linalg.norm(out[1:], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_hard_assignment(rng):
    desc = rng.standard_normal((50, 16)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    centers = rng.standard_normal((4, 16)).astype(np.float32)
    labels = np.asarray(hard_assignment(desc, centers))
    cn = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    np.testing.assert_array_equal(labels, np.argmax(desc @ cn.T, axis=1))


def test_global_vlad_is_single_full_mask(rng):
    desc, centers, _, _ = make_case(rng)
    g = np.asarray(global_vlad(desc, centers, num_clusters=centers.shape[0]))
    full = np.ones((1, desc.shape[0]), dtype=bool)
    ref = oracle_segment_vlad(desc, centers, full, None)[0]
    np.testing.assert_allclose(g, ref, atol=5e-6)


def test_l2_normalize_zero_safe():
    x = np.zeros((2, 4), dtype=np.float32)
    out = np.asarray(l2_normalize(x))
    np.testing.assert_array_equal(out, 0.0)


def test_concat_center_residuals_matches_torch():
    import torch
    from revisit_anything_tpu.ops.vlad import concat_center_residuals
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 16)).astype(np.float32)
    desc = rng.standard_normal((20, 16)).astype(np.float32)
    tc, td = torch.tensor(centers), torch.tensor(desc)
    all_d = td[:, None, :] - tc[None]
    nall = all_d / all_d.norm(dim=-1, keepdim=True)
    cat = nall.reshape(20, -1)
    want = (cat / cat.norm(dim=-1, keepdim=True)).numpy()
    got = np.asarray(concat_center_residuals(centers, desc))
    np.testing.assert_allclose(got, want, atol=1e-5)
