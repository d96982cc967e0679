"""Extra aggregators + soft VLAD + added fusion methods vs torch oracles."""

import jax
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from revisit_anything_tpu.ops.vlad import soft_global_vlad
from revisit_anything_tpu.retrieval.matching import get_matches_host
from revisit_anything_tpu.training.aggregators import (
    convap_forward, convap_init, cosplace_forward, cosplace_init, mac_pool,
    mixvpr_forward, mixvpr_init, rmac_pool, rrm_forward, rrm_init, spoc_pool)


def test_mac_spoc(rng):
    x = rng.standard_normal((2, 8, 5, 7)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(mac_pool(x)), x.max(axis=(2, 3)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(spoc_pool(x)), x.mean(axis=(2, 3)),
                               atol=1e-6)


def test_cosplace_matches_torch(rng):
    p = cosplace_init(jax.random.PRNGKey(0), 16, 8)
    x = rng.standard_normal((3, 16, 6, 6)).astype(np.float32)
    ours = np.asarray(cosplace_forward(p, x))

    t = torch.from_numpy(x)
    tx = F.normalize(t, p=2, dim=1)
    tx = F.avg_pool2d(tx.clamp(min=1e-6).pow(3.0), (6, 6)).pow(1 / 3.0)
    tx = tx.flatten(1) @ torch.from_numpy(np.asarray(p["fc_w"])) \
        + torch.from_numpy(np.asarray(p["fc_b"]))
    ref = F.normalize(tx, p=2, dim=1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_convap_matches_torch(rng):
    p = convap_init(jax.random.PRNGKey(1), 12, 6)
    x = rng.standard_normal((2, 12, 7, 9)).astype(np.float32)
    ours = np.asarray(convap_forward(p, x))

    conv = torch.nn.Conv2d(12, 6, 1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(
            np.asarray(p["conv_w"]).T[:, :, None, None]))
        conv.bias.copy_(torch.from_numpy(np.asarray(p["conv_b"])))
        tx = conv(torch.from_numpy(x))
        tx = torch.nn.functional.adaptive_avg_pool2d(tx, (2, 2))
        ref = F.normalize(tx.flatten(1), p=2, dim=1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mixvpr_shapes_and_norm(rng):
    p = mixvpr_init(jax.random.PRNGKey(2), in_channels=16, in_h=4, in_w=5,
                    out_channels=8, mix_depth=2, out_rows=3)
    x = rng.standard_normal((2, 16, 4, 5)).astype(np.float32)
    out = np.asarray(mixvpr_forward(p, x))
    assert out.shape == (2, 24)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_rmac_unit_norm_and_finite(rng):
    x = np.abs(rng.standard_normal((2, 8, 12, 16))).astype(np.float32)
    out = np.asarray(rmac_pool(x))
    assert out.shape == (2, 8)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-4)


def test_rrm_runs(rng):
    p = rrm_init(jax.random.PRNGKey(3), 16)
    x = rng.standard_normal((2, 16, 5, 5)).astype(np.float32)
    out = np.asarray(rrm_forward(p, x))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def oracle_soft_vlad(desc, centers, temp):
    """Literal torch float64 oracle of the reference soft branch
    (utilities.py:863-888): residual tensor [q, c, d], soft weights per
    cluster scale the sum over ALL (q, c) residuals."""
    q = torch.from_numpy(desc).double()
    c = torch.from_numpy(centers).double()
    res = q[:, None, :] - c[None, :, :]       # [Q, C, D]
    cos = F.cosine_similarity(q[:, None, :], c[None, :, :], dim=2)
    soft = torch.softmax(temp * cos, dim=1)
    chunks = []
    for k in range(c.shape[0]):
        w = soft[:, k][:, None, None]
        cd = (w * res).reshape(-1, c.shape[1]).sum(0)
        chunks.append(F.normalize(cd, dim=0))
    out = torch.cat(chunks)
    return F.normalize(out, dim=0).numpy()


def test_soft_vlad_matches_reference_semantics(rng):
    desc = rng.standard_normal((30, 12)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    centers = rng.standard_normal((5, 12)).astype(np.float32)
    ours = np.asarray(soft_global_vlad(desc, centers, soft_temp=2.0))
    ref = oracle_soft_vlad(desc, centers, 2.0)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_max_seg_methods(rng):
    n_r_img, segs_per, R = 6, 4, 5
    n_q_segs = 8
    matches = rng.integers(0, n_r_img * segs_per, (n_q_segs, R))
    sims = rng.random((n_q_segs, R))
    seg_ranges = [np.arange(0, 4), np.arange(4, 8)]
    im_inds = np.repeat(np.arange(n_r_img), segs_per)
    for method in ("max_seg", "max_seg_sim"):
        preds = get_matches_host(matches, sims, seg_ranges, im_inds,
                                 n=3, method=method)
        assert len(preds) == 2
        assert all(len(p) <= 3 for p in preds)
        # predictions are image ids that actually received rank-1 votes
        for rows, p in zip(seg_ranges, preds):
            voted = set(im_inds[matches[rows, 0]].tolist())
            assert set(p.tolist()) <= voted
