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


def test_rmac_matches_cirtorch_oracle(rng):
    """Element parity with cnnimageretrieval-pytorch layers.functional
    rmac (the reference RMAC's LF.rmac), incl. the global region and the
    overlap-search region counts on a non-square map."""
    import math
    import torch
    import torch.nn.functional as F

    def cirtorch_rmac(x, L=3, eps=1e-6):
        ovr = 0.4
        steps = torch.Tensor([2, 3, 4, 5, 6, 7])
        W = x.size(3); H = x.size(2)
        w = min(W, H)
        b = (max(H, W) - w) / (steps - 1)
        (_, idx) = torch.min(
            torch.abs(((w ** 2 - w * b) / w ** 2) - ovr), 0)
        Wd = 0; Hd = 0
        if H < W:
            Wd = idx.item() + 1
        elif H > W:
            Hd = idx.item() + 1
        v = F.max_pool2d(x, (x.size(-2), x.size(-1)))
        v = v / (torch.norm(v, p=2, dim=1, keepdim=True) + eps).expand_as(v)
        for l in range(1, L + 1):
            wl = math.floor(2 * w / (l + 1))
            if wl == 0:
                continue
            wl2 = math.floor(wl / 2 - 1)
            b = 0 if l + Wd == 1 else (W - wl) / (l + Wd - 1)
            cenW = (torch.floor(wl2 + torch.Tensor(range(l - 1 + Wd + 1))
                                * b) - wl2)
            b = 0 if l + Hd == 1 else (H - wl) / (l + Hd - 1)
            cenH = (torch.floor(wl2 + torch.Tensor(range(l - 1 + Hd + 1))
                                * b) - wl2)
            for i_ in cenH.tolist():
                for j_ in cenW.tolist():
                    R = x[:, :, int(i_):int(i_) + wl, int(j_):int(j_) + wl]
                    vt = F.max_pool2d(R, (R.size(-2), R.size(-1)))
                    vt = vt / (torch.norm(vt, p=2, dim=1, keepdim=True)
                               + eps).expand_as(vt)
                    v += vt
        return v[:, :, 0, 0]

    x = rng.standard_normal((2, 16, 12, 17)).astype(np.float32)
    want = cirtorch_rmac(torch.tensor(x)).numpy()
    want = want / np.linalg.norm(want, axis=1, keepdims=True)
    got = np.asarray(rmac_pool(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mixvpr_flatten_order_matches_torch(rng):
    """torch MixVPR flattens [B, out_channels, out_rows] — verify via a
    minimal torch replica of the projection tail."""
    import torch
    p = mixvpr_init(jax.random.PRNGKey(2), in_channels=6, in_h=3, in_w=4,
                    out_channels=5, out_rows=2, mix_depth=1)
    x = rng.standard_normal((1, 6, 3, 4)).astype(np.float32)
    got = np.asarray(mixvpr_forward(p, x))

    xt = torch.tensor(x).flatten(2)                      # [B, C, HW]
    # replicate the mixer
    import torch.nn.functional as F
    mx = p["mixers"][0]
    h = F.layer_norm(xt, (12,), torch.tensor(np.asarray(mx["ln"]["scale"])),
                     torch.tensor(np.asarray(mx["ln"]["bias"])), eps=1e-5)
    h = torch.relu(h @ torch.tensor(np.asarray(mx["fc1"]["w"])) +
                   torch.tensor(np.asarray(mx["fc1"]["b"])))
    h = h @ torch.tensor(np.asarray(mx["fc2"]["w"])) + \
        torch.tensor(np.asarray(mx["fc2"]["b"]))
    xt = xt + h
    xt = xt.permute(0, 2, 1) @ torch.tensor(np.asarray(
        p["channel_proj"]["w"])) + torch.tensor(np.asarray(
            p["channel_proj"]["b"]))                     # [B, HW, O]
    xt = (xt.permute(0, 2, 1) @ torch.tensor(np.asarray(
        p["row_proj"]["w"]))) + torch.tensor(np.asarray(
            p["row_proj"]["b"]))                         # [B, O, R]
    want = F.normalize(xt.flatten(1), dim=-1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_netvlad_init_reference_alpha(rng):
    """init_params semantics (aggregation.py:239-257): alpha from the
    top-2 assignment gap, weights alpha * normalized centers."""
    from revisit_anything_tpu.training.aggregators import (
        netvlad_init_from_cluster_centers)
    centers = rng.standard_normal((8, 16)).astype(np.float32)
    descs = rng.standard_normal((100, 16)).astype(np.float32)
    p = netvlad_init_from_cluster_centers(centers, descriptors=descs)
    cn = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    dots = np.sort(cn @ descs.T, axis=0)[::-1]
    alpha = -np.log(0.01) / np.mean(dots[0] - dots[1])
    np.testing.assert_allclose(np.asarray(p["assign_w"]),
                               (alpha * cn).T, rtol=1e-5)
