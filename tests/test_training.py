"""Training subsystem tests: aggregators vs torch oracle, MS loss, and the
sharded train step on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from revisit_anything_tpu.models import dinov2 as dn
from revisit_anything_tpu.training import (
    create_train_state, gem_pool, make_sharded_train_step,
    multi_similarity_loss, netvlad_forward, netvlad_init, salad_forward,
    salad_init, train_step, VPRTrainConfig)
from revisit_anything_tpu.training.train import model_forward


def oracle_netvlad(x_np, assign_w, centroids, ab_params=None):
    """Independent torch float64 oracle of NetVLAD(+AntiBurst) semantics
    (aggregation.py:266-390)."""
    x = torch.from_numpy(x_np).double()               # [B, D, H, W]
    n, d = x.shape[:2]
    x = F.normalize(x, p=2, dim=1)
    xf = x.view(n, d, -1)
    sa = torch.softmax(
        torch.einsum("bdp,dc->bcp", xf, torch.from_numpy(assign_w).double()),
        dim=1)
    if ab_params is not None:
        dis = -2 + 2 * xf.permute(0, 2, 1) @ xf
        w = torch.sigmoid(ab_params[0] * dis + ab_params[1]).sum(-1) \
            ** ab_params[2]
        sa = sa / w[:, None, :]
    c = torch.from_numpy(centroids).double()          # [C, D]
    vlad = torch.einsum("bcp,bdp->bcd", sa, xf) - sa.sum(-1)[..., None] * c
    vlad = F.normalize(vlad, p=2, dim=2).reshape(n, -1)
    return F.normalize(vlad, p=2, dim=1).numpy()


def test_netvlad_matches_oracle(rng):
    p = netvlad_init(jax.random.PRNGKey(0), dim=32, clusters=8,
                     antiburst=False)
    x = rng.standard_normal((2, 32, 4, 5)).astype(np.float32)
    ours = np.asarray(netvlad_forward(p, x))
    ref = oracle_netvlad(x, np.asarray(p["assign_w"]),
                         np.asarray(p["centroids"]))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_netvlad_antiburst_matches_oracle(rng):
    p = netvlad_init(jax.random.PRNGKey(1), dim=16, clusters=4,
                     antiburst=True, ab_w=5.0, ab_b=-2.0, ab_p=1.5)
    x = rng.standard_normal((3, 16, 3, 4)).astype(np.float32)
    ours = np.asarray(netvlad_forward(p, x))
    ref = oracle_netvlad(x, np.asarray(p["assign_w"]),
                         np.asarray(p["centroids"]), [5.0, -2.0, 1.5])
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_gem_matches_oracle(rng):
    x = np.abs(rng.standard_normal((2, 8, 6, 6))).astype(np.float32)
    ours = np.asarray(gem_pool(x, p=3.0))
    t = torch.from_numpy(x)
    ref = F.avg_pool2d(t.clamp(min=1e-6).pow(3), (6, 6)).pow(1. / 3)
    np.testing.assert_allclose(ours, ref.squeeze(-1).squeeze(-1).numpy(),
                               atol=1e-5)


def test_salad_runs_and_normalized(rng):
    p = salad_init(jax.random.PRNGKey(2), dim=32, num_clusters=8,
                   cluster_dim=16, token_dim=24)
    x = rng.standard_normal((2, 32, 4, 4)).astype(np.float32)
    out = np.asarray(salad_forward(p, x))
    assert out.shape == (2, 24 + 8 * 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def oracle_ms_loss(emb, labels, alpha=1.0, beta=50.0, base=0.0, eps=0.1):
    """Independent numpy oracle of MS miner + loss (dot-product sims,
    cosine miner)."""
    n = len(labels)
    sims = emb @ emb.T
    cos = (emb / np.linalg.norm(emb, axis=1, keepdims=True))
    cos = cos @ cos.T
    total, active = 0.0, 0
    for i in range(n):
        pos = [j for j in range(n) if labels[j] == labels[i] and j != i]
        neg = [j for j in range(n) if labels[j] != labels[i]]
        max_neg = max((cos[i, j] for j in neg), default=-np.inf)
        min_pos = min((cos[i, j] for j in pos), default=np.inf)
        pos = [j for j in pos if cos[i, j] < max_neg + eps]
        neg = [j for j in neg if cos[i, j] > min_pos - eps]
        if not pos and not neg:
            continue
        active += 1
        lp = np.log1p(sum(np.exp(-alpha * (sims[i, j] - base)) for j in pos))
        ln = np.log1p(sum(np.exp(beta * (sims[i, j] - base)) for j in neg))
        total += lp / alpha + ln / beta
    return total / max(active, 1)


def test_ms_loss_matches_oracle(rng):
    emb = rng.standard_normal((12, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = np.repeat(np.arange(3), 4)
    ours = float(multi_similarity_loss(emb, labels))
    ref = oracle_ms_loss(emb.astype(np.float64), labels)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_ms_loss_separable_clusters_lower(rng):
    # well-separated embeddings → lower loss than random
    sep = np.eye(4, 16, dtype=np.float32)[np.repeat(np.arange(4), 3)]
    labels = np.repeat(np.arange(4), 3)
    rnd = rng.standard_normal((12, 16)).astype(np.float32)
    rnd /= np.linalg.norm(rnd, axis=1, keepdims=True)
    assert float(multi_similarity_loss(sep, labels)) < \
        float(multi_similarity_loss(rnd, labels))


TINY = VPRTrainConfig(
    backbone=dn.DinoV2Config(embed_dim=32, depth=3, num_heads=2, ffn="mlp",
                             pretrain_grid=(4, 4)),
    num_trainable_blocks=1, clusters=4, total_steps=100, warmup_steps=10)


def test_train_step_reduces_loss(rng):
    state = create_train_state(TINY, jax.random.PRNGKey(0))
    imgs = rng.standard_normal((8, 56, 56, 3)).astype(np.float32)
    labels = np.repeat(np.arange(2), 4)
    params, opt_state, step = state.params, state.opt_state, state.step
    losses = []
    for _ in range(8):
        params, opt_state, step, loss = train_step(
            params, opt_state, step, TINY, imgs, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(step) == 8


def test_frozen_prefix_not_updated(rng):
    state = create_train_state(TINY, jax.random.PRNGKey(0))
    imgs = rng.standard_normal((4, 56, 56, 3)).astype(np.float32)
    labels = np.array([0, 0, 1, 1])
    # snapshot BEFORE the step: train_step donates its inputs
    before = np.array(state.params["backbone"]["blocks"][0]["qkv"]["w"])
    b2 = np.array(state.params["backbone"]["blocks"][2]["qkv"]["w"])
    p, o, s, _ = train_step(state.params, state.opt_state, state.step,
                            TINY, imgs, labels)
    after = np.asarray(p["backbone"]["blocks"][0]["qkv"]["w"])
    np.testing.assert_array_equal(before, after)
    # trainable last block DID change
    a2 = np.asarray(p["backbone"]["blocks"][2]["qkv"]["w"])
    assert np.abs(b2 - a2).max() > 0


def test_sharded_train_step(rng):
    from revisit_anything_tpu.parallel import make_mesh
    mesh = make_mesh((4, 2), ("data", "model"))
    state = create_train_state(TINY, jax.random.PRNGKey(0))
    step_fn, params_s, opt_s = make_sharded_train_step(
        mesh, TINY, state.params, state.opt_state)
    imgs = rng.standard_normal((8, 56, 56, 3)).astype(np.float32)
    labels = np.repeat(np.arange(2), 4)
    p, o, s, loss = step_fn(params_s, opt_s, state.step, imgs, labels)
    assert np.isfinite(float(loss))
    p, o, s, loss2 = step_fn(p, o, s, imgs, labels)
    assert np.isfinite(float(loss2))


def test_sharded_step_matches_unsharded(rng):
    """dp x tp sharding must not change the training math (up to float
    reduction order)."""
    from revisit_anything_tpu.parallel import make_mesh
    mesh = make_mesh((4, 2), ("data", "model"))
    state = create_train_state(TINY, jax.random.PRNGKey(0))
    imgs = rng.standard_normal((8, 56, 56, 3)).astype(np.float32)
    labels = np.repeat(np.arange(2), 4)

    # unsharded reference step (fresh copy of state)
    s2 = create_train_state(TINY, jax.random.PRNGKey(0))
    p_ref, o_ref, _, loss_ref = train_step(
        s2.params, s2.opt_state, s2.step, TINY, imgs, labels)

    step_fn, params_s, opt_s = make_sharded_train_step(
        mesh, TINY, state.params, state.opt_state)
    p_sh, o_sh, _, loss_sh = step_fn(params_s, opt_s, state.step,
                                     imgs, labels)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-4)
    # updated parameters agree across the mesh partitioning
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4)


def oracle_triplet_all(emb, labels, margin=0.1):
    d = np.sqrt(np.maximum(
        ((emb[:, None] - emb[None]) ** 2).sum(-1), 1e-12))
    total, count = 0.0, 0
    n = len(labels)
    for a in range(n):
        for p in range(n):
            if p == a or labels[p] != labels[a]:
                continue
            for ng in range(n):
                if labels[ng] == labels[a]:
                    continue
                v = d[a, p] - d[a, ng] + margin
                if v > 0:
                    total += v
                    count += 1
    return total / max(count, 1)


def test_triplet_loss_matches_oracle(rng):
    from revisit_anything_tpu.training.losses import triplet_margin_loss
    emb = rng.standard_normal((8, 8)).astype(np.float32)
    labels = np.repeat(np.arange(2), 4)
    # un-normalized input: the loss L2-normalizes first (PML LpDistance
    # defaults normalize_embeddings=True), so the oracle compares on the
    # normalized embeddings
    ours = float(triplet_margin_loss(emb, labels, margin=0.2))
    emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    ref = oracle_triplet_all(emb_n.astype(np.float64), labels, 0.2)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_contrastive_and_ntxent_behave(rng):
    from revisit_anything_tpu.training.losses import (contrastive_loss,
                                                      get_loss, ntxent_loss)
    labels = np.repeat(np.arange(3), 3)
    sep = np.eye(3, 12, dtype=np.float32)[np.repeat(np.arange(3), 3)] * 5
    rnd = rng.standard_normal((9, 12)).astype(np.float32)
    for loss in (contrastive_loss, ntxent_loss):
        assert float(loss(sep, labels)) < float(loss(rnd, labels))
    assert get_loss("NTXentLoss") is ntxent_loss
    import pytest
    with pytest.raises(NotImplementedError):
        get_loss("FancyLoss")


def oracle_netvlad_nvpca(x_np, params, mode):
    """torch transcription of the nv_pca branches
    (aggregation.py:275-288): normalize → project → re-normalize → NetVLAD."""
    x = torch.from_numpy(x_np).double()
    n, d = x.shape[:2]
    x = F.normalize(x, p=2, dim=1)
    xf = x.view(n, d, -1)
    t = lambda a: torch.from_numpy(np.asarray(a)).double()
    if mode == "rot":
        xf = xf - t(params["pca_mean"])[None, :, None]
        xf = (xf.permute(0, 2, 1) @ t(params["pca_rot"]).T).permute(0, 2, 1)
    elif mode == "fc":
        xf = (xf.permute(0, 2, 1) @ t(params["bottleneck"]["w"])
              + t(params["bottleneck"]["b"])).permute(0, 2, 1)
    else:
        m = params["nv_mlp"]
        h = torch.relu(xf.permute(0, 2, 1) @ t(m["fc1"]["w"])
                       + t(m["fc1"]["b"]))
        xf = (h @ t(m["fc2"]["w"]) + t(m["fc2"]["b"])).permute(0, 2, 1)
    xf = F.normalize(xf, p=2, dim=1)
    sa = torch.softmax(
        torch.einsum("bdp,dc->bcp", xf, t(params["assign_w"])), dim=1)
    c = t(params["centroids"])
    vlad = torch.einsum("bcp,bdp->bcd", sa, xf) - sa.sum(-1)[..., None] * c
    vlad = F.normalize(vlad, p=2, dim=2).reshape(n, -1)
    return F.normalize(vlad, p=2, dim=1).numpy()


def test_netvlad_nv_pca_matches_oracle(rng):
    """nv_pca pre-projection (192-PrePool configs): all three modes vs a
    torch oracle."""
    x = rng.standard_normal((2, 32, 4, 4)).astype(np.float32)
    for i, mode in enumerate(("rot", "fc", "mlp")):
        p = netvlad_init(jax.random.PRNGKey(10 + i), dim=32, clusters=8,
                         antiburst=False, nv_pca=12, nv_pca_mode=mode)
        assert p["assign_w"].shape == (12, 8)
        assert p["centroids"].shape == (8, 12)
        ours = np.asarray(netvlad_forward(p, x))
        ref = oracle_netvlad_nvpca(x, p, mode)
        np.testing.assert_allclose(ours, ref, atol=3e-5, err_msg=mode)
        assert ours.shape == (2, 8 * 12)


def test_crn_matches_torch_oracle(rng):
    """CRN aggregator (aggregation.py:471-563) vs a torch transcription:
    avgpool(3,2,ceil) → multiscale convs → relu → fixed 1x1 acc → relu →
    2x bilinear upsample mask reweighting the soft assignment."""
    from revisit_anything_tpu.training.aggregators import (crn_forward,
                                                           crn_init)
    dim, clusters = 16, 4
    p = crn_init(jax.random.PRNGKey(3), dim, clusters)
    x_np = rng.standard_normal((2, dim, 8, 8)).astype(np.float32)
    ours = np.asarray(crn_forward(p, x_np))
    assert ours.shape == (2, clusters * dim)

    x = torch.from_numpy(x_np)
    x = F.normalize(x, p=2, dim=1)
    xd = torch.nn.AvgPool2d(3, stride=2, padding=0, ceil_mode=True)(x)
    t = lambda a: torch.from_numpy(np.asarray(a))
    g3 = F.conv2d(xd, t(p["crn"]["f3"]["w"]).permute(3, 2, 0, 1),
                  t(p["crn"]["f3"]["b"]), padding=1)
    g5 = F.conv2d(xd, t(p["crn"]["f5"]["w"]).permute(3, 2, 0, 1),
                  t(p["crn"]["f5"]["b"]), padding=2)
    g7 = F.conv2d(xd, t(p["crn"]["f7"]["w"]).permute(3, 2, 0, 1),
                  t(p["crn"]["f7"]["b"]), padding=3)
    g = torch.relu(torch.cat([g3, g5, g7], dim=1))
    acc = F.conv2d(g, t(p["crn"]["acc_w"]).T[:, :, None, None],
                   t(p["crn"]["acc_b"]))
    mask = F.interpolate(torch.relu(acc), scale_factor=2, mode="bilinear")
    xf = x.view(2, dim, -1)
    sa = torch.softmax(
        torch.einsum("bdp,dc->bcp", xf, t(p["assign_w"])), dim=1)
    sa = sa * mask.view(2, 1, -1)
    c = t(p["centroids"])
    vlad = torch.einsum("bcp,bdp->bcd", sa, xf) - sa.sum(-1)[..., None] * c
    vlad = F.normalize(vlad, p=2, dim=2).reshape(2, -1)
    ref = F.normalize(vlad, p=2, dim=1).numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_lr_schedules_and_optimizers():
    """multistep/cosine schedules and sgd parity (vpr_model.py:187-226)."""
    import numpy as np
    from revisit_anything_tpu.training.train import (VPRTrainConfig,
                                                     make_schedule)
    import dataclasses
    base = VPRTrainConfig(lr=1.0, total_steps=100)

    ms = dataclasses.replace(base, lr_sched="multistep",
                             milestones=(10, 20), gamma=0.5)
    s = make_schedule(ms)
    assert float(s(5)) == 1.0
    assert float(s(15)) == 0.5
    assert float(s(25)) == 0.25

    cos = dataclasses.replace(base, lr_sched="cosine", cosine_t_max=50)
    s = make_schedule(cos)
    assert float(s(0)) == 1.0
    np.testing.assert_allclose(float(s(50)), 0.0, atol=1e-6)

    # sgd builds and takes a step on a tiny pytree
    import jax.numpy as jnp
    import optax
    from revisit_anything_tpu.training.train import make_optimizer
    from revisit_anything_tpu.models import dinov2 as dn
    tiny = dn.DinoV2Config(embed_dim=32, depth=2, num_heads=2,
                           ffn="mlp", pretrain_grid=(4, 4))
    cfg = dataclasses.replace(base, backbone=tiny,
                              num_trainable_blocks=1, clusters=4,
                              optimizer="sgd", lr=0.01)
    from revisit_anything_tpu.training.train import create_train_state
    import jax
    st = create_train_state(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, st.params)
    grads = jax.tree.map(jnp.ones_like, st.params)
    updates, _ = tx.update(grads, st.opt_state, st.params)
    agg_upd = jax.tree_util.tree_leaves(updates["aggregator"])
    assert any(float(jnp.abs(u).max()) > 0 for u in agg_upd)
