"""VLAD-BuFF import/inference tests (synthetic Lightning checkpoint)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from revisit_anything_tpu.models import dinov2 as dn
from revisit_anything_tpu.training.vladbuff import (
    convert_vladbuff_checkpoint, extract_dinonv_features, fit_wpca,
    global_descriptor)

TINY = dn.DinoV2Config(embed_dim=32, depth=2, num_heads=2, ffn="mlp",
                       pretrain_grid=(4, 4))


def synth_hub_state_dict(cfg, rng):
    """Random dinov2-hub-layout torch state dict for the backbone."""
    sd = {}
    d = cfg.embed_dim
    def w(*shape):
        return torch.from_numpy(
            rng.standard_normal(shape).astype(np.float32) * 0.05)
    sd["patch_embed.proj.weight"] = w(d, 3, 14, 14)
    sd["patch_embed.proj.bias"] = w(d)
    sd["cls_token"] = w(1, 1, d)
    gh, gw = cfg.pretrain_grid
    sd["pos_embed"] = w(1, 1 + gh * gw, d)
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = w(d); sd[f"{p}.norm1.bias"] = w(d)
        sd[f"{p}.attn.qkv.weight"] = w(3 * d, d)
        sd[f"{p}.attn.qkv.bias"] = w(3 * d)
        sd[f"{p}.attn.proj.weight"] = w(d, d)
        sd[f"{p}.attn.proj.bias"] = w(d)
        sd[f"{p}.ls1.gamma"] = w(d); sd[f"{p}.ls2.gamma"] = w(d)
        sd[f"{p}.norm2.weight"] = w(d); sd[f"{p}.norm2.bias"] = w(d)
        sd[f"{p}.mlp.fc1.weight"] = w(cfg.mlp_hidden, d)
        sd[f"{p}.mlp.fc1.bias"] = w(cfg.mlp_hidden)
        sd[f"{p}.mlp.fc2.weight"] = w(d, cfg.mlp_hidden)
        sd[f"{p}.mlp.fc2.bias"] = w(d)
    sd["norm.weight"] = w(d); sd["norm.bias"] = w(d)
    return sd


@pytest.fixture
def ckpt(rng):
    sd = {}
    for k, v in synth_hub_state_dict(TINY, rng).items():
        sd[f"backbone.model.{k}"] = v
    C, D = 8, TINY.embed_dim
    sd["aggregator.conv.weight"] = torch.from_numpy(
        rng.standard_normal((C, D, 1, 1)).astype(np.float32))
    sd["aggregator.centroids"] = torch.from_numpy(
        rng.standard_normal((C, D)).astype(np.float32))
    sd["aggregator.WPCA_16.weight"] = torch.from_numpy(
        rng.standard_normal((16, C * D, 1, 1)).astype(np.float32))
    sd["aggregator.WPCA_16.bias"] = torch.from_numpy(
        rng.standard_normal(16).astype(np.float32))
    return {k: v.numpy() for k, v in sd.items()}


def test_convert_and_forward(ckpt, rng):
    params = convert_vladbuff_checkpoint(ckpt, TINY)
    assert "wpca" in params
    imgs = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    feats = np.asarray(extract_dinonv_features(params, TINY,
                                               jnp.asarray(imgs)))
    assert feats.shape == (2, 32, 4, 4)
    desc = np.asarray(global_descriptor(params, TINY, jnp.asarray(imgs)))
    assert desc.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(desc, axis=1), 1.0, atol=1e-5)


def test_backbone_matches_token_facet(ckpt, rng):
    """dinoNV features are the full-depth token facet with final norm."""
    params = convert_vladbuff_checkpoint(ckpt, TINY)
    imgs = rng.standard_normal((1, 56, 56, 3)).astype(np.float32)
    feats = np.asarray(extract_dinonv_features(params, TINY,
                                               jnp.asarray(imgs)))
    tokens = np.asarray(dn.forward_tokens(params["backbone"], TINY,
                                          jnp.asarray(imgs)))
    np.testing.assert_allclose(
        feats.reshape(1, 32, 16).transpose(0, 2, 1), tokens[:, 1:],
        atol=1e-6)


def test_wpca_whitens(rng):
    x = rng.standard_normal((3000, 24)).astype(np.float32) @ \
        rng.standard_normal((24, 24)).astype(np.float32)
    wp = fit_wpca(jnp.asarray(x), 8)
    y = np.asarray(jnp.dot(jnp.asarray(x), wp["w"].T) + wp["b"])
    cov = np.cov(y.T)
    np.testing.assert_allclose(cov, np.eye(8), atol=0.15)
    np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=0.05)


def test_wpca_matches_sklearn_whitened_pca(rng):
    from sklearn.decomposition import PCA
    x = rng.standard_normal((500, 16)).astype(np.float64)
    wp = fit_wpca(jnp.asarray(x.astype(np.float32)), 4)
    y = np.asarray(jnp.dot(jnp.asarray(x.astype(np.float32)), wp["w"].T)
                   + wp["b"])
    ref = PCA(4, whiten=True).fit(x).transform(x)
    # same subspace up to per-component sign
    for i in range(4):
        dots = np.abs(y[:, i] @ ref) / (np.linalg.norm(y[:, i]) *
                                        np.linalg.norm(ref, axis=0))
        assert dots.max() > 0.99


def test_nv_pca_checkpoint_keys_convert(ckpt, rng):
    """Lightning checkpoints with nv_pca pre-projection layers map onto
    the aggregator params (aggregation.py:194-207 key layouts)."""
    C, D, K = 8, TINY.embed_dim, 12
    # rot mode
    sd = dict(ckpt)
    sd["aggregator.pca_mean"] = rng.standard_normal(D).astype(np.float32)
    sd["aggregator.pca_rot"] = rng.standard_normal(
        (K, D)).astype(np.float32)
    p = convert_vladbuff_checkpoint(sd, TINY)
    assert "pca_rot" in p["aggregator"]
    # fc mode wins over rot params (torch registers both)
    sd["aggregator.bottleneck.weight"] = rng.standard_normal(
        (K, D)).astype(np.float32)
    sd["aggregator.bottleneck.bias"] = rng.standard_normal(
        K).astype(np.float32)
    p = convert_vladbuff_checkpoint(sd, TINY)
    assert "bottleneck" in p["aggregator"]
    assert "pca_rot" not in p["aggregator"]
    assert p["aggregator"]["bottleneck"]["w"].shape == (D, K)


def test_hub_vlad_buff_nv_pca_wpca_roundtrip(rng, tmp_path, monkeypatch):
    """hub vlad_buff with nv_pca + baked WPCA round-trips through
    save_vladbuff_params/load and reproduces descriptors exactly
    (VERDICT r1 item 8 done-criterion, scaled down)."""
    import jax.numpy as jnp
    from revisit_anything_tpu import hub
    from revisit_anything_tpu.training.vladbuff import (
        bake_wpca, load_vladbuff_params, save_vladbuff_params)

    monkeypatch.setattr(dn, "VIT_B14", TINY)
    params, cfg, forward = hub.load_model("vlad_buff", clusters=8,
                                          nv_pca=12, nv_pca_mode="fc")
    assert "bottleneck" in params["aggregator"]

    imgs = rng.standard_normal((3, 56, 56, 3)).astype(np.float32)
    raw = np.asarray(forward(params, jnp.asarray(imgs)))
    assert raw.shape == (3, 8 * 12)

    descs = rng.standard_normal((64, 8 * 12)).astype(np.float32)
    baked = bake_wpca(params, jnp.asarray(descs), num_pcs=16)
    out = np.asarray(forward(baked, jnp.asarray(imgs)))
    assert out.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)

    path = save_vladbuff_params(str(tmp_path / "wpca16_last.npy"), baked)
    params2, _, forward2 = hub.load_model("vlad_buff", checkpoint=path)
    out2 = np.asarray(forward2(params2, jnp.asarray(imgs)))
    np.testing.assert_array_equal(out, out2)


def test_wpca_selection_prefers_matching_num_pcs(ckpt, rng):
    """add_pca.py add_module()s WPCA_{n} cumulatively over sorted
    --num_pcs, so a checkpoint can hold several; the converter must bake
    the LARGEST (the n the checkpoint is named for), not the first."""
    C, D = 8, TINY.embed_dim
    sd = dict(ckpt)
    # a second, larger WPCA module alongside the fixture's WPCA_16
    sd["aggregator.WPCA_24.weight"] = rng.standard_normal(
        (24, C * D, 1, 1)).astype(np.float32)
    sd["aggregator.WPCA_24.bias"] = np.zeros((24,), np.float32)
    params = convert_vladbuff_checkpoint(sd, TINY)
    assert params["wpca"]["w"].shape[0] == 24
