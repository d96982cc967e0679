"""DINOv1 extractor tests: strided grids, facets, log-bin vs torch oracle."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from revisit_anything_tpu.models import dinov1 as d1
from revisit_anything_tpu.models import dinov2 as dn

TINY = dn.DinoV2Config(embed_dim=32, depth=3, num_heads=2, patch_size=8,
                       layerscale=False, pretrain_grid=(4, 4))


def test_strided_grid():
    assert d1.strided_grid(64, 64, 8, 8) == (8, 8)
    assert d1.strided_grid(64, 64, 8, 4) == (15, 15)


def test_stride_override_token_count(rng):
    params = dn.init_params(TINY, jax.random.PRNGKey(0))
    imgs = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    full = np.asarray(d1.extract_dense(params, TINY, imgs, layer=1,
                                       facet="key", stride=8))
    dense = np.asarray(d1.extract_dense(params, TINY, imgs, layer=1,
                                        facet="key", stride=4))
    assert full.shape == (1, 16, 32)      # 4x4
    assert dense.shape == (1, 49, 32)     # 7x7
    assert np.isfinite(dense).all()


def test_full_stride_matches_dinov2_path(rng):
    """At stride == patch, the strided embed must equal the dinov2 value
    facet (same math, non-overlapping patches) — up to the DINOv1
    head-MINOR channel order (the reference ViTExtractor flattens
    [B, h, t, d] via permute(0, 2, 3, 1), dino_feature_extractor.py
    :394-397, while the AnyLoc DINOv2 extractor slices the raw fused
    qkv head-major, utilities.py:274-281)."""
    params = dn.init_params(TINY, jax.random.PRNGKey(1))
    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(d1.extract_dense(params, TINY, imgs, layer=2,
                                       facet="value", stride=8))
    ref = np.asarray(dn.extract_dense(params, TINY, imgs, layer=2,
                                      facet="value"))
    b, n, d = ref.shape
    hd = d // TINY.num_heads
    ref_head_minor = ref.reshape(b, n, TINY.num_heads, hd).transpose(
        0, 1, 3, 2).reshape(b, n, d)
    np.testing.assert_allclose(ours, ref_head_minor, atol=2e-5)


def oracle_log_bin(x_np, gh, gw, hierarchy=2):
    """Literal torch oracle of _log_bin (DINO/dino_feature_extractor.py
    :288-358), de-looped only over batch."""
    B, P, D = x_np.shape
    bin_x = torch.from_numpy(x_np).permute(0, 2, 1).reshape(B, D, gh, gw)
    avg_pools = []
    for k in range(hierarchy):
        win = 3 ** k
        pool = torch.nn.AvgPool2d(win, stride=1, padding=win // 2,
                                  count_include_pad=False)
        avg_pools.append(pool(bin_x))
    num_bins = 1 + 8 * hierarchy
    out = torch.zeros((B, D * num_bins, gh, gw))
    for y in range(gh):
        for x in range(gw):
            part = 0
            for k in range(hierarchy):
                ks = 3 ** k
                for i in range(y - ks, y + ks + 1, ks):
                    for j in range(x - ks, x + ks + 1, ks):
                        if i == y and j == x and k != 0:
                            continue
                        ti = max(0, min(i, gh - 1))
                        tj = max(0, min(j, gw - 1))
                        out[:, part * D:(part + 1) * D, y, x] = \
                            avg_pools[k][:, :, ti, tj]
                        part += 1
    return out.flatten(-2).permute(0, 2, 1).numpy()


def test_log_bin_matches_oracle(rng):
    gh, gw, D = 5, 6, 8
    x = rng.standard_normal((2, gh * gw, D)).astype(np.float32)
    ours = np.asarray(d1.log_bin(jnp.asarray(x), (gh, gw), hierarchy=2))
    ref = oracle_log_bin(x, gh, gw, 2)
    assert ours.shape == ref.shape == (2, 30, 8 * 17)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_configs_exist():
    assert set(d1.CONFIGS) == {"dino_vits8", "dino_vits16",
                               "dino_vitb8", "dino_vitb16"}


def test_strided_pos_embed_uses_interpolate_offset():
    """DINOv1's _fix_pos_enc interpolates with the +0.1 scale-factor
    offset (same as hub DINOv2); a non-pretrain grid must match the
    torch scale_factor oracle, not size-based interpolation."""
    import torch
    cfg = dn.DinoV2Config(embed_dim=32, depth=1, num_heads=2, patch_size=8,
                          ffn="mlp", layerscale=False, pretrain_grid=(6, 6))
    params = dn.init_params(cfg, jax.random.PRNGKey(0))
    gh, gw = 4, 9
    pos = np.asarray(params["pos_embed"], np.float32)
    grid = torch.from_numpy(
        pos[:, 1:].reshape(1, 6, 6, 32).transpose(0, 3, 1, 2))
    sy, sx = (gh + 0.1) / 6, (gw + 0.1) / 6
    want_pos = torch.nn.functional.interpolate(
        grid, scale_factor=(sy, sx), mode="bicubic",
        align_corners=False).permute(0, 2, 3, 1).reshape(
            1, gh * gw, 32).numpy()
    # the strided path delegates to dn.interpolate_pos_embed; check that
    # helper against the torch scale_factor oracle at this grid
    np.testing.assert_allclose(
        np.asarray(dn.interpolate_pos_embed(params, cfg, (gh, gw)))[:, 1:],
        want_pos, atol=1e-5)
