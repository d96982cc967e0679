"""Model registry smoke tests (small configs via monkeypatch)."""

import numpy as np
import pytest

from revisit_anything_tpu import hub


def test_unknown_name():
    with pytest.raises(KeyError):
        hub.load_model("nope")


def test_dinov1_small(rng, monkeypatch):
    from revisit_anything_tpu.models import dinov1 as d1
    from revisit_anything_tpu.models import dinov2 as dn
    tiny = dn.DinoV2Config(embed_dim=32, depth=2, num_heads=2, patch_size=8,
                           layerscale=False, pretrain_grid=(4, 4))
    monkeypatch.setitem(d1.CONFIGS, "dino_vits8", tiny)
    params, cfg, fwd = hub.load_model("dino_vits8", layer=1)
    out = np.asarray(fwd(params, rng.standard_normal(
        (1, 32, 32, 3)).astype(np.float32)))
    # reference default stride 4 (ViTExtractor __init__): 32px, patch 8,
    # stride 4 → 7x7 overlapping grid
    assert out.shape == (1, 49, 32)
    # explicit stride overrides: patch-stride gives the plain 4x4 grid
    _, _, fwd16 = hub.load_model("dino_vits8", layer=1, stride=8)
    out16 = np.asarray(fwd16(params, rng.standard_normal(
        (1, 32, 32, 3)).astype(np.float32)))
    assert out16.shape == (1, 16, 32)


def test_dinov2_small(rng, monkeypatch):
    from revisit_anything_tpu.models import dinov2 as dn
    tiny = dn.DinoV2Config(embed_dim=32, depth=2, num_heads=2, ffn="mlp",
                           pretrain_grid=(4, 4))
    monkeypatch.setitem(dn.CONFIGS, "dinov2_vits14", tiny)
    params, cfg, fwd = hub.load_model("dinov2_vits14", layer=1)
    out = np.asarray(fwd(params, rng.standard_normal(
        (1, 56, 56, 3)).astype(np.float32)))
    assert out.shape == (1, 16, 32)


def test_vlad_buff_random(rng, monkeypatch):
    from revisit_anything_tpu.models import dinov2 as dn
    tiny = dn.DinoV2Config(embed_dim=32, depth=2, num_heads=2, ffn="mlp",
                           pretrain_grid=(4, 4))
    monkeypatch.setattr(dn, "VIT_B14", tiny)
    params, cfg, fwd = hub.load_model("vlad_buff", clusters=4)
    out = np.asarray(fwd(params, rng.standard_normal(
        (2, 56, 56, 3)).astype(np.float32)))
    assert out.shape == (2, 4 * 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
