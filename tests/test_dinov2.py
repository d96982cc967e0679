"""DINOv2 forward parity vs a random-weight transformers Dinov2Model oracle.

Real checkpoints aren't downloadable in this environment; the architecture
is validated by converting a randomly-initialized HuggingFace Dinov2Model
state dict and comparing forwards (the converter doubles as the production
checkpoint importer)."""

import numpy as np
import pytest
import torch

from revisit_anything_tpu.models import dinov2 as dn

transformers = pytest.importorskip("transformers")
from transformers import Dinov2Config, Dinov2Model  # noqa: E402


def make_pair(swiglu=False, depth=3, dim=64, heads=4, grid=4):
    hf_cfg = Dinov2Config(
        hidden_size=dim, num_hidden_layers=depth, num_attention_heads=heads,
        intermediate_size=dim * 4, patch_size=14, image_size=14 * grid,
        use_swiglu_ffn=swiglu, layerscale_value=0.8)
    torch.manual_seed(0)
    model = Dinov2Model(hf_cfg).eval()
    # Non-trivial weights: default init gives tiny values; rescale a bit.
    sd = {k: v.numpy() for k, v in model.state_dict().items()
          if k != "embeddings.mask_token"}
    cfg = dn.DinoV2Config(embed_dim=dim, depth=depth, num_heads=heads,
                          ffn="swiglu" if swiglu else "mlp",
                          pretrain_grid=(grid, grid))
    params = dn.convert_transformers_state_dict(sd, cfg)
    return model, cfg, params


def run_hf(model, images_nhwc):
    x = torch.from_numpy(np.ascontiguousarray(
        images_nhwc.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        return model(x, output_hidden_states=True)


def test_forward_matches_transformers_mlp(rng):
    model, cfg, params = make_pair(swiglu=False)
    imgs = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    ours = np.asarray(dn.forward_tokens(params, cfg, imgs))
    ref = run_hf(model, imgs).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_forward_matches_transformers_swiglu(rng):
    model, cfg, params = make_pair(swiglu=True)
    imgs = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    ours = np.asarray(dn.forward_tokens(params, cfg, imgs))
    ref = run_hf(model, imgs).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_value_facet_matches_hook(rng):
    """extract_dense(..., facet='value') must equal the value-projection
    output captured by a forward hook — the reference's extraction scheme
    (utilities.py:249-281)."""
    layer = 2
    model, cfg, params = make_pair(swiglu=False, depth=4)
    imgs = rng.standard_normal((1, 56, 56, 3)).astype(np.float32)

    captured = {}
    mod = model.encoder.layer[layer].attention.attention.value
    h = mod.register_forward_hook(
        lambda m, i, o: captured.__setitem__("v", o.detach().numpy()))
    run_hf(model, imgs)
    h.remove()

    ours = np.asarray(dn.extract_dense(params, cfg, imgs, layer, "value"))
    ref = captured["v"][:, 1:]  # drop cls token like the reference
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_token_facet_matches_hidden_state(rng):
    layer = 1
    model, cfg, params = make_pair(swiglu=False, depth=4)
    imgs = rng.standard_normal((1, 56, 56, 3)).astype(np.float32)
    out = run_hf(model, imgs)
    # hidden_states[i] is the input of layer i; output of block `layer`
    # is hidden_states[layer+1] (pre final norm).
    ref = out.hidden_states[layer + 1].numpy()[:, 1:]
    ours = np.asarray(dn.extract_dense(params, cfg, imgs, layer, "token"))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_pos_embed_interpolation_matches_torch_bicubic(rng):
    """offset=0 reproduces size-based F.interpolate (HF semantics)."""
    import dataclasses
    _, cfg, params = make_pair(depth=1, grid=6)
    cfg = dataclasses.replace(cfg, interpolate_offset=0.0)
    pos = np.asarray(params["pos_embed"])  # [1, 1+36, 64]
    ours = np.asarray(dn.interpolate_pos_embed(params, cfg, (3, 8)))
    grid = torch.from_numpy(pos[:, 1:].reshape(1, 6, 6, 64).transpose(0, 3, 1, 2))
    ref_patch = torch.nn.functional.interpolate(
        grid, size=(3, 8), mode="bicubic", align_corners=False
    ).permute(0, 2, 3, 1).reshape(1, 24, 64).numpy()
    np.testing.assert_allclose(ours[:, 1:], ref_patch, atol=1e-5)
    np.testing.assert_allclose(ours[:, :1], pos[:, :1], atol=0)


def test_pos_embed_interpolation_hub_offset_semantics(rng):
    """The default (interpolate_offset=0.1) must match hub DINOv2's
    scale_factor-based F.interpolate (dinov2 vision_transformer.py
    interpolate_pos_encoding), which maps coordinates by the PROVIDED
    fractional factor — not by out/in."""
    _, cfg, params = make_pair(depth=1, grid=6)
    assert cfg.interpolate_offset == 0.1
    pos = np.asarray(params["pos_embed"])
    gh, gw = 3, 8
    ours = np.asarray(dn.interpolate_pos_embed(params, cfg, (gh, gw)))
    grid = torch.from_numpy(pos[:, 1:].reshape(1, 6, 6, 64).transpose(0, 3, 1, 2))
    sy, sx = (gh + 0.1) / 6, (gw + 0.1) / 6
    ref_patch = torch.nn.functional.interpolate(
        grid, scale_factor=(sy, sx), mode="bicubic", align_corners=False
    ).permute(0, 2, 3, 1).reshape(1, gh * gw, 64).numpy()
    np.testing.assert_allclose(ours[:, 1:], ref_patch, atol=1e-5)
    # and it must genuinely differ from the size-based mapping
    ref_size = torch.nn.functional.interpolate(
        grid, size=(gh, gw), mode="bicubic", align_corners=False
    ).permute(0, 2, 3, 1).reshape(1, gh * gw, 64).numpy()
    assert np.abs(ref_patch - ref_size).max() > 1e-4


def test_nonsquare_input(rng):
    model, cfg, params = make_pair(depth=2, grid=4)
    imgs = rng.standard_normal((1, 42, 70, 3)).astype(np.float32)  # 3x5 grid
    out = np.asarray(dn.forward_tokens(params, cfg, imgs))
    assert out.shape == (1, 1 + 15, 64)
    assert np.isfinite(out).all()


def test_preprocess_centers_and_crops(rng):
    imgs = rng.integers(0, 255, (1, 30, 33, 3), dtype=np.uint8)
    x = dn.preprocess(imgs)
    assert x.shape == (1, 28, 28, 3)
    assert abs(float(x.mean())) < 1.0


def test_init_params_forward_runs(rng):
    import jax
    cfg = dn.DinoV2Config(embed_dim=32, depth=2, num_heads=2,
                          ffn="swiglu", pretrain_grid=(4, 4))
    params = dn.init_params(cfg, jax.random.PRNGKey(0))
    imgs = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    out = np.asarray(dn.extract_dense(params, cfg, imgs, 1, "value"))
    assert out.shape == (2, 16, 32)
    assert np.isfinite(out).all()
