"""SAM encoder/prompt/decoder parity vs a random-weight HF SamModel oracle."""

import numpy as np
import pytest
import torch

from revisit_anything_tpu.models import sam as sam_mod
from revisit_anything_tpu.models.sam import (
    SamArchConfig, convert_hf_sam_state_dict, decode_masks,
    dense_positional_embedding, embed_points, encode_image,
    no_mask_dense_embedding)

transformers = pytest.importorskip("transformers")
from transformers import (SamConfig, SamMaskDecoderConfig, SamModel,  # noqa
                          SamPromptEncoderConfig, SamVisionConfig)


IMG = 128          # image size → grid 8, lowres masks 32
DIM = 64
PD = 32            # prompt dim


def make_pair(depth=3, global_idx=(1,), window=4):
    vc = SamVisionConfig(
        hidden_size=DIM, num_hidden_layers=depth, num_attention_heads=4,
        image_size=IMG, patch_size=16, global_attn_indexes=list(global_idx),
        window_size=window, output_channels=PD, num_pos_feats=PD // 2,
        mlp_dim=DIM * 4)
    pc = SamPromptEncoderConfig(hidden_size=PD, image_embedding_size=IMG // 16,
                                image_size=IMG, num_pos_feats=PD // 2)
    mc = SamMaskDecoderConfig(hidden_size=PD, iou_head_hidden_dim=PD,
                              num_hidden_layers=2, num_attention_heads=4)
    torch.manual_seed(0)
    model = SamModel(SamConfig(vision_config=vc.to_dict(),
                               prompt_encoder_config=pc.to_dict(),
                               mask_decoder_config=mc.to_dict())).eval()
    # HF's random init leaves many weights ~0 (e.g. qkv ~1e-10), which
    # degenerates attention and would let a broken rel-pos/bias path pass
    # parity. Randomize EVERY parameter to exercise all paths.
    with torch.no_grad():
        for p in model.parameters():
            p.data.normal_(0, 0.05)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    cfg = SamArchConfig(
        encoder_dim=DIM, encoder_depth=depth, encoder_heads=4,
        global_attn_indexes=global_idx, image_size=IMG, patch_size=16,
        window_size=window, prompt_dim=PD, decoder_heads=4,
        decoder_mlp_dim=2048, iou_head_hidden=PD)
    params = convert_hf_sam_state_dict(sd, cfg)
    return model, cfg, params


def test_encoder_matches_hf(rng):
    model, cfg, params = make_pair()
    imgs = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    ours = np.asarray(encode_image(params, cfg, imgs))     # [B, 8, 8, PD]
    with torch.no_grad():
        ref = model.vision_encoder(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).last_hidden_state
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref.numpy(),
                               atol=5e-4)


def test_prompt_points_match_hf(rng):
    model, cfg, params = make_pair(depth=1)
    pts = (rng.random((1, 5, 1, 2)) * IMG).astype(np.float32)
    labels = np.ones((1, 5, 1), dtype=np.int64)
    with torch.no_grad():
        sparse, dense = model.prompt_encoder(
            input_points=torch.from_numpy(pts),
            input_labels=torch.from_numpy(labels),
            input_boxes=None, input_masks=None)
    ours = np.asarray(embed_points(
        params, cfg, pts[0], labels[0], pad=True))          # [5, 2, PD]
    np.testing.assert_allclose(ours, sparse.detach().numpy()[0], atol=1e-4)
    ours_dense = np.asarray(no_mask_dense_embedding(params, cfg, 1))
    np.testing.assert_allclose(ours_dense.transpose(0, 3, 1, 2),
                               dense.detach().numpy(), atol=1e-6)


def test_decoder_matches_hf_end_to_end(rng):
    """Full SamModel forward (encoder + prompts + decoder, multimask) vs
    our pipeline on the same random weights."""
    model, cfg, params = make_pair()
    imgs = rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32)
    pts = (rng.random((1, 6, 1, 2)) * IMG).astype(np.float32)
    labels = np.ones((1, 6, 1), dtype=np.int64)

    with torch.no_grad():
        out = model(pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                    input_points=torch.from_numpy(pts),
                    input_labels=torch.from_numpy(labels),
                    multimask_output=True)
    ref_masks = out.pred_masks.numpy()[0]      # [6, 3, 32, 32]
    ref_iou = out.iou_scores.numpy()[0]        # [6, 3]

    emb = encode_image(params, cfg, imgs)[0]
    sparse = embed_points(params, cfg, pts[0], labels[0], pad=True)
    dense = no_mask_dense_embedding(params, cfg, 6)
    pe = dense_positional_embedding(params, cfg)[0]
    masks, iou = decode_masks(params, cfg, emb, pe, sparse, dense,
                              multimask=True)
    np.testing.assert_allclose(np.asarray(iou), ref_iou, atol=5e-4)
    np.testing.assert_allclose(np.asarray(masks), ref_masks, atol=5e-3)


def test_encoder_nonzero_rel_pos_effect(rng):
    """Rel-pos bias must actually influence the output (guards against a
    silently ignored table)."""
    model, cfg, params = make_pair(depth=1, global_idx=())
    imgs = rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32)
    out1 = np.asarray(encode_image(params, cfg, imgs))
    params2 = params.copy()
    import jax.numpy as jnp
    blk = dict(params["encoder"]["blocks"][0])
    blk["rel_pos_h"] = jnp.zeros_like(blk["rel_pos_h"])
    blk["rel_pos_w"] = jnp.zeros_like(blk["rel_pos_w"])
    params2 = {**params, "encoder": {**params["encoder"], "blocks": [blk]}}
    out2 = np.asarray(encode_image(params2, cfg, imgs))
    assert np.abs(out1 - out2).max() > 1e-6


def test_singlemask_output_shape(rng):
    model, cfg, params = make_pair(depth=1)
    imgs = rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32)
    emb = encode_image(params, cfg, imgs)[0]
    pts = (rng.random((3, 1, 2)) * IMG).astype(np.float32)
    sparse = embed_points(params, cfg, pts, np.ones((3, 1)), pad=True)
    dense = no_mask_dense_embedding(params, cfg, 3)
    pe = dense_positional_embedding(params, cfg)[0]
    masks, iou = decode_masks(params, cfg, emb, pe, sparse, dense,
                              multimask=False)
    assert masks.shape == (3, 1, 32, 32)
    assert iou.shape == (3, 1)


def test_decoder_export_roundtrip(rng, tmp_path):
    """jax.export decoder serialization (the ONNX-export equivalent)."""
    from revisit_anything_tpu.models.sam import init_sam_params
    from revisit_anything_tpu.models.sam.export import (export_decoder,
                                                        load_decoder,
                                                        make_decode_fn)
    cfg = SamArchConfig(
        encoder_dim=DIM, encoder_depth=1, encoder_heads=4,
        global_attn_indexes=(), image_size=IMG, patch_size=16,
        window_size=4, prompt_dim=PD, decoder_heads=4,
        decoder_mlp_dim=128, iou_head_hidden=PD)
    import jax
    import jax.numpy as jnp
    params = init_sam_params(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "decoder.stablehlo")
    export_decoder(params, cfg, path, num_prompts=4)

    emb = jnp.asarray(rng.standard_normal(
        (cfg.grid, cfg.grid, PD)).astype(np.float32))
    pts = jnp.asarray((rng.random((4, 2)) * IMG).astype(np.float32))
    masks_ref, iou_ref = make_decode_fn(params, cfg, 4)(emb, pts)
    restored = load_decoder(path)
    masks, iou = restored(emb, pts)
    np.testing.assert_allclose(np.asarray(masks), np.asarray(masks_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(iou), np.asarray(iou_ref),
                               atol=1e-6)


def test_dense_shared_matches_unshared(rng):
    """decode_masks(dense_shared=True) must equal the general path when all
    dense prompts are identical (the AMG case)."""
    model, cfg, params = make_pair(depth=1)
    imgs = rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32)
    emb = encode_image(params, cfg, imgs)[0]
    pts = (rng.random((5, 1, 2)) * IMG).astype(np.float32)
    sparse = embed_points(params, cfg, pts, np.ones((5, 1)), pad=True)
    dense = no_mask_dense_embedding(params, cfg, 5)
    pe = dense_positional_embedding(params, cfg)[0]
    m1, i1 = decode_masks(params, cfg, emb, pe, sparse, dense,
                          multimask=True, dense_shared=False)
    m2, i2 = decode_masks(params, cfg, emb, pe, sparse, dense,
                          multimask=True, dense_shared=True)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=2e-5)


def test_probs_path_matches_shared(rng):
    """The probability-factored AMG decode (ops/decode_probs.py — the
    per-prompt image branch reconstructed from i2t softmax probabilities)
    must match the materialized shared path on identical inputs."""
    model, cfg, params = make_pair(depth=1)
    imgs = rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32)
    emb = encode_image(params, cfg, imgs)[0]
    pts = (rng.random((5, 1, 2)) * IMG).astype(np.float32)
    sparse = embed_points(params, cfg, pts, np.ones((5, 1)), pad=True)
    dense = no_mask_dense_embedding(params, cfg, 5)
    pe = dense_positional_embedding(params, cfg)[0]
    m_ref, i_ref = decode_masks(params, cfg, emb, pe, sparse, dense,
                                multimask=True, dense_shared=True,
                                block_layout=True, probs_path=False)
    m_probs, i_probs = decode_masks(params, cfg, emb, pe, sparse,
                                    dense, multimask=True,
                                    dense_shared=True,
                                    block_layout=True, probs_path=True)
    np.testing.assert_allclose(np.asarray(i_probs), np.asarray(i_ref),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(m_probs), np.asarray(m_ref),
                               atol=5e-4)


def test_mask_prompt_embedding_matches_hf(rng):
    """embed_masks (mask_downscaling conv stack) vs HF's SamMaskEmbedding
    on converted weights (prompt_encoder.py:51-60 path)."""
    import jax.numpy as jnp

    from revisit_anything_tpu.models.sam.prompt import embed_masks
    model, cfg, params = make_pair()
    g = cfg.grid
    mask_logits = rng.standard_normal((2, 4 * g, 4 * g)).astype(np.float32)
    ours = np.asarray(embed_masks(params, cfg, jnp.asarray(mask_logits)))
    with torch.no_grad():
        ref = model.prompt_encoder.mask_embed(
            torch.from_numpy(mask_logits[:, None]))     # [B, PD, g, g]
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref.numpy(),
                               atol=3e-5)


def test_predictor_mask_input_round(rng):
    """Two-round prediction: feed round-1 low-res logits back as the mask
    prompt (SamPredictor.predict mask_input, predictor.py:97-151)."""
    from revisit_anything_tpu.models.sam.predictor import SamPredictor
    model, cfg, params = make_pair()
    img = rng.integers(0, 255, (60, 100, 3), dtype=np.uint8)
    pred = SamPredictor(params, cfg)
    pred.set_image(img)
    pts = np.array([[50.0, 30.0]])
    labels = np.array([1])
    masks1, iou1, lowres1 = pred.predict(pts, labels)
    best = int(np.argmax(iou1))
    masks2, iou2, _ = pred.predict(pts, labels,
                                   mask_input=lowres1[best][None])
    assert masks2.shape == masks1.shape
    assert np.isfinite(iou2).all()
    # the mask prompt must actually change the dense embedding path
    assert not np.array_equal(masks1, masks2) or not np.allclose(iou1, iou2)


def test_mask_rows_restriction_bit_identical(rng):
    """Pad-row skipping (decode_masks mask_rows + resize grid_hw): for a
    landscape input the bottom embedding rows carry exactly zero weight
    in the composed unpad+resize matrices, so decoding only the content
    rows must be BIT-identical in the final threshold flags — and the
    restricted logits must be the exact prefix of the full ones."""
    import jax.numpy as jnp

    from revisit_anything_tpu.models.sam.amg import resize_mats_and_rows
    from revisit_anything_tpu.ops.maskresize import resize_flags_reference

    model, cfg, params = make_pair(depth=1)
    g = cfg.grid
    orig_hw, input_hw = (60, 100), (77, 128)    # landscape → pad rows
    wh, ww, gh = resize_mats_and_rows(cfg, input_hw, orig_hw)
    assert gh < g                               # restriction is active
    assert wh.shape == (orig_hw[0], 4 * gh)

    emb = jnp.asarray(rng.standard_normal(
        (g, g, PD)).astype(np.float32))
    pe = dense_positional_embedding(params, cfg)[0]
    pts = (rng.random((5, 1, 2)) * IMG).astype(np.float32)
    sparse = embed_points(params, cfg, pts, np.ones((5, 1)), pad=True)
    dense = no_mask_dense_embedding(params, cfg, 1)

    for probs in (False, True):
        full, iou_f = decode_masks(params, cfg, emb, pe, sparse, dense,
                                   multimask=True, dense_shared=True,
                                   block_layout=True, probs_path=probs)
        part, iou_p = decode_masks(params, cfg, emb, pe, sparse, dense,
                                   multimask=True, dense_shared=True,
                                   block_layout=True, probs_path=probs,
                                   mask_rows=gh)
        assert part.shape == (5, gh * g, 16, full.shape[3])
        # same math, different gemm M-dims → f32-associativity level only
        np.testing.assert_allclose(np.asarray(part, np.float32),
                                   np.asarray(full, np.float32)[:, :gh * g],
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(iou_p), np.asarray(iou_f))

    # The restriction itself is EXACT: with identical logits, dropping
    # the zero-weight pad-row columns cannot change a single flag bit.
    lowres = jnp.asarray(rng.standard_normal(
        (5, g * g, 16, 3)).astype(np.float32))
    wh_full = np.zeros((orig_hw[0], 4 * g), np.float32)
    wh_full[:, :4 * gh] = wh
    flags_full = np.asarray(resize_flags_reference(
        lowres, wh_full, ww, 0.0, 1.0))
    flags_part = np.asarray(resize_flags_reference(
        lowres[:, :gh * g], wh, ww, 0.0, 1.0, grid_hw=(gh, g)))
    np.testing.assert_array_equal(flags_part, flags_full)


def test_mask_rows_cpu_tpu_row_counts_agree(rng):
    """gh is backend-dependent at production dims (49 on CPU vs 50 on TPU
    at 240x320 — the Mosaic lane rounding): the final threshold flags must
    agree exactly, because every extra TPU column's composed resize weight
    is exactly 0.0. Pins the cross-backend contract documented in
    amg.resize_mats_and_rows (advisor r3 item 4)."""
    from revisit_anything_tpu.models.sam.amg import resize_mats_and_rows
    from revisit_anything_tpu.ops.maskresize import resize_flags_reference

    cfg = SamArchConfig(
        encoder_dim=DIM, encoder_depth=1, encoder_heads=4,
        global_attn_indexes=(), image_size=1024, patch_size=16,
        window_size=4, prompt_dim=PD, decoder_heads=4,
        decoder_mlp_dim=128, iou_head_hidden=PD)       # grid 64
    orig_hw, input_hw = (240, 320), (768, 1024)        # 17places half-res
    wh_c, ww_c, gh_c = resize_mats_and_rows(cfg, input_hw, orig_hw,
                                            on_tpu=False)
    wh_t, ww_t, gh_t = resize_mats_and_rows(cfg, input_hw, orig_hw,
                                            on_tpu=True)
    assert (gh_c, gh_t) == (49, 50)
    assert (gh_t * cfg.grid) % 128 == 0
    # the TPU matrices extend the CPU ones by exactly-zero columns
    np.testing.assert_array_equal(wh_t[:, :4 * gh_c], wh_c)
    np.testing.assert_array_equal(wh_t[:, 4 * gh_c:], 0.0)
    np.testing.assert_array_equal(ww_t, ww_c)

    g = cfg.grid
    lowres = rng.standard_normal((2, gh_t * g, 16, 3)).astype(np.float32)
    flags_t = np.asarray(resize_flags_reference(
        lowres, wh_t, ww_t, 0.0, 1.0, grid_hw=(gh_t, g)))
    flags_c = np.asarray(resize_flags_reference(
        lowres[:, :gh_c * g], wh_c, ww_c, 0.0, 1.0, grid_hw=(gh_c, g)))
    np.testing.assert_array_equal(flags_t, flags_c)


def test_resize_mats_full_height_is_noop():
    """Square/portrait-height inputs keep every token row."""
    from revisit_anything_tpu.models.sam.amg import resize_mats_and_rows
    cfg = SamArchConfig(
        encoder_dim=DIM, encoder_depth=1, encoder_heads=4,
        global_attn_indexes=(), image_size=IMG, patch_size=16,
        window_size=4, prompt_dim=PD, decoder_heads=4,
        decoder_mlp_dim=128, iou_head_hidden=PD)
    wh, ww, gh = resize_mats_and_rows(cfg, (IMG, 96), (100, 70))
    assert gh == cfg.grid
    assert wh.shape == (100, 4 * cfg.grid)


def test_encoder_flash_glue_matches_xla_path(rng):
    """The flash-attention glue in the encoder (bias construction,
    transposes, side wiring) is backend-gated and otherwise unreachable
    off-TPU; drive it through the kernel's interpret mode and pin it to
    the XLA branch (a swapped bias_h/bias_w or wrong transpose would
    silently corrupt all 4 global layers in production encodes)."""
    from revisit_anything_tpu.models.sam import encoder as enc

    cfg = SamArchConfig(
        encoder_dim=32, encoder_depth=1, encoder_heads=2,
        global_attn_indexes=(0,), image_size=512, patch_size=16,
        window_size=4, prompt_dim=32, decoder_heads=2,
        decoder_mlp_dim=64, iou_head_hidden=16)   # grid 32 → 1024 tokens
    params = sam_mod.init_sam_params(cfg, __import__("jax").random.PRNGKey(3))
    img = rng.standard_normal((1, 512, 512, 3)).astype(np.float32)

    ref = np.asarray(encode_image(params, cfg, img))
    assert enc._FLASH_OVERRIDE is None
    enc._FLASH_OVERRIDE = True
    try:
        got = np.asarray(encode_image(params, cfg, img))
    finally:
        enc._FLASH_OVERRIDE = None
    np.testing.assert_allclose(got, ref, atol=2e-4)
