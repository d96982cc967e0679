"""Parity: the fully-fused decode tail (ops/decode_fused.py) vs the
split per-consumer probs kernels (the r3 path) through decode_masks —
identical op set up to f32 reassociation, so outputs must agree tightly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisit_anything_tpu.models.sam import (SamArchConfig, decode_masks,
                                             dense_positional_embedding,
                                             embed_points,
                                             init_sam_params,
                                             no_mask_dense_embedding)
from revisit_anything_tpu.models.sam import decoder as dec_mod

SAM_SMALL = SamArchConfig(encoder_dim=64, encoder_depth=1, encoder_heads=4,
                          global_attn_indexes=(), image_size=128,
                          patch_size=16, window_size=4, prompt_dim=32,
                          decoder_heads=4, decoder_mlp_dim=128,
                          iou_head_hidden=32)


@pytest.fixture(scope="module")
def setup():
    cfg = SAM_SMALL
    params = init_sam_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    g = cfg.grid
    emb = jnp.asarray(rng.standard_normal(
        (g, g, cfg.prompt_dim)).astype(np.float32))
    pe = dense_positional_embedding(params, cfg)[0]
    pts = (rng.random((5, 1, 2)) * cfg.image_size).astype(np.float32)
    sparse = embed_points(params, cfg, pts, np.ones((5, 1)), pad=True)
    dense = no_mask_dense_embedding(params, cfg, 1)
    return cfg, params, emb, pe, sparse, dense


def _run(setup, fused: str, tail_keys: str = "auto",
         tail_logits: str = "off", multimask: bool = True, **kw):
    cfg, params, emb, pe, sparse, dense = setup
    old = dec_mod._FUSED_TAIL
    old_keys = dec_mod._TAIL_KEYS
    old_logits = dec_mod._TAIL_LOGITS
    dec_mod._FUSED_TAIL = fused
    dec_mod._TAIL_KEYS = tail_keys
    dec_mod._TAIL_LOGITS = tail_logits
    # _FUSED_TAIL/_TAIL_KEYS/_TAIL_LOGITS are TRACE-time flags and
    # decode_masks is module-jitted: without clearing, the second flag
    # value would silently reuse the first value's cached computation
    # and the comparison would be self-vs-self.
    decode_masks.clear_cache()
    try:
        masks, iou = decode_masks(params, cfg, emb, pe, sparse, dense,
                                  multimask=multimask, dense_shared=True,
                                  block_layout=True, probs_path=True, **kw)
    finally:
        dec_mod._FUSED_TAIL = old
        dec_mod._TAIL_KEYS = old_keys
        dec_mod._TAIL_LOGITS = old_logits
        decode_masks.clear_cache()
    return np.asarray(masks, np.float32), np.asarray(iou, np.float32)


def test_fused_tail_matches_split_path(setup):
    m_split, iou_split = _run(setup, "off")
    m_fused, iou_fused = _run(setup, "on")
    assert m_fused.shape == m_split.shape
    np.testing.assert_allclose(m_fused, m_split, atol=2e-5)
    np.testing.assert_allclose(iou_fused, iou_split, atol=2e-5)


def test_fused_tail_matches_split_path_mask_rows(setup):
    """Pad-row restriction composes with the fused tail (the mask head
    consumes the kernel's p1/p2/c2m identically)."""
    cfg = setup[0]
    rows = cfg.grid - 2
    m_split, iou_split = _run(setup, "off", mask_rows=rows)
    m_fused, iou_fused = _run(setup, "on", mask_rows=rows)
    assert m_fused.shape[1] == rows * cfg.grid
    np.testing.assert_allclose(m_fused, m_split, atol=2e-5)
    np.testing.assert_allclose(iou_fused, iou_split, atol=2e-5)


def test_keys_emission_matches_probs_mask_head(setup):
    """The keys-emission mode (the kernel stores keys2 once, the mask
    head skips its reconstructions) vs the probs-consuming mask head —
    same arithmetic up to the recon LayerNorm's reassociation axis."""
    m_probs, iou_probs = _run(setup, "on", tail_keys="off")
    m_keys, iou_keys = _run(setup, "on", tail_keys="on")
    assert m_keys.shape == m_probs.shape
    np.testing.assert_allclose(m_keys, m_probs, atol=2e-5)
    np.testing.assert_allclose(iou_keys, iou_probs, atol=2e-5)


def test_keys_emission_matches_probs_mask_head_mask_rows(setup):
    cfg = setup[0]
    rows = cfg.grid - 2
    m_probs, _ = _run(setup, "on", tail_keys="off", mask_rows=rows)
    m_keys, _ = _run(setup, "on", tail_keys="on", mask_rows=rows)
    assert m_keys.shape[1] == rows * cfg.grid
    np.testing.assert_allclose(m_keys, m_probs, atol=2e-5)


def test_logits_emission_matches_keys_mode(setup):
    """The logits-emission mode (mask head + hypernetwork MLPs run
    INSIDE the tail kernel; the [M, D] branch never leaves VMEM) vs the
    keys-emission two-kernel path — identical op order, so outputs must
    agree to the rounding of the keys store (bit-level at f32)."""
    m_keys, iou_keys = _run(setup, "on", tail_keys="on")
    m_log, iou_log = _run(setup, "on", tail_keys="on", tail_logits="on")
    assert m_log.shape == m_keys.shape
    np.testing.assert_allclose(m_log, m_keys, atol=2e-5)
    np.testing.assert_allclose(iou_log, iou_keys, atol=2e-5)


def test_logits_emission_matches_keys_mode_mask_rows(setup):
    cfg = setup[0]
    rows = cfg.grid - 2
    m_keys, _ = _run(setup, "on", tail_keys="on", mask_rows=rows)
    m_log, _ = _run(setup, "on", tail_keys="on", tail_logits="on",
                    mask_rows=rows)
    assert m_log.shape[1] == rows * cfg.grid
    np.testing.assert_allclose(m_log, m_keys, atol=2e-5)


def test_logits_emission_single_mask_falls_back(setup):
    """multimask=False is ineligible for the in-kernel hypernetwork
    (tokens 1..3 hardcoded) — the flag must fall back to keys mode, not
    produce wrong-token masks."""
    m_keys, iou_keys = _run(setup, "on", tail_keys="on", multimask=False)
    m_log, iou_log = _run(setup, "on", tail_keys="on", tail_logits="on",
                          multimask=False)
    assert m_log.shape == m_keys.shape and m_log.shape[-1] == 1
    np.testing.assert_allclose(m_log, m_keys, atol=2e-5)
    np.testing.assert_allclose(iou_log, iou_keys, atol=2e-5)


def test_fused_tail_matches_materialized_reference(setup):
    """The fused probs tail must also agree with the MATERIALIZED
    two-way path (probs_path=False) — the same bound the split probs
    path is held to (bf16-probability rounding is the only extra
    rounding point; at f32 params the paths agree to ~1e-2 on logits)."""
    cfg, params, emb, pe, sparse, dense = setup
    m_fused, iou_fused = _run(setup, "on")
    masks_ref, iou_ref = decode_masks(params, cfg, emb, pe, sparse, dense,
                                      multimask=True, dense_shared=True,
                                      block_layout=True, probs_path=False)
    np.testing.assert_allclose(m_fused, np.asarray(masks_ref, np.float32),
                               atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(iou_fused, np.asarray(iou_ref, np.float32),
                               atol=5e-2, rtol=5e-2)
