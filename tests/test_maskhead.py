"""Fused mask-head Pallas kernel vs the XLA block path (interpret mode)."""

from types import SimpleNamespace

import numpy as np
import pytest


@pytest.mark.parametrize("m_tok", [3, 1])
def test_fused_mask_head_matches_xla_block_path(rng, m_tok):
    import jax.numpy as jnp

    from revisit_anything_tpu.models.sam.decoder import _upscale_masks_blocks
    from revisit_anything_tpu.ops.maskhead import fused_mask_head

    np_, gg = 2, 1024
    c1, c2 = 32, 16
    d = 4 * c1

    keys = jnp.asarray(rng.standard_normal((np_, gg, d)), jnp.float32)
    hyper = jnp.asarray(rng.standard_normal((np_, m_tok, c2)), jnp.float32)
    dec = {
        "up1_w": jnp.asarray(rng.standard_normal((d, 4 * c1)) * 0.1,
                             jnp.float32),
        "up1_b": jnp.asarray(rng.standard_normal((c1,)), jnp.float32),
        "up_ln": {"scale": jnp.asarray(rng.standard_normal((c1,)) + 1.0,
                                       jnp.float32),
                  "bias": jnp.asarray(rng.standard_normal((c1,)),
                                      jnp.float32)},
        "up2_w": jnp.asarray(rng.standard_normal((c1, 4 * c2)) * 0.1,
                             jnp.float32),
        "up2_b": jnp.asarray(rng.standard_normal((c2,)), jnp.float32),
    }
    cfg = SimpleNamespace(grid=32, eps=1e-6)

    ref = np.asarray(_upscale_masks_blocks(keys, hyper, dec, cfg,
                                           interleave=False))
    out = np.asarray(fused_mask_head(
        keys, hyper, dec["up1_w"], dec["up1_b"], dec["up_ln"]["scale"],
        dec["up_ln"]["bias"], dec["up2_w"], dec["up2_b"], eps=cfg.eps,
        block=256, interpret=True))

    assert out.shape == (np_, gg, 16, m_tok)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_gelu_polynomial_matches_exact_erf_form():
    """The kernel's transcendental-free gelu (A&S 7.1.28 with the 1/sqrt(2)
    scale folded into the coefficients and the sign(x) rewrite) must stay
    within ~1e-6 of exact erf-form gelu — far below the bf16 activation
    rounding (~4e-3 relative) the kernel's stores already introduce."""
    import jax.numpy as jnp
    from scipy.special import erf

    from revisit_anything_tpu.ops.maskhead import _gelu

    x = np.linspace(-9.0, 9.0, 100001).astype(np.float32)
    exact = x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))
    got = np.asarray(_gelu(jnp.asarray(x)))
    assert np.abs(got - exact).max() < 2e-6
    # odd-function symmetry of the erf term: gelu(x) - gelu(-x) == x
    np.testing.assert_allclose(got - got[::-1], x, atol=2e-6)


def test_pick_block_honors_mosaic_lane_constraint():
    """The probs-path p1/p2 refs put the position block in their MINOR
    dim: Mosaic rejects minor blocks not divisible by 128 (unless equal
    to the full array dim). The real TPU lowering failed on the old
    1568 choice for content 3136 — _pick_block(lane=128) must only
    return 128-multiples when the content admits one."""
    from revisit_anything_tpu.ops.maskhead import _pick_block

    # production pad-row-skip shape (240x320): content 3200 → 640
    assert _pick_block(3200, 2048, lane=128) == 640
    # full grid: unchanged 2048
    assert _pick_block(4096, 2048, lane=128) == 2048
    # budget below one lane group still yields a legal block
    assert _pick_block(3200, 100, lane=128) == 128
    # plain path (block in the SECOND-minor dim): 8-divisible
    assert _pick_block(3200, 2048, lane=8) == 1600
    # no lane-multiple divisor → fallback (tiny interpret grids, where
    # the single full-content block is exempt)
    assert _pick_block(64, 2048, lane=128) == 64
    for content, budget, lane in ((3200, 2048, 128), (4096, 4096, 128),
                                  (2176, 2048, 128), (3584, 2048, 8)):
        blk = _pick_block(content, budget, lane=lane)
        assert blk % lane == 0 and content % blk == 0 and blk <= budget


def test_round_rows_for_lanes():
    """TPU content rounding: gh·grid must be 128-divisible so the probs
    kernel's minor-dim blocks lower (amg._round_rows_for_lanes)."""
    from revisit_anything_tpu.models.sam.amg import _round_rows_for_lanes

    assert _round_rows_for_lanes(49, 64) == 50      # 240x320 production
    assert _round_rows_for_lanes(50, 64) == 50
    assert _round_rows_for_lanes(64, 64) == 64
    assert _round_rows_for_lanes(33, 64) == 34
    assert _round_rows_for_lanes(5, 8) == 8         # tiny grid → full
    for gh in range(1, 65):
        r = _round_rows_for_lanes(gh, 64)
        assert gh <= r <= 64 and (r == 64 or (r * 64) % 128 == 0)
