"""Fused resize+threshold-flags Pallas kernel vs the XLA einsum chain."""

import jax.numpy as jnp
import numpy as np
import pytest

from revisit_anything_tpu.ops.maskresize import (fused_resize_flags,
                                                 resize_flags_reference)
from revisit_anything_tpu.ops.resize import bilinear_weight_matrix


def _setup(np_=3, g=8, h=30, w=40, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    lowres = jnp.asarray(
        rng.standard_normal((np_, g * g, 16, 3)) * 4.0, dtype)
    # composed resize matrices like amg._decode_batch builds them
    up = bilinear_weight_matrix(4 * g, 4 * g)        # identity-ish square
    wh = bilinear_weight_matrix(h, 4 * g) @ up
    ww = bilinear_weight_matrix(w, 4 * g) @ up
    return lowres, wh, ww


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_kernel_matches_reference(dtype):
    lowres, wh, ww = _setup(dtype=dtype)
    thr, off = 0.0, 1.0
    got = np.asarray(fused_resize_flags(lowres, wh, ww, thr, off,
                                        interpret=True))
    want = np.asarray(resize_flags_reference(lowres, wh, ww, thr, off))
    assert got.shape == want.shape == (3, 3, 30, 40)
    # identical contraction order/dtypes; any residual f32-rounding
    # disagreement may only sit exactly at a threshold crossing
    mismatch = got != want
    assert mismatch.mean() < 1e-4, mismatch.mean()


@pytest.mark.parametrize("h,w", [(30, 40), (25, 50), (64, 20)])
def test_emit_stats_matches_flag_reductions(h, w):
    """emit_stats per-axis reductions + the amg._decode_batch TPU-branch
    math must reproduce the flag-image stats bit-for-bit (integer-exact
    counts / indices) — at wide, odd-dimension, and tall output shapes
    (the production set spans 240x320 .. 300x400 .. 256x256; a row/col
    axis mixup would pass any single square-ish shape)."""
    import jax.numpy as jnp

    lowres, wh, ww = _setup(h=h, w=w, dtype=jnp.float32)
    thr, off = 0.0, 1.0
    flags, rowst, colst = fused_resize_flags(
        lowres, wh, ww, thr, off, interpret=True, emit_stats=True)
    flags, rowst, colst = map(np.asarray, (flags, rowst, colst))
    b, n_m, hgt, wid = flags.shape
    flat = flags.reshape(-1, hgt, wid)

    # oracle: stats from the flag image (the pre-fusion XLA math)
    hi_o = (flat >> 2).sum(axis=(1, 2)).astype(np.float32)
    lo_o = (flat & 1).sum(axis=(1, 2)).astype(np.float32)
    masks = (flat & 2).astype(bool)
    rows_o = masks.any(axis=2)
    cols_o = masks.any(axis=1)
    ridx, cidx = np.arange(hgt), np.arange(wid)
    top_o = np.min(np.where(rows_o, ridx, hgt), axis=1)
    bot_o = np.max(np.where(rows_o, ridx, -1), axis=1)
    left_o = np.min(np.where(cols_o, cidx, wid), axis=1)
    right_o = np.max(np.where(cols_o, cidx, -1), axis=1)
    empty_o = ~rows_o.any(axis=1)

    # the amg TPU-branch math on the kernel outputs
    hi = rowst[:, :, 4:4 + n_m].sum(axis=1).reshape(-1)
    lo = rowst[:, :, 8:8 + n_m].sum(axis=1).reshape(-1)
    rows = rowst[:, :, :n_m] > 0.0
    cols = colst[:, :n_m, :] > 0.0
    top = np.min(np.where(rows, ridx[None, :, None], hgt), axis=1
                 ).reshape(-1)
    bot = np.max(np.where(rows, ridx[None, :, None], -1), axis=1
                 ).reshape(-1)
    left = np.min(np.where(cols, cidx[None, None, :], wid), axis=2
                  ).reshape(-1)
    right = np.max(np.where(cols, cidx[None, None, :], -1), axis=2
                   ).reshape(-1)
    empty = ~rows.any(axis=1).reshape(-1)

    np.testing.assert_array_equal(hi, hi_o)
    np.testing.assert_array_equal(lo, lo_o)
    np.testing.assert_array_equal(top, top_o)
    np.testing.assert_array_equal(bot, bot_o)
    np.testing.assert_array_equal(left, left_o)
    np.testing.assert_array_equal(right, right_o)
    np.testing.assert_array_equal(empty, empty_o)
    assert not empty.all()          # the random setup must exercise masks


def test_flags_encode_three_thresholds():
    lowres, wh, ww = _setup(dtype=jnp.float32)
    thr, off = 0.0, 1.0
    flags = np.asarray(fused_resize_flags(lowres, wh, ww, thr, off,
                                          interpret=True))
    # float64 oracle of the same composed linear map
    lx = np.asarray(lowres, np.float64).reshape(3, 8, 8, 2, 2, 2, 2, 3)
    m = np.einsum("oiac,nijabcdm->nojbdm", wh.reshape(30, 8, 2, 2), lx)
    m = np.einsum("pjbd,nojbdm->nmop", ww.reshape(40, 8, 2, 2), m)
    safe = np.min(np.abs(m[..., None] - (thr + np.array([-off, 0., off]))),
                  axis=-1) > 1e-3
    for bit, t in ((1, thr - off), (2, thr), (4, thr + off)):
        got = (flags & bit) > 0
        want = m > t
        assert (got == want)[safe].all(), bit
