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
