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
