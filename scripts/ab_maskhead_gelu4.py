"""Interleaved A/B: production fused_mask_head_probs (degree-6 A&S 7.1.28
gelu, err 9e-7) vs a local copy using degree-4 A&S 7.1.27 (err ~2.5e-4,
~25% fewer VPU ops/eval) at production shapes. Decides whether the
precision trade is worth the tolerance churn: mask-head output feeds
bf16 stores whose own rounding is ~4e-3 relative."""
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import revisit_anything_tpu.ops.maskhead as mh

    B, M, D, HT = 128, 4096, 256, 64
    C1, C2, MT = 64, 32, 3
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(
        rng.standard_normal(s).astype(np.float32) * 0.5, jnp.bfloat16)

    img0 = f(1, M, D)
    p1 = f(B, HT, M)
    c1m = f(B, HT, D)
    p2 = f(B, HT, M)
    c2m = f(B, HT, D)
    branch_rows = f(8, D)
    hyper = f(B, MT, C2)
    up1w = f(D, 4 * C1)
    up1b = f(C1)
    lns = f(C1)
    lnb = f(C1)
    up2w = f(C1, 4 * C2)
    up2b = f(C2)

    args = (img0, p1, c1m, p2, c2m, branch_rows, hyper,
            up1w, up1b, lns, lnb, up2w, up2b)

    prod = jax.jit(lambda *a: mh.fused_mask_head_probs(*a))

    # --- local cheap-gelu variant: monkeypatch-free copy via module-level
    # _gelu swap inside a cloned kernel closure ---
    G4 = [float(c * 2.0 ** (-(k + 1) / 2.0)) for k, c in enumerate(
        (0.278393, 0.230389, 0.000972, 0.078108))]

    def gelu4(x):
        a = jnp.abs(x)
        c1_, c2_, c3_, c4_ = G4
        p = 1.0 + a * (c1_ + a * (c2_ + a * (c3_ + a * c4_)))
        p = p * p
        p = p * p                                  # p^4
        e = 1.0 - 1.0 / p
        return 0.5 * (x + a * e)

    real_gelu = mh._gelu

    # A fresh pallas_call mirroring _mask_head_call_probs (the inner jit
    # there would CACHE-HIT the degree-6 trace on identical static args,
    # silently ignoring a module-level _gelu swap).
    @jax.jit
    def cheap(img0, p1, c1m, p2, c2m, branch_rows, hyper,
              up1_w, up1_b, ln_scale, ln_bias, up2_w, up2_b):
        np_ = p1.shape[0]
        gg, d = img0.shape[1], img0.shape[2]
        ht = p1.shape[1]
        c1 = up1_w.shape[1] // 4
        c2 = up2_w.shape[1] // 4
        m_tok = hyper.shape[1]
        blk = 2048
        up2wbd = jnp.zeros((4 * c1, 16 * c2), up2_w.dtype)
        for q in range(4):
            up2wbd = up2wbd.at[q * c1:(q + 1) * c1,
                               q * 4 * c2:(q + 1) * 4 * c2].set(up2_w)
        eye16 = jnp.eye(16, dtype=hyper.dtype)
        hbd = jnp.einsum("qs,nmc->nqcsm", eye16, hyper).reshape(
            np_, 16 * c2, 16 * m_tok).astype(img0.dtype)
        ncols = max(4 * c1, 16 * c2)
        vecs = jnp.zeros((8, ncols), img0.dtype)
        vecs = vecs.at[0, :4 * c1].set(jnp.tile(up1_b, 4))
        vecs = vecs.at[1, :4 * c1].set(jnp.tile(ln_scale, 4))
        vecs = vecs.at[2, :4 * c1].set(jnp.tile(ln_bias, 4))
        vecs = vecs.at[3, :16 * c2].set(jnp.tile(up2_b, 16))
        n_out = hbd.shape[2]
        kernel = partial(mh._mask_head_kernel, c1=c1, eps=1e-6,
                         recon=True, ln_eps=1e-6)
        out = pl.pallas_call(
            kernel,
            grid=(np_, gg // blk),
            in_specs=[
                pl.BlockSpec((1, blk, d), lambda n, i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d), lambda n, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(up2wbd.shape, lambda n, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + hbd.shape[1:], lambda n, i: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(vecs.shape, lambda n, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ht, blk), lambda n, i: (n, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ht, d), lambda n, i: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ht, blk), lambda n, i: (n, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ht, d), lambda n, i: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, d), lambda n, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk, n_out),
                                   lambda n, i: (n, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((np_, gg, n_out), img0.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(img0, up1w, up2wbd, hbd, vecs, p1, c1m, p2, c2m,
          branch_rows.astype(img0.dtype))
        return out.reshape(np_, gg, 16, m_tok)

    mh._gelu = gelu4
    try:
        o_cheap = cheap(*args)
        _ = np.asarray(o_cheap[0, 0, 0, 0].astype(jnp.float32))
    finally:
        mh._gelu = real_gelu
    o_prod = prod(*args)

    d = np.abs(np.asarray(o_prod.astype(jnp.float32))
               - np.asarray(o_cheap.astype(jnp.float32)))
    print(f"[ab_mh] max |prod-cheap| = {d.max():.2e} "
          f"mean = {d.mean():.2e}", flush=True)

    def sync(x):
        float(jnp.ravel(x)[0].astype(jnp.float32))

    def loop(fn, n=15):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / n

    for rnd in range(4):
        t_prod = loop(prod)
        t_cheap = loop(cheap)
        print(f"[ab_mh] round{rnd} prod={1000*t_prod:.3f}ms "
              f"cheap={1000*t_cheap:.3f}ms "
              f"delta={1000*(t_prod-t_cheap):.3f}ms", flush=True)


if __name__ == "__main__":
    main()
