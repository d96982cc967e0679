"""Interleaved A/B: production fused_mask_head_probs (one 2048-position
chain per grid step) vs a local variant that processes the block as two
independent 1024-position half-chains inside one kernel body — giving
Mosaic's scheduler freedom to overlap half A's VPU phases (group-LN,
gelu) with half B's matmuls. Same arithmetic per element."""
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

    def _half_chain(x, up1w_ref, up2wbd_ref, hbd_ref, vecs_ref, c1, eps):
        """The post-recon chain of _mask_head_kernel on one x [half, D]."""
        d = x.shape[1]
        dtype = x.dtype
        up1_b = vecs_ref[0:1, :d]
        ln_scale = vecs_ref[1:2, :d].astype(jnp.float32)
        ln_bias = vecs_ref[2:3, :d].astype(jnp.float32)
        up2_b = vecs_ref[3:4, :up2wbd_ref.shape[1]]
        y1 = jax.lax.dot_general(
            x, up1w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype) + up1_b
        yf = y1.astype(jnp.float32)
        n_groups = d // c1
        giota = jax.lax.broadcasted_iota(jnp.int32, (d, n_groups), 0) // c1
        gcol = jax.lax.broadcasted_iota(jnp.int32, (d, n_groups), 1)
        gmat = (giota == gcol).astype(jnp.float32) / c1
        mu = jax.lax.dot_general(yf, gmat, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ex2 = jax.lax.dot_general(yf * yf, gmat, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        var = ex2 - mu * mu
        gt = (giota == gcol).astype(jnp.float32)
        mub = jax.lax.dot_general(mu, gt, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        varb = jax.lax.dot_general(var, gt, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        yn = (yf - mub) * jax.lax.rsqrt(varb + eps) * ln_scale + ln_bias
        h1 = mh._gelu(yn).astype(dtype)
        y2 = jax.lax.dot_general(
            h1, up2wbd_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype) + up2_b
        h2 = mh._gelu(y2.astype(jnp.float32)).astype(dtype)
        return jax.lax.dot_general(
            h2, hbd_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def split_kernel(keys_ref, up1w_ref, up2wbd_ref, hbd_ref, vecs_ref,
                     p1_ref, c1m_ref, p2_ref, c2m_ref, bvecs_ref, o_ref,
                     *, c1, eps, ln_eps, halves):
        d = keys_ref.shape[2]
        blk = keys_ref.shape[1]
        hb = blk // halves
        for s in range(halves):
            y = keys_ref[0, s * hb:(s + 1) * hb].astype(jnp.float32)
            for li, (p_ref, cm_ref) in enumerate(((p1_ref, c1m_ref),
                                                  (p2_ref, c2m_ref))):
                pt = p_ref[0][:, s * hb:(s + 1) * hb]    # [HT, hb]
                a = jax.lax.dot_general(
                    pt, cm_ref[0], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [hb, D]
                y = y + a + bvecs_ref[3 * li:3 * li + 1, :d].astype(
                    jnp.float32)
                mu = jnp.mean(y, axis=1, keepdims=True)
                var = jnp.maximum(
                    jnp.mean(y * y, axis=1, keepdims=True) - mu * mu, 0.0)
                y = (y - mu) * jax.lax.rsqrt(var + ln_eps) \
                    * bvecs_ref[3 * li + 1:3 * li + 2, :d].astype(
                        jnp.float32) \
                    + bvecs_ref[3 * li + 2:3 * li + 3, :d].astype(
                        jnp.float32)
            x = y.astype(keys_ref.dtype)
            o_ref[0, s * hb:(s + 1) * hb] = _half_chain(
                x, up1w_ref, up2wbd_ref, hbd_ref, vecs_ref, c1, eps
            ).astype(o_ref.dtype)

    def make_split(halves):
        @jax.jit
        def call(img0, p1, c1m, p2, c2m, branch_rows, hyper,
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
            kernel = partial(split_kernel, c1=c1, eps=1e-6, ln_eps=1e-6,
                             halves=halves)
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
                    pl.BlockSpec((1,) + hbd.shape[1:],
                                 lambda n, i: (n, 0, 0),
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
                out_shape=jax.ShapeDtypeStruct((np_, gg, n_out),
                                               img0.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(img0, up1_w, up2wbd, hbd, vecs, p1, c1m, p2, c2m,
              branch_rows.astype(img0.dtype))
            return out.reshape(np_, gg, 16, m_tok)
        return call

    split2 = make_split(2)
    split4 = make_split(4)

    o_prod = prod(*args)
    o_s2 = split2(*args)
    d2 = np.abs(np.asarray(o_prod.astype(jnp.float32))
                - np.asarray(o_s2.astype(jnp.float32))).max()
    print(f"[ab_split] max |prod-split2| = {d2:.2e}", flush=True)

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
        t_p = loop(prod)
        t_2 = loop(split2)
        t_4 = loop(split4)
        print(f"[ab_split] round{rnd} prod={1000*t_p:.3f}ms "
              f"split2={1000*t_2:.3f}ms split4={1000*t_4:.3f}ms",
              flush=True)


if __name__ == "__main__":
    main()
