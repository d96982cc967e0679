"""Interleaved A/B: per-head-loop vs block-diagonal-head-batched t2i
reconstruction kernel at production decode shapes (128 prompts, M=4096,
DA=128, H=8, depth-2 final attention). The OLD kernel body is copied here
verbatim (pre-527962e) so both variants run in ONE process; timings are
async loops (N dispatches, one sync)."""
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from revisit_anything_tpu.ops.decode_probs import (
        _pack_branch_vecs, _recon_t, t2i_from_probs)

    B, M, D, DA, H, T = 128, 4096, 256, 128, 8, 7
    HD = DA // H
    HT = H * T
    n_pad = 8
    eps = 1e-6
    scale = 1.0 / float(np.sqrt(HD))
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(
        rng.standard_normal(s).astype(np.float32), jnp.bfloat16)

    q_tok = f(B, T, DA)
    img0t = f(1, D, M)
    p1 = f(B, HT, M)
    c1 = f(B, HT, D)
    p2 = f(B, HT, M)
    c2 = f(B, HT, D)
    w_k = f(D, DA)
    w_v = f(D, DA)
    pekt = f(1, DA, M)
    vecs = _pack_branch_vecs(
        D, DA, jnp.bfloat16, f(D), f(D), f(D), f(D), f(D), f(D),
        v_bias=f(DA))

    # ---- OLD kernel (pre-527962e per-head loop), local copy ----
    def _old_kernel(q_ref, img0t_ref, p1_ref, c1_ref, p2_ref, c2_ref,
                    wkvt_ref, pekt_ref, vecs_ref, o_ref, *, heads, hd,
                    scale, d, eps):
        keyst = _recon_t(img0t_ref[0], [p1_ref, p2_ref],
                         [c1_ref, c2_ref], vecs_ref, d, eps, 2)
        da = hd * heads
        kvt = jax.lax.dot_general(
            wkvt_ref[...].astype(jnp.float32), keyst,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        kt = kvt[:da] + pekt_ref[0].astype(jnp.float32)
        vb = vecs_ref[:da, 6:7].astype(jnp.float32)
        vt = kvt[da:] + vb
        q = q_ref[0].astype(jnp.float32)
        for h in range(heads):
            qh = q[:, h * hd:(h + 1) * hd]
            kh = kt[h * hd:(h + 1) * hd, :]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            mx = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - mx)
            z = jnp.sum(e, axis=1, keepdims=True)
            p = e / z
            vh = vt[h * hd:(h + 1) * hd, :]
            oh = jax.lax.dot_general(
                p, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, :, h * hd:(h + 1) * hd] = oh.astype(o_ref.dtype)

    wkvt = jnp.concatenate([jnp.transpose(w_k, (1, 0)),
                            jnp.transpose(w_v, (1, 0))],
                           axis=0).astype(img0t.dtype)
    qp = jnp.pad(q_tok, ((0, 0), (0, n_pad - T), (0, 0)))

    @jax.jit
    def old_call(qp, img0t, p1, c1, p2, c2, wkvt, pekt, vecs):
        kernel = partial(_old_kernel, heads=H, hd=HD, scale=scale, d=D,
                         eps=eps)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, n_pad, DA), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(img0t.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HT, M), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HT, D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HT, M), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HT, D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(wkvt.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(pekt.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(vecs.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n_pad, DA), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n_pad, DA), qp.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qp, img0t, p1, c1, p2, c2, wkvt, pekt, vecs)

    new_call = jax.jit(lambda *a: t2i_from_probs(
        a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7], a[8], a[9], H,
        eps=eps))

    def sync(x):
        float(jnp.ravel(x)[0].astype(jnp.float32))

    def loop(fn, n=20):
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / n

    o_old = old_call(qp, img0t, p1, c1, p2, c2, wkvt, pekt, vecs)
    o_new = new_call(q_tok, img0t, p1, c1, p2, c2, w_k, w_v, pekt, vecs)
    d = np.abs(np.asarray(o_old[:, :T].astype(jnp.float32))
               - np.asarray(o_new.astype(jnp.float32))).max()
    print(f"[ab_t2i] max |old-new| = {d:.2e}", flush=True)

    for rnd in range(4):
        t_old = loop(lambda: old_call(qp, img0t, p1, c1, p2, c2, wkvt,
                                      pekt, vecs))
        t_new = loop(lambda: new_call(q_tok, img0t, p1, c1, p2, c2, w_k,
                                      w_v, pekt, vecs))
        print(f"[ab_t2i] round{rnd} old={1000*t_old:.3f}ms "
              f"new={1000*t_new:.3f}ms "
              f"speedup={t_old/t_new:.2f}x", flush=True)


if __name__ == "__main__":
    main()
