"""Interleaved A/B: old (pre-18da77e) vs new gelu polynomial in an
isolated Pallas kernel at mask-head volume (128 grid steps x [4096, 512]
f32 gelu evals ~= the per-batch h2 gelu count). Measures the pure VPU
delta of folding the 1/sqrt(2) scale into the coefficients and the
0.5*(x+|x|*e) rewrite."""
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from revisit_anything_tpu.ops.maskhead import _gelu as new_gelu

    def old_erf(x):
        a = jnp.abs(x)
        p = 1.0 + a * (0.0705230784 + a * (0.0422820123 + a * (
            0.0092705272 + a * (0.0001520143 + a * (
                0.0002765672 + a * 0.0000430638)))))
        p = p * p
        p = p * p
        p = p * p
        p = p * p
        e = 1.0 - 1.0 / p
        return jnp.sign(x) * e

    def old_gelu(x):
        return x * 0.5 * (1.0 + old_erf(x * np.float32(1.0 / np.sqrt(2.0))))

    BLK, LANES, STEPS = 512, 512, 1024

    def make(fn):
        def kernel(x_ref, o_ref):
            x = x_ref[0].astype(jnp.float32)
            o_ref[0] = fn(x).astype(o_ref.dtype)

        @jax.jit
        def call(x):
            return pl.pallas_call(
                kernel,
                grid=(STEPS,),
                in_specs=[pl.BlockSpec((1, BLK, LANES), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, BLK, LANES),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((STEPS, BLK, LANES),
                                               jnp.bfloat16),
            )(x)
        return call

    old_call, new_call = make(old_gelu), make(new_gelu)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (STEPS, BLK, LANES)).astype(np.float32) * 2.0, jnp.bfloat16)

    def sync(o):
        float(jnp.ravel(o)[0].astype(jnp.float32))

    def loop(fn, n=10):
        out = fn(x)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(x)
        sync(out)
        return (time.perf_counter() - t0) / n

    d = np.abs(np.asarray(old_call(x).astype(jnp.float32))
               - np.asarray(new_call(x).astype(jnp.float32))).max()
    print(f"[ab_gelu] max |old-new| = {d:.2e}", flush=True)
    for rnd in range(4):
        t_old = loop(old_call)
        t_new = loop(new_call)
        print(f"[ab_gelu] round{rnd} old={1000*t_old:.3f}ms "
              f"new={1000*t_new:.3f}ms delta={1000*(t_old-t_new):.3f}ms",
              flush=True)


if __name__ == "__main__":
    main()
