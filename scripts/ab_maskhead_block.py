"""Interleaved A/B: fused_mask_head_probs grid-step block size.

The half-chain split A/B (scripts/ab_maskhead_split.py, negative) showed
shrinking the per-step matmul M-dim hurts; this probes the opposite —
blk 4096 (one grid step per prompt, M=4096 matmuls, ~30 MB VMEM peak)
and blk 1024 as the control — against the production 2048.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import revisit_anything_tpu.ops.maskhead as mh

    B, M, D, HT = 128, 4096, 256, 64
    C1, C2, MT = 64, 32, 3
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(
        rng.standard_normal(s).astype(np.float32) * 0.5, jnp.bfloat16)

    args = (f(1, M, D), f(B, HT, M), f(B, HT, D), f(B, HT, M),
            f(B, HT, D), f(8, D), f(B, MT, C2), f(D, 4 * C1), f(C1),
            f(C1), f(C1), f(C1, 4 * C2), f(C2))

    def make(block, content=None):
        return jax.jit(
            lambda *a: mh.fused_mask_head_probs(*a, block=block,
                                                content=content))

    v2048 = make(2048)
    v4096 = make(4096)
    v1024 = make(1024)
    # content-restricted variants (the production pad-row skip at
    # 240x320: gh=49 rounded to 50 for the Mosaic lane constraint ->
    # 3200 positions; legal 128-multiple block divisors 640/3200 —
    # 1568/3136 FAIL Mosaic lowering, minor block dims must be
    # 128-divisible)
    CONTENT = 3200
    c640 = make(640, CONTENT)
    c3200 = make(3200, CONTENT)

    o_p = v2048(*args)
    for name, fn in (("4096", v4096), ("1024", v1024)):
        d = np.abs(np.asarray(o_p.astype(jnp.float32))
                   - np.asarray(fn(*args).astype(jnp.float32))).max()
        print(f"[ab_block] max |2048-{name}| = {d:.2e}", flush=True)
    for name, fn in (("c640", c640), ("c3200", c3200)):
        d = np.abs(np.asarray(o_p.astype(jnp.float32))[:, :CONTENT]
                   - np.asarray(fn(*args).astype(jnp.float32))).max()
        print(f"[ab_block] max |2048[:c]-{name}| = {d:.2e}", flush=True)

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
        t_p = loop(v2048)
        t_4 = loop(v4096)
        t_1 = loop(v1024)
        t_c1 = loop(c640)
        t_c3 = loop(c3200)
        print(f"[ab_block] round{rnd} blk2048={1000*t_p:.3f}ms "
              f"blk4096={1000*t_4:.3f}ms blk1024={1000*t_1:.3f}ms "
              f"c640={1000*t_c1:.3f}ms c3200={1000*t_c3:.3f}ms",
              flush=True)


if __name__ == "__main__":
    main()
