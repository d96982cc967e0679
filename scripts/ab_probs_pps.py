"""Interleaved A/B: layer-1 i2t probs kernel prompts-per-step.

The layer-1 probabilities share their queries across prompts, so the
grid can process several prompts per step: the logits matmul's M-dim
grows from 56 rows (44% of an MXU row tile) to pps·56 and the grid has
pps× fewer steps. Probes pps 2/4/8 against the production 1 at the
production shapes (128 prompts, 4096 positions).
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.ops.decode_probs import i2t_probs

    B, T, HEADS, M = 128, 7, 8, 4096
    DA = 128
    rng = np.random.default_rng(0)
    qst = jnp.asarray(
        rng.standard_normal((1, DA, M)).astype(np.float32) * 0.3,
        jnp.bfloat16)
    tok_k = jnp.asarray(
        rng.standard_normal((B, T, DA)).astype(np.float32) * 0.3,
        jnp.bfloat16)

    def make(pps):
        return jax.jit(lambda q, k: i2t_probs(q, k, HEADS, layer=1,
                                              interpret=False, pps=pps))

    fns = {pps: make(pps) for pps in (1, 2, 4, 8)}
    base = np.asarray(fns[1](qst, tok_k).astype(jnp.float32))
    for pps in (2, 4, 8):
        d = np.abs(np.asarray(fns[pps](qst, tok_k).astype(jnp.float32))
                   - base).max()
        print(f"[ab_pps] max |1-{pps}| = {d:.2e}", flush=True)

    def sync(x):
        float(jnp.ravel(x)[0].astype(jnp.float32))

    def loop(fn, n=30):
        out = fn(qst, tok_k)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(qst, tok_k)
        sync(out)
        return (time.perf_counter() - t0) / n

    for rnd in range(4):
        times = {pps: loop(fn) for pps, fn in fns.items()}
        print("[ab_pps] round%d " % rnd
              + " ".join(f"pps{p}={1000*t:.3f}ms"
                         for p, t in times.items()), flush=True)


if __name__ == "__main__":
    main()
