"""Interleaved TPU A/B: SAM encode with the fused windowed-attention
kernel (ops/winattn.py, encoder._WINATTN) vs the XLA windowed path.

The r5 encode-ceiling probe (BASELINE.md) pinned encode at 66 ms loaded
with a 35.5 ms matmul skeleton (174 TF) — a ~31 ms non-matmul residual
dominated by the windowed layers' [25, 16, 196, 196] score traffic.
The kernel keeps each window's scores/bias/softmax in VMEM.

Method: two separately-cached jits of the UNJITTED encode_image (the
module flag is trace-time state, so each wrapper traces its own path);
the production variant compiles first; async-loop timing, interleaved
rounds; parity reported as max|delta| over the embedding (bf16 params:
expect the documented bf16 class from the OLD path's bf16 softmax).

Run ALONE (one-TPU-process rule).
"""
import time
from functools import partial

from _ab_common import retry, sam_setup, sync_tree


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from revisit_anything_tpu.models.sam import encoder as enc_mod

    s = sam_setup()
    cfg = s.cfg
    enc_raw = enc_mod.encode_image.__wrapped__

    def make(flag):
        @jax.jit
        def f(params, img):
            old = enc_mod._WINATTN          # trace-time module state
            enc_mod._WINATTN = flag
            try:
                return enc_raw(params, cfg, img)
            finally:
                enc_mod._WINATTN = old
        return f

    f_on = make("on")                        # production default (auto=on)
    f_off = make("off")                      # r4 XLA path (warm cache)

    retry("compile ON (production)",
          lambda: sync_tree(f_on(s.sam_params, s.pre)))
    retry("compile OFF (r4 cache)",
          lambda: sync_tree(f_off(s.sam_params, s.pre)))

    e_on = f_on(s.sam_params, s.pre)
    e_off = f_off(s.sam_params, s.pre)
    d = jnp.max(jnp.abs(e_on.astype(jnp.float32)
                        - e_off.astype(jnp.float32)))
    rel = d / jnp.max(jnp.abs(e_off.astype(jnp.float32)))
    print(f"[win] parity max|d|={float(d):.3e} rel={float(rel):.3e}",
          flush=True)

    def loop(fn, n=10):
        out = fn()
        sync_tree(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync_tree(out)
        return (time.perf_counter() - t0) / n

    for rnd in range(4):
        t_off = loop(lambda: f_off(s.sam_params, s.pre))
        t_on = loop(lambda: f_on(s.sam_params, s.pre))
        print(f"[win] round{rnd} encode_off={1000*t_off:.2f}ms "
              f"encode_on={1000*t_on:.2f}ms "
              f"speedup={t_off/t_on:.3f}x", flush=True)


if __name__ == "__main__":
    main()
