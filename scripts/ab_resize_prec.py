"""Resize column-contraction precision A/B (HIGHEST vs HIGH vs LOW).

The fused resize kernel's per-mask [H, 4g]·[4g, W] column contraction
runs f32 at Precision.HIGHEST (6 MXU passes) to bit-match the einsum
reference. HIGH (bf16x3, 3 passes) should halve that matmul's cost at
~1e-7 absolute deltas — far under the measured near-threshold margin
class (probe_bsz_parity: random-weight logits sit within 0.03 of thr,
uniform-ish). LOW (1 pass) bounds the ceiling. Interleaved, sub-batch
(maskside2 methodology: b=256, scale x4 for per-query; the probe's
working set stays ~0.6 GB next to nothing else on the chip).

Decision rule: adopt HIGH iff >=1.08x on 3/3 rounds AND flag flip rate
<= 1e-5; record a negative A/B otherwise.
"""
import sys
import time

import numpy as np

from _ab_common import retry, sam_setup, sync_tree


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.models.sam.amg import resize_mats_and_rows
    from revisit_anything_tpu.ops.maskresize import fused_resize_flags

    sub = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    scale = 1024 / sub

    s = sam_setup()
    cfg = s.cfg
    wh, ww, mask_rows = resize_mats_and_rows(cfg, s.input_hw, s.sam_hw,
                                             on_tpu=True)
    content = mask_rows * cfg.grid
    thr, off = cfg.mask_threshold, 1.0

    key = jax.random.PRNGKey(0)
    blk_syn = jax.random.normal(key, (sub, content, 16, 3), jnp.bfloat16)

    def rz(prec):
        return jax.jit(lambda x: fused_resize_flags(
            x, wh, ww, thr, off, grid_hw=(mask_rows, cfg.grid),
            col_precision=prec))

    fns = {p: rz(p) for p in ("highest", "high", "low")}
    outs = {}
    for p, f in fns.items():
        retry(f"compile {p}", lambda f=f: sync_tree(f(blk_syn)),
              attempts=3, sleep_s=45)
        outs[p] = f(blk_syn)
    ref = np.asarray(outs["highest"])
    npx = ref.size
    for p in ("high", "low"):
        flips = int(np.sum(np.asarray(outs[p]) != ref))
        print(f"[rzp] parity {p}: flag-byte flips {flips}/{npx} "
              f"({flips / npx:.2e})", flush=True)
    del outs, ref

    def loop(fn, n=12):
        out = fn(blk_syn)
        sync_tree(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(blk_syn)
        sync_tree(out)
        return (time.perf_counter() - t0) / n

    for rnd in range(4):
        ts = {p: loop(f) for p, f in fns.items()}
        msg = " ".join(f"{p}={1000 * t * scale:.2f}ms"
                       for p, t in ts.items())
        print(f"[rzp] round{rnd} x{scale:.0f}: {msg} "
              f"(high {ts['highest'] / ts['high']:.3f}x, "
              f"low {ts['highest'] / ts['low']:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
