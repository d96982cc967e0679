"""Mask-head group-LN stats A/B: indicator matmuls vs VPU reductions.

The group-LN statistics run as FOUR f32 dots against indicator matrices
([BLK, 256]·[256, 4] twice + [BLK, 4]·[4→256] broadcast-backs twice) ≈
1/3 of the kernel's MXU tile-ops at blk 3200. The "vpu" mode computes
them with lane-slice sums + iota-select broadcast-backs (zero MXU,
~25 Mops VPU per prompt). If the kernel is MXU-bound (r3: "MXU/layout-
bound, not gelu-bound") this should win; if scheduling-bound it's a
wash like the half-chain split. Sub-batch methodology (b=256, x4).

Decision rule: adopt iff >=1.05x on 3/4 rounds AND max|d| within the
f32 sum-order class (~1e-5 of the logit scale).
"""
import sys
import time

import numpy as np

from _ab_common import retry, sam_setup, sync_tree


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.models.sam.amg import resize_mats_and_rows
    from revisit_anything_tpu.ops.maskhead import fused_mask_head
    from revisit_anything_tpu.utils.packing import maybe_unpack

    sub = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    scale = 1024 / sub

    s = sam_setup()
    cfg = s.cfg
    _, _, mask_rows = resize_mats_and_rows(cfg, s.input_hw, s.sam_hw,
                                           on_tpu=True)
    content = mask_rows * cfg.grid

    dec = maybe_unpack(s.sam_params)["decoder"]
    up1_w, up1_b = dec["up1_w"], dec["up1_b"]
    ln_s, ln_b = dec["up_ln"]["scale"], dec["up_ln"]["bias"]
    up2_w, up2_b = dec["up2_w"], dec["up2_b"]

    key = jax.random.PRNGKey(0)
    keys_syn = jax.random.normal(key, (sub, content, up1_w.shape[0]),
                                 jnp.bfloat16)
    hyper_syn = jax.random.normal(jax.random.fold_in(key, 1),
                                  (sub, 3, up2_w.shape[1] // 4),
                                  jnp.bfloat16)

    def mh(mode):
        return jax.jit(lambda k, hy: fused_mask_head(
            k, hy, up1_w, up1_b, ln_s, ln_b, up2_w, up2_b,
            eps=cfg.eps, content=content, ln_stats=mode))

    mm, vp = mh("matmul"), mh("vpu")
    retry("compile matmul", lambda: sync_tree(mm(keys_syn, hyper_syn)),
          attempts=3, sleep_s=45)
    retry("compile vpu", lambda: sync_tree(vp(keys_syn, hyper_syn)),
          attempts=3, sleep_s=45)
    oa = mm(keys_syn, hyper_syn)
    ob = vp(keys_syn, hyper_syn)
    d = float(jnp.max(jnp.abs(oa.astype(jnp.float32)
                              - ob.astype(jnp.float32))))
    r = float(jnp.max(jnp.abs(oa.astype(jnp.float32))))
    print(f"[lns] parity max|d|={d:.2e} max|out|={r:.2e}", flush=True)
    del oa, ob

    def loop(fn, n=10):
        out = fn(keys_syn, hyper_syn)
        sync_tree(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(keys_syn, hyper_syn)
        sync_tree(out)
        return (time.perf_counter() - t0) / n

    for rnd in range(4):
        ta = loop(mm)
        tb = loop(vp)
        print(f"[lns] round{rnd} x{scale:.0f}: matmul={1000*ta*scale:.2f}ms "
              f"vpu={1000*tb*scale:.2f}ms ({ta/tb:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
