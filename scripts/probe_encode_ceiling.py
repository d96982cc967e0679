"""Encode ceiling probe (round-4 verdict item 6): is sam_encode's
~0.49-nominal MFU structural, or is there a lever left?

Measures, interleaved in ONE process (async loops):

  1. the achievable TF of each constituent encode matmul SHAPE in
     isolation (bf16, exact ViT-H dims) — tests BASELINE's "K=1280
     shapes cap at 115-160 TF" claim directly;
  2. a square 4k³ reference matmul (the 166 TF/0.84-MFU ceiling pin);
  3. full encode_image (production program, warm cache);
  4. the sum-of-matmuls lower bound implied by (1) vs (3): the gap is
     LN/softmax/window-reshape/bias overhead — the structural residual.

ViT-H per image: 32 blocks x [qkv (N,1280)x(1280,3840), proj
(N,1280)x(1280,1280)(*), MLP (N,1280)x(1280,5120) + (N,5120)x(5120,1280)]
with N = 4900 (25 windows x 196 rows, windowed x28) or 4096 (global x4),
plus attention einsums (windowed: [25,16,196,196] scores; global: flash).
(*) proj input is (N, 1280) after head merge.

Working set: a few hundred MB of random matrices + packed ViT-H params
(~1.3 GB) — run ALONE per the one-TPU-process rule.
"""
import time

import numpy as np

from _ab_common import retry, sync_tree


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.models.sam import SAM_VIT_H, init_sam_params
    from revisit_anything_tpu.models.sam.encoder import encode_image
    from revisit_anything_tpu.utils.packing import packed_init

    cfg = SAM_VIT_H
    d, mlp = cfg.encoder_dim, 4 * cfg.encoder_dim          # 1280, 5120
    shapes = {
        # name: (M, K, N, per-image count)
        "qkv_win": (4900, d, 3 * d, 28),
        "qkv_glb": (4096, d, 3 * d, 4),
        "proj_win": (4900, d, d, 28),
        "proj_glb": (4096, d, d, 4),
        "mlp1_win": (4900, d, mlp, 28),
        "mlp1_glb": (4096, d, mlp, 4),
        "mlp2_win": (4900, mlp, d, 28),
        "mlp2_glb": (4096, mlp, d, 4),
        "ref_4k3": (4096, 4096, 4096, 0),
    }

    key = jax.random.PRNGKey(0)
    mats = {}
    for name, (m, k, n, _) in shapes.items():
        k1, k2 = jax.random.split(jax.random.fold_in(key, hash(name) % 97))
        mats[name] = (jax.random.normal(k1, (m, k), jnp.bfloat16),
                      jax.random.normal(k2, (k, n), jnp.bfloat16))

    mm = jax.jit(lambda a, b: jax.lax.dot(
        a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))

    sam_params = packed_init(
        lambda k: init_sam_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    pre = jnp.asarray(rng.standard_normal(
        (1, cfg.image_size, cfg.image_size, 3)), jnp.float32)
    retry("encode warm", lambda: sync_tree(encode_image(sam_params, cfg,
                                                        pre)))
    for name in shapes:
        a, b = mats[name]
        retry(f"warm {name}", lambda a=a, b=b: sync_tree(mm(a, b)))

    def loop(fn, n):
        out = fn()
        sync_tree(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync_tree(out)
        return (time.perf_counter() - t0) / n

    for rnd in range(3):
        tf = {}
        matmul_total_ms = 0.0
        for name, (m, k, n, cnt) in shapes.items():
            a, b = mats[name]
            t = loop(lambda a=a, b=b: mm(a, b), n=30)
            tf[name] = 2 * m * k * n / t / 1e12
            matmul_total_ms += 1000 * t * cnt
        t_enc = loop(lambda: encode_image(sam_params, cfg, pre), n=6)
        parts = " ".join(f"{nm}={tf[nm]:.0f}TF" for nm in shapes)
        print(f"[enc] round{rnd} {parts}", flush=True)
        print(f"[enc] round{rnd} encode={1000*t_enc:.1f}ms "
              f"matmul_lower_bound={matmul_total_ms:.1f}ms "
              f"residual={1000*t_enc - matmul_total_ms:.1f}ms "
              f"(attention einsums + LN + window reshapes + neck)",
              flush=True)


if __name__ == "__main__":
    main()
