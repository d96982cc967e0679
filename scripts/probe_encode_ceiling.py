"""Encode ceiling probe v2 (round-4 verdict item 6): is sam_encode's
~0.49-nominal MFU structural, or is there a lever left?

v1 timed each constituent matmul as its own dispatch; at 0.3-1 ms of
device work per matmul the ~1 ms async launch cost dominated (proj
measured "13 TF" = exactly the launch floor) and the summed "lower
bound" exceeded the real encode time. v2 times everything INSIDE one
jit via lax.scan chains (dispatch cost amortized over 32-256 steps):

  1. per-shape sustained TF: scan over 32 stacked operand pairs, each
     step dot + scalar-sum epilogue (fuses on TPU — no extra HBM pass)
     — tests BASELINE's "K=1280 shapes cap at 115-160 TF" directly;
  2. a square 4k^3 reference chain (the 166 TF / 0.84-MFU ceiling pin);
  3. matmul SKELETON of the full encoder: 32-layer scan of
     qkv -> (q slice) proj -> mlp1 -> mlp2 with per-layer weights —
     the true matmul floor of encode_image in one program;
  4. full encode_image (production program, warm cache).

encode - skeleton = attention einsums + LN + window reshapes + neck +
residual adds: the structural non-matmul cost. If skeleton TF matches
the per-shape caps and encode - skeleton is small, encode is closed.

Working set: ~1.2 GB stacked skeleton weights + packed ViT-H params
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
        # name: (M, K, N)  — windowed N=4900 (25x196), global N=4096
        "qkv_win": (4900, d, 3 * d),
        "proj_win": (4900, d, d),
        "mlp1_win": (4900, d, mlp),
        "mlp2_win": (4900, mlp, d),
        "qkv_glb": (4096, d, 3 * d),
        "ref_4k3": (4096, 4096, 4096),
    }
    STEPS = 32

    key = jax.random.PRNGKey(0)

    def stacked(name, m, k, n):
        k1, k2 = jax.random.split(jax.random.fold_in(key, hash(name) % 97))
        return (jax.random.normal(k1, (STEPS, m, k), jnp.bfloat16),
                jax.random.normal(k2, (STEPS, k, n), jnp.bfloat16))

    @jax.jit
    def chain(A, B):
        # STEPS sequential matmuls in ONE program; the scalar-sum epilogue
        # forces each full dot and fuses into it (no extra HBM pass).
        def body(acc, ab):
            a, b = ab
            y = jax.lax.dot(a, b, preferred_element_type=jnp.float32)
            return acc + jnp.sum(y), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), (A, B))
        return acc

    # ---- skeleton: the encoder's matmuls, chained layer to layer ----
    L = cfg.encoder_depth                                   # 32
    rng = np.random.default_rng(0)

    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.02, jnp.bfloat16)

    Wqkv = w(L, d, 3 * d)
    Wproj = w(L, d, d)
    W1 = w(L, d, mlp)
    W2 = w(L, mlp, d)
    x0 = w(4900, d)

    @jax.jit
    def skeleton(x, Wqkv, Wproj, W1, W2):
        def layer(x, ws):
            wq, wp, w1, w2 = ws
            qkv = jax.lax.dot(x, wq, preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
            q = qkv[:, :d]
            y = jax.lax.dot(q, wp, preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            h = jax.lax.dot(y, w1, preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            o = jax.lax.dot(h, w2, preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            return x + o, ()
        x, _ = jax.lax.scan(layer, x, (Wqkv, Wproj, W1, W2))
        return jnp.sum(x.astype(jnp.float32))
    skel_flops = 2 * 4900 * d * (3 * d + d + mlp + mlp) * L

    sam_params = packed_init(
        lambda k: init_sam_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(1))
    pre = jnp.asarray(rng.standard_normal(
        (1, cfg.image_size, cfg.image_size, 3)), jnp.float32)

    mats = {nm: stacked(nm, *s) for nm, s in shapes.items()}
    retry("encode warm", lambda: sync_tree(encode_image(sam_params, cfg,
                                                        pre)))
    for nm in shapes:
        A, B = mats[nm]
        retry(f"warm {nm}", lambda A=A, B=B: sync_tree(chain(A, B)))
    retry("warm skeleton",
          lambda: sync_tree(skeleton(x0, Wqkv, Wproj, W1, W2)))

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
        for nm, (m, k, n) in shapes.items():
            A, B = mats[nm]
            t = loop(lambda A=A, B=B: chain(A, B), n=6)
            tf[nm] = 2 * m * k * n * STEPS / t / 1e12
        t_skel = loop(lambda: skeleton(x0, Wqkv, Wproj, W1, W2), n=10)
        t_enc = loop(lambda: encode_image(sam_params, cfg, pre), n=6)
        parts = " ".join(f"{nm}={tf[nm]:.0f}TF" for nm in shapes)
        print(f"[enc] round{rnd} {parts}", flush=True)
        print(f"[enc] round{rnd} encode={1000*t_enc:.1f}ms "
              f"skeleton={1000*t_skel:.1f}ms "
              f"({skel_flops/t_skel/1e12:.0f}TF) "
              f"nonmatmul_residual={1000*(t_enc - t_skel):.1f}ms",
              flush=True)


if __name__ == "__main__":
    main()
