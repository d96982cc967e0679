"""Measure per-program launch overhead through the tunnel.

T: 64 async trivial jit calls (device ~0) chained by data dependency?
   No — independent calls, one final sync: per-call launch cost.
T2: 64 async trivial calls with data dependency (x = f(x)): serialized
   on device, still one final sync.
E: 16 async encode-only calls (known device ~57 ms at nominal), one
   final sync: per-call = launch + device.
F: 16 async fused-front calls, one final sync (per-call = launch +
   front device time).
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from revisit_anything_tpu.config import get_dataset
    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.models.sam import SAM_VIT_H, init_sam_params
    from revisit_anything_tpu.models.sam.amg import AmgConfig
    from revisit_anything_tpu.models.sam.encoder import encode_image
    from revisit_anything_tpu.pipeline.serve import _sam_preprocess_fused
    from revisit_anything_tpu.ops.resize import bilinear_weight_matrix
    from revisit_anything_tpu.utils.packing import packed_init

    rng = np.random.default_rng(0)
    ds = get_dataset("17places")
    H, W = ds.size.hw
    sam_hw = ds.sam_size.hw

    sam_params = packed_init(
        lambda k: init_sam_params(SAM_VIT_H, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))

    trivial = jax.jit(lambda x: x + 1.0)
    x8 = jnp.zeros((8, 8))
    float(jnp.ravel(trivial(x8))[0])

    img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    img_dev = jax.device_put(img)
    sh, sw = sam_hw
    from revisit_anything_tpu.models.sam.amg import resize_longest_side
    input_hw = resize_longest_side(sh, sw, SAM_VIT_H.image_size)
    down_h = bilinear_weight_matrix(sh, H)
    down_w = bilinear_weight_matrix(sw, W)
    up_h = bilinear_weight_matrix(input_hw[0], sh)
    up_w = bilinear_weight_matrix(input_hw[1], sw)
    rh = jnp.asarray(up_h @ down_h)
    rw = jnp.asarray(up_w @ down_w)
    pre = _sam_preprocess_fused(img_dev, rh, rw, SAM_VIT_H,
                                SAM_VIT_H.image_size)
    e = encode_image(sam_params, SAM_VIT_H, pre)[0]
    float(jnp.ravel(e)[0])
    print("[lo] warm", file=sys.stderr, flush=True)

    for rnd in range(3):
        # T: independent trivial calls
        xs = [jnp.full((8, 8), float(i)) for i in range(64)]
        float(jnp.ravel(trivial(x8))[0])
        t0 = time.perf_counter()
        outs = [trivial(x) for x in xs]
        float(jnp.ravel(outs[-1])[0])
        dt = time.perf_counter() - t0
        print(f"[lo] round{rnd} T(64 indep trivial): "
              f"{1000*dt/64:.1f} ms/call", flush=True)

        # T2: dependent trivial calls
        t0 = time.perf_counter()
        y = x8
        for _ in range(64):
            y = trivial(y)
        float(jnp.ravel(y)[0])
        dt = time.perf_counter() - t0
        print(f"[lo] round{rnd} T2(64 dep trivial): "
              f"{1000*dt/64:.1f} ms/call", flush=True)

        # E: encode-only loop
        t0 = time.perf_counter()
        es = [encode_image(sam_params, SAM_VIT_H, pre)[0]
              for _ in range(16)]
        float(jnp.ravel(es[-1])[0])
        dt = time.perf_counter() - t0
        print(f"[lo] round{rnd} E(16 encodes): "
              f"{1000*dt/16:.1f} ms/call", flush=True)


if __name__ == "__main__":
    main()
