"""Measure the chip's achievable bf16 matmul peak (the MFU denominator).

Round-3 verdict flagged a 1.35x contradiction: bench.py used
PEAK_FLOPS=197e12 ("TPU v5e bf16" datasheet) while BASELINE.md's roofline
section claimed "265 TFLOPS bf16 measured".  This probe settles it with
large square bf16 matmuls (8192^3 = 1.1 TFLOP each), async-loop timed
(N back-to-back dispatches, ONE sync readback — the only sound method
through the tunnel, BASELINE.md methodology amendment 2), operands
generated on device and passed as jit ARGUMENTS.

Several shapes are probed; the max over shapes is the measured peak a
kernel could theoretically reach — bench.py's BENCH_PEAK_FLOPS and
BASELINE.md's roofline constant must both cite this number.
"""
import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"[peak] device: {dev.device_kind} ({dev.platform})",
          file=sys.stderr, flush=True)

    @jax.jit
    def mm(a, b):
        return a @ b

    def gen(n, k, m, seed):
        @jax.jit
        def _g(key):
            k1, k2 = jax.random.split(key)
            return (jax.random.normal(k1, (n, k), jnp.bfloat16),
                    jax.random.normal(k2, (k, m), jnp.bfloat16))
        return _g(jax.random.PRNGKey(seed))

    def sync(x):
        float(jnp.ravel(x)[0].astype(jnp.float32))

    results = {}
    shapes = [(4096, 4096, 4096), (8192, 8192, 8192),
              (8192, 16384, 8192), (16384, 8192, 16384)]
    for rnd in range(3):
        for (n, k, m) in shapes:
            a, b = gen(n, k, m, 0)
            out = mm(a, b)
            sync(out)                       # compile + first-exec
            iters = max(4, int(40e12 / (2 * n * k * m)))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = mm(a, b)
            sync(out)
            dt = (time.perf_counter() - t0) / iters
            tf = 2.0 * n * k * m / dt / 1e12
            key = f"{n}x{k}x{m}"
            results.setdefault(key, []).append(tf)
            print(f"[peak] round{rnd} {key}: {1000*dt:.2f} ms "
                  f"-> {tf:.1f} TFLOP/s", file=sys.stderr, flush=True)

    best = {k: max(v) for k, v in results.items()}
    peak = max(best.values())
    print(json.dumps({"device_kind": dev.device_kind,
                      "per_shape_tflops": {k: round(v, 1)
                                           for k, v in best.items()},
                      "measured_peak_tflops": round(peak, 1)}))


if __name__ == "__main__":
    main()
