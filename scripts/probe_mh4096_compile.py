"""Reproduce the sweep failure: keys-mode mask head at content 4096,
blk 4096 (SFXL/AmsterTime shapes) — abstract lower+compile, no HBM."""
import jax
import jax.numpy as jnp

from revisit_anything_tpu.ops.maskhead import fused_mask_head

D, C2, M, CONTENT = 256, 32, 3, 4096


def run(block):
    ks = jax.ShapeDtypeStruct((1024, CONTENT, D), jnp.bfloat16)
    hs = jax.ShapeDtypeStruct((1024, M, C2), jnp.bfloat16)
    args = dict(
        up1_w=jnp.zeros((D, D), jnp.bfloat16),
        up1_b=jnp.zeros((D // 4,), jnp.bfloat16),
        ln_scale=jnp.zeros((D // 4,), jnp.bfloat16),
        ln_bias=jnp.zeros((D // 4,), jnp.bfloat16),
        up2_w=jnp.zeros((D // 4, 4 * C2), jnp.bfloat16),
        up2_b=jnp.zeros((C2,), jnp.bfloat16),
    )
    fn = jax.jit(lambda k, hy: fused_mask_head(
        k, hy, block=block, content=CONTENT, **args))
    try:
        fn.lower(ks, hs).compile()
        print(f"[mh] block={block}: OK", flush=True)
    except Exception as e:                                # noqa: BLE001
        print(f"[mh] block={block}: FAIL {str(e).splitlines()[0][:200]}",
              flush=True)


for blk in (4096, 2048):
    run(blk)
