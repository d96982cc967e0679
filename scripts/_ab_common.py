"""Shared scaffolding for the TPU A/B and probe scripts.

Every decode-path A/B needs the same setup: retrying tunnel-dropped
compiles (CLAUDE.md: the compile server drops long compiles under
co-tenant load), an async-loop sync helper, and the SAM encode front
(packed params → fused preprocess → encode → image pe → point grid) at
the 17places production shapes. Methodology fixes (e.g. to the retry
policy) belong HERE, once.

Import side-effect-free; everything JAX-touching lives inside functions
so scripts control backend/init order.
"""
import sys
import time
from types import SimpleNamespace


def retry(label, fn, attempts=4, sleep_s=60):
    """Retry tunnel-dropped compiles (Broken pipe / transient aborts)."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:                       # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            print(f"[ab] {label} attempt {i + 1} failed: {msg}",
                  file=sys.stderr, flush=True)
            if i == attempts - 1:
                raise
            time.sleep(sleep_s)


def sync_tree(o):
    """Force ONE tiny readback — block_until_ready does not block through
    the tunnel (CLAUDE.md). None leaves (keys-mode pstate) are skipped."""
    import jax
    import jax.numpy as jnp
    leaf = [x for x in jax.tree_util.tree_leaves(o) if x is not None][0]
    float(jnp.ravel(leaf)[0].astype(jnp.float32))


def timed_loop(fn, n, sync=sync_tree):
    """Async-loop timing: n back-to-back dispatches, ONE final sync,
    seconds per dispatch (BASELINE.md methodology amendment 2). Runs one
    warm dispatch+sync FIRST so compile/warmup never lands inside the
    timed window (ADVICE r4 — the scripts' local loop() helpers all do
    this; the shared helper must match)."""
    sync(fn())
    out = None
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def sam_setup(dataset="17places", seed=0):
    """SAM encode front at production shapes: packed bf16 ViT-H params,
    fused preprocess of one synthetic image, encoder embedding + dense pe.

    Returns a namespace with everything the decode A/Bs consume:
    cfg, ds, H, W, sam_hw, input_hw, rng, sam_params, img_dev, pre, emb,
    image_pe.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from revisit_anything_tpu.config import get_dataset
    from revisit_anything_tpu.models.sam import SAM_VIT_H, init_sam_params
    from revisit_anything_tpu.models.sam.amg import resize_longest_side
    from revisit_anything_tpu.models.sam.encoder import encode_image
    from revisit_anything_tpu.models.sam.prompt import (
        dense_positional_embedding)
    from revisit_anything_tpu.ops.resize import bilinear_weight_matrix
    from revisit_anything_tpu.pipeline.serve import _sam_preprocess_fused
    from revisit_anything_tpu.utils.packing import packed_init

    rng = np.random.default_rng(seed)
    ds = get_dataset(dataset)
    H, W = ds.size.hw
    sam_hw = ds.sam_size.hw
    cfg = SAM_VIT_H

    sam_params = packed_init(
        lambda k: init_sam_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))

    input_hw = resize_longest_side(sam_hw[0], sam_hw[1], cfg.image_size)
    img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    img_dev = jax.device_put(img)
    down_h = bilinear_weight_matrix(sam_hw[0], H)
    down_w = bilinear_weight_matrix(sam_hw[1], W)
    up_h = bilinear_weight_matrix(input_hw[0], sam_hw[0])
    up_w = bilinear_weight_matrix(input_hw[1], sam_hw[1])
    rh = jnp.asarray(up_h @ down_h)
    rw = jnp.asarray(up_w @ down_w)
    pre = _sam_preprocess_fused(img_dev, rh, rw, cfg, cfg.image_size)
    emb = encode_image(sam_params, cfg, pre)[0]
    image_pe = dense_positional_embedding(sam_params, cfg)[0]
    return SimpleNamespace(cfg=cfg, ds=ds, H=H, W=W, sam_hw=sam_hw,
                           input_hw=input_hw, rng=rng,
                           sam_params=sam_params, img_dev=img_dev, pre=pre,
                           emb=emb, image_pe=image_pe)


def point_grid(s, n_side=32):
    """The AMG 32x32 point grid in input coordinates [n_side², 2]."""
    import jax.numpy as jnp
    import numpy as np

    from revisit_anything_tpu.models.sam.amg import build_point_grid

    grid = build_point_grid(n_side)
    pts_orig = grid * np.array([s.sam_hw[1], s.sam_hw[0]], np.float32)
    scale = np.array([s.input_hw[1] / s.sam_hw[1],
                      s.input_hw[0] / s.sam_hw[0]], np.float32)
    return jnp.asarray((pts_orig * scale).astype(np.float32))


def prompt_tokens(s, pts):
    """Decoder-entry tensors for a prompt batch: (dec_params, tokens,
    shared_src, src_pe_one) exactly as decode_masks builds them."""
    import jax.numpy as jnp

    from revisit_anything_tpu.models.sam.prompt import (
        embed_points, no_mask_dense_embedding)
    from revisit_anything_tpu.utils.packing import maybe_unpack

    up = maybe_unpack(s.sam_params)
    dec = up["decoder"]
    bsz = pts.shape[0]
    sparse = embed_points(up, s.cfg, pts[:, None, :],
                          jnp.ones((bsz, 1), jnp.int32), pad=True)
    dense = no_mask_dense_embedding(up, s.cfg, 1)
    g, d = s.cfg.grid, s.cfg.prompt_dim
    out_tokens = jnp.concatenate([dec["iou_token"], dec["mask_tokens"]],
                                 axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens[None], (bsz,) + out_tokens.shape),
         sparse.astype(out_tokens.dtype)], axis=1)
    shared_src = (s.emb[None] + dense[:1]).reshape(1, g * g, d)
    src_pe_one = s.image_pe.reshape(1, g * g, d).astype(shared_src.dtype)
    return dec, tokens, shared_src, src_pe_one
