"""SAM parameter-tree construction (random init for tests/dry-runs)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from revisit_anything_tpu.models.sam.config import SamArchConfig

Params = Dict[str, Any]


def init_sam_params(cfg: SamArchConfig, key: jax.Array,
                    dtype=jnp.float32) -> Params:
    """Random-init parameters. Traced under one jit — eager per-op dispatch
    is pathologically slow in this environment."""
    return jax.jit(lambda k: _init_sam_params(cfg, k, dtype))(key)


def _init_sam_params(cfg: SamArchConfig, key: jax.Array,
                     dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 67 + 20 * cfg.encoder_depth))
    d = cfg.encoder_dim
    pd = cfg.prompt_dim

    def dense(i, o, bias=True, scale=0.02):
        p = {"w": jax.random.normal(next(keys), (i, o), dtype) * scale}
        p["b"] = jnp.zeros((o,), dtype) if bias else None
        return p

    def ln(n):
        return {"scale": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}

    blocks = []
    for i in range(cfg.encoder_depth):
        size = cfg.grid if i in cfg.global_attn_indexes else cfg.window_size
        blocks.append({
            "norm1": ln(d),
            "qkv": dense(d, 3 * d),
            "proj": dense(d, d),
            "rel_pos_h": jnp.zeros((2 * size - 1, cfg.head_dim), dtype),
            "rel_pos_w": jnp.zeros((2 * size - 1, cfg.head_dim), dtype),
            "norm2": ln(d),
            "lin1": dense(d, int(d * cfg.mlp_ratio)),
            "lin2": dense(int(d * cfg.mlp_ratio), d),
        })

    encoder = {
        "patch_embed": dense(cfg.patch_size * cfg.patch_size * 3, d),
        "pos_embed": jax.random.normal(
            next(keys), (1, cfg.grid, cfg.grid, d), dtype) * 0.02,
        "blocks": blocks,
        "neck": {
            "conv1_w": jax.random.normal(next(keys), (d, pd), dtype) * 0.02,
            "ln1": ln(pd),
            "conv2_w": jax.random.normal(
                next(keys), (3, 3, pd, pd), dtype) * 0.02,
            "ln2": ln(pd),
        },
    }

    mc = 16                    # mask_in_chans (build_sam.py:93)
    prompt = {
        "pe_gaussian": jax.random.normal(next(keys), (2, pd // 2), dtype),
        "point_embed": jax.random.normal(next(keys), (4, pd), dtype) * 0.02,
        "not_a_point": jax.random.normal(next(keys), (pd,), dtype) * 0.02,
        "no_mask": jax.random.normal(next(keys), (pd,), dtype) * 0.02,
        # mask-prompt downscaling stack (prompt_encoder.py:51-60)
        "mask_down": {
            "conv1_w": jax.random.normal(next(keys), (2, 2, 1, mc // 4),
                                         dtype) * 0.2,
            "conv1_b": jnp.zeros((mc // 4,), dtype),
            "ln1": ln(mc // 4),
            "conv2_w": jax.random.normal(next(keys), (2, 2, mc // 4, mc),
                                         dtype) * 0.1,
            "conv2_b": jnp.zeros((mc,), dtype),
            "ln2": ln(mc),
            "conv3_w": jax.random.normal(next(keys), (mc, pd),
                                         dtype) * 0.05,
            "conv3_b": jnp.zeros((pd,), dtype),
        },
    }

    def attn_block(downsample=2):
        inner = pd // downsample
        return {"q": dense(pd, inner), "k": dense(pd, inner),
                "v": dense(pd, inner), "out": dense(inner, pd)}

    layers = []
    for _ in range(cfg.decoder_depth):
        layers.append({
            "self_attn": attn_block(1),
            "norm1": ln(pd),
            "t2i": attn_block(2),
            "norm2": ln(pd),
            "lin1": dense(pd, cfg.decoder_mlp_dim),
            "lin2": dense(cfg.decoder_mlp_dim, pd),
            "norm3": ln(pd),
            "i2t": attn_block(2),
            "norm4": ln(pd),
        })

    def mlp(i, h, o, n):
        dims = [i] + [h] * (n - 1) + [o]
        return [dense(dims[j], dims[j + 1]) for j in range(n)]

    decoder = {
        "iou_token": jax.random.normal(next(keys), (1, pd), dtype) * 0.02,
        "mask_tokens": jax.random.normal(
            next(keys), (cfg.num_mask_tokens, pd), dtype) * 0.02,
        "layers": layers,
        "final_attn": attn_block(2),
        "norm_final": ln(pd),
        "up1_w": jax.random.normal(
            next(keys), (pd, (pd // 4) * 4), dtype) * 0.02,
        "up1_b": jnp.zeros((pd // 4,), dtype),
        "up_ln": ln(pd // 4),
        "up2_w": jax.random.normal(
            next(keys), (pd // 4, (pd // 8) * 4), dtype) * 0.02,
        "up2_b": jnp.zeros((pd // 8,), dtype),
        "hyper_mlps": [mlp(pd, pd, pd // 8, 3)
                       for _ in range(cfg.num_mask_tokens)],
        "iou_head": mlp(pd, cfg.iou_head_hidden, cfg.num_mask_tokens,
                        cfg.iou_head_depth),
    }

    return {"encoder": encoder, "prompt": prompt, "decoder": decoder}
