"""DINOv1 (legacy) feature extractor — stride-patched ViT + log-binned
descriptors.

Covers the reference's DINO/ package (dino_feature_extractor.py:23-420,
dino_wrapper.py): a timm-style ViT (identical block math to DINOv2 minus
LayerScale/SwiGLU, so the dinov2 forward is reused) whose patch-embedding
conv STRIDE is overridden for denser token grids (patch_vit_resolution
:150-172), facet extraction at a chosen layer, and GSP log-binned
descriptors (_log_bin :288-358).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from revisit_anything_tpu.models import dinov2 as dn

# DINOv1 variants (facebookresearch/dino): trained at 224px.
VIT_S8 = dn.DinoV2Config(embed_dim=384, depth=12, num_heads=6, patch_size=8,
                         layerscale=False, pretrain_grid=(28, 28))
VIT_S16 = dn.DinoV2Config(embed_dim=384, depth=12, num_heads=6,
                          patch_size=16, layerscale=False,
                          pretrain_grid=(14, 14))
VIT_B8 = dn.DinoV2Config(embed_dim=768, depth=12, num_heads=12, patch_size=8,
                         layerscale=False, pretrain_grid=(28, 28))
VIT_B16 = dn.DinoV2Config(embed_dim=768, depth=12, num_heads=12,
                          patch_size=16, layerscale=False,
                          pretrain_grid=(14, 14))

CONFIGS = {"dino_vits8": VIT_S8, "dino_vits16": VIT_S16,
           "dino_vitb8": VIT_B8, "dino_vitb16": VIT_B16}


def strided_grid(h: int, w: int, patch: int, stride: int) -> Tuple[int, int]:
    """Token grid for overlapping patches: 1 + (dim - patch) // stride."""
    return 1 + (h - patch) // stride, 1 + (w - patch) // stride


def embed_patches_strided(params, cfg: dn.DinoV2Config, images: jnp.ndarray,
                          stride: int) -> jnp.ndarray:
    """Patch embedding with a stride override (overlapping patches) +
    bicubic pos-embed interpolation to the strided grid."""
    images = images.astype(params["patch_embed"]["w"].dtype)
    b, h, w, _ = images.shape
    p = cfg.patch_size
    gh, gw = strided_grid(h, w, p, stride)

    # conv patch embed: kernel [p, p, 3, D] from our matmul layout
    kernel = params["patch_embed"]["w"].reshape(p, p, 3, cfg.embed_dim)
    x = jax.lax.conv_general_dilated(
        images, kernel, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(images.dtype)
    x = x.reshape(b, gh * gw, cfg.embed_dim) + params["patch_embed"]["b"]

    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)

    # pos-embed resample via dn.interpolate_pos_embed: DINOv1's
    # _fix_pos_enc uses the same +0.1 interpolate-offset scale-factor
    # semantics as DINOv2's hub code (cfg.interpolate_offset) — a plain
    # size-based bicubic drops the offset and breaks feature parity
    pos = dn.interpolate_pos_embed(params, cfg, (gh, gw))
    return x + pos.astype(x.dtype)


@partial(jax.jit, static_argnames=("cfg", "layer", "facet", "stride",
                                   "use_cls"))
def extract_dense(params, cfg: dn.DinoV2Config, images: jnp.ndarray,
                  layer: int = 11, facet: str = "key", stride: int = None,
                  use_cls: bool = False) -> jnp.ndarray:
    """Dense DINOv1 facet features [B, N(, +cls), D] at layer ``layer``
    (ViTExtractor._extract_features + facet slicing :198-253)."""
    from revisit_anything_tpu.utils.packing import maybe_unpack
    params = maybe_unpack(params)
    stride = stride or cfg.patch_size
    x = embed_patches_strided(params, cfg, images, stride)
    for blk in params["blocks"][:layer]:
        x = dn._block(x, blk, cfg)
    skip = 0 if use_cls else 1
    if facet == "token":
        x = dn._block(x, params["blocks"][layer], cfg)
        return x[:, skip:]
    blk = params["blocks"][layer]
    qkv = dn._dense(dn._layer_norm(x, blk["norm1"], cfg.eps), blk["qkv"])
    d = cfg.embed_dim
    sl = {"query": slice(0, d), "key": slice(d, 2 * d),
          "value": slice(2 * d, 3 * d)}[facet]
    out = qkv[:, skip:, sl]
    # The reference ViTExtractor emits facet channels HEAD-MINOR: the
    # hook captures [B, h, t, hd] and extract_descriptors flattens via
    # permute(0, 2, 3, 1) → channel = dim·H + head
    # (dino_feature_extractor.py:225,394-397). The fused qkv output is
    # head-MAJOR (channel = head·hd + dim) — permute to match, else
    # descriptors are channel-permuted vs reference artifacts. (DINOv2's
    # AnyLoc extractor slices the raw fused qkv with NO permute —
    # utilities.py:274-281 — so dinov2.extract_dense stays head-major.)
    b, n = out.shape[0], out.shape[1]
    heads = cfg.num_heads
    out = out.reshape(b, n, heads, d // heads)
    return jnp.transpose(out, (0, 1, 3, 2)).reshape(b, n, d)


def _avg_pool_excl_pad(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """AvgPool2d(win, stride 1, pad win//2, count_include_pad=False) on
    [B, C, H, W]."""
    if win == 1:
        return x
    pad = win // 2
    ones = jnp.ones((1, 1, x.shape[2], x.shape[3]), x.dtype)
    kernel = jnp.ones((win, win, 1, 1), x.dtype)

    def conv(v, feature_count):
        return jax.lax.conv_general_dilated(
            v, kernel, window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            feature_group_count=feature_count,
            preferred_element_type=jnp.float32)

    # depthwise sum then divide by per-position valid counts
    sums = jax.lax.conv_general_dilated(
        x, jnp.ones((win, win, 1, x.shape[1]), x.dtype),
        window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=x.shape[1],
        preferred_element_type=jnp.float32)
    counts = conv(ones, 1)
    return (sums / counts).astype(x.dtype)


@partial(jax.jit, static_argnames=("grid_hw", "hierarchy"))
def log_bin(features: jnp.ndarray, grid_hw: Tuple[int, int],
            hierarchy: int = 2) -> jnp.ndarray:
    """GSP log-binned descriptors (_log_bin :288-358): per location,
    concatenate ring samples of avg-pooled maps at scales 3^k with edge
    clamping; bins are emitted in raster (k, di, dj) order, so the
    location itself is the CENTER of the k=0 ring (index 4), matching
    the reference ordering.

    Args:
      features: [B, P, D] dense facet features (P = gh*gw).
    Returns [B, P, D * (1 + 8*hierarchy)].
    """
    gh, gw = grid_hw
    b, p, d = features.shape
    x = features.transpose(0, 2, 1).reshape(b, d, gh, gw)

    pooled = [_avg_pool_excl_pad(x, 3 ** k) for k in range(hierarchy)]

    ys = np.arange(gh)[:, None]
    xs = np.arange(gw)[None, :]
    parts = []
    for k in range(hierarchy):
        step = 3 ** k
        for di in (-step, 0, step):
            for dj in (-step, 0, step):
                if k != 0 and di == 0 and dj == 0:
                    continue
                ci = np.clip(ys + di, 0, gh - 1)
                cj = np.clip(xs + dj, 0, gw - 1)
                idx = (ci * gw + cj).reshape(-1)          # [P]
                flat = pooled[k].reshape(b, d, gh * gw)
                parts.append(flat[:, :, jnp.asarray(idx)])
    out = jnp.concatenate(parts, axis=1)                  # [B, D*bins, P]
    return out.transpose(0, 2, 1)


def load_checkpoint(path: str, cfg: dn.DinoV2Config):
    """DINOv1 hub checkpoints use the same fused-qkv timm layout the
    dinov2 converter handles (no ls1/ls2 keys → no LayerScale)."""
    return dn.load_checkpoint(path, cfg)
