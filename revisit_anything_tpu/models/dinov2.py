"""DINOv2 vision transformer — functional JAX implementation.

Covers the reference's production feature extractor
(``DinoV2ExtractFeatures("dinov2_vitg14", layer=31, facet='value')``,
utilities.py:219-288) and the finetuned DINOv2-B backbone
(VLAD-BuFF/models/backbones/dinov2.py). TPU-first design decisions:

- Params are plain pytrees; the forward is a pure function under jit with
  static shapes per image-resolution bucket.
- The reference extracts the value facet with a forward hook on
  ``blocks[31].attn.qkv`` while running all 40 ViT-g blocks; here the facet
  is a structured output of ``extract_dense`` which runs only blocks 0..31
  — identical features at 20% less compute.
- Patch embedding is a reshape + one matmul (14x14 non-overlapping conv ==
  block-diagonal matmul), which maps straight onto the MXU.
- Attention runs in bf16 with f32 softmax/accumulation by default
  (``compute_dtype``); tests run f32 against a float64-ish torch oracle.

Architecture facts (public DINOv2, facebookresearch/dinov2):
ViT-g/14: embed 1536, depth 40, heads 24, SwiGLU-fused FFN (hidden 4096),
LayerScale, LN eps 1e-6, pretrain grid 37x37 (518px).
ViT-B/14: embed 768, depth 12, heads 12, MLP FFN.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DinoV2Config:
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int = 14
    mlp_ratio: float = 4.0
    ffn: str = "mlp"                  # "mlp" | "swiglu"
    layerscale: bool = True
    eps: float = 1e-6
    pretrain_grid: Tuple[int, int] = (37, 37)  # 518 // 14
    num_register_tokens: int = 0
    # hub DINOv2 interpolates pos embeddings with scale_factor =
    # (grid + 0.1) / pretrain_grid (interpolate_offset default 0.1,
    # dinov2 vision_transformer.py) — torch then maps coordinates by the
    # PROVIDED factor, not out/in. 0.0 reproduces size-based semantics
    # (HF Dinov2Model).
    interpolate_offset: float = 0.1

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def swiglu_hidden(self) -> int:
        # dinov2 SwiGLUFFNFused: (2/3 * 4 * D) rounded up to a multiple of 8
        h = int(self.embed_dim * self.mlp_ratio * 2 / 3)
        return (h + 7) // 8 * 8

    @property
    def mlp_hidden(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


VIT_G14 = DinoV2Config(embed_dim=1536, depth=40, num_heads=24, ffn="swiglu")
VIT_L14 = DinoV2Config(embed_dim=1024, depth=24, num_heads=16)
VIT_B14 = DinoV2Config(embed_dim=768, depth=12, num_heads=12)
VIT_S14 = DinoV2Config(embed_dim=384, depth=12, num_heads=6)

CONFIGS = {"dinov2_vitg14": VIT_G14, "dinov2_vitl14": VIT_L14,
           "dinov2_vitb14": VIT_B14, "dinov2_vits14": VIT_S14}

# ImageNet normalization used by every extractor in the reference
# (func_vpr.py:491-493).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def init_params(cfg: DinoV2Config, key: jax.Array,
                dtype=jnp.float32) -> Params:
    """Random-init parameter tree (trunc-normal-ish; exact init is
    irrelevant for inference — real weights come from checkpoints).
    Traced under one jit: eager per-op dispatch is very slow here."""
    return jax.jit(lambda k: _init_params(cfg, k, dtype))(key)


def _init_params(cfg: DinoV2Config, key: jax.Array,
                 dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 8 + 16 * cfg.depth))
    d = cfg.embed_dim

    def dense(kin, kout):
        w = jax.random.normal(next(keys), (kin, kout), dtype) * 0.02
        return {"w": w, "b": jnp.zeros((kout,), dtype)}

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    blocks = []
    for _ in range(cfg.depth):
        blk = {
            "norm1": ln(),
            "qkv": dense(d, 3 * d),
            "proj": dense(d, d),
            "norm2": ln(),
            "ls1": jnp.full((d,), 1e-5, dtype) if cfg.layerscale else None,
            "ls2": jnp.full((d,), 1e-5, dtype) if cfg.layerscale else None,
        }
        if cfg.ffn == "swiglu":
            blk["w12"] = dense(d, 2 * cfg.swiglu_hidden)
            blk["w3"] = dense(cfg.swiglu_hidden, d)
        else:
            blk["fc1"] = dense(d, cfg.mlp_hidden)
            blk["fc2"] = dense(cfg.mlp_hidden, d)
        blocks.append(blk)

    gh, gw = cfg.pretrain_grid
    params: Params = {
        "patch_embed": {
            "w": jax.random.normal(
                next(keys), (cfg.patch_size * cfg.patch_size * 3, d),
                dtype) * 0.02,
            "b": jnp.zeros((d,), dtype),
        },
        "cls_token": jax.random.normal(next(keys), (1, 1, d), dtype) * 0.02,
        "pos_embed": jax.random.normal(
            next(keys), (1, 1 + gh * gw, d), dtype) * 0.02,
        "blocks": blocks,
        "norm": ln(),
    }
    if cfg.num_register_tokens:
        params["register_tokens"] = jax.random.normal(
            next(keys), (1, cfg.num_register_tokens, d), dtype) * 0.02
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps):
    # f32-compute LN from bf16 storage (~3x faster than bf16-compute on
    # v5e, measured) then back to the input dtype.
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xn * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x, p):
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32).astype(
        x.dtype) + p["b"]


def _attention(x, blk, cfg: DinoV2Config):
    b, n, d = x.shape
    qkv = _dense(x, blk["qkv"])                      # [B, N, 3D]
    qkv = qkv.reshape(b, n, 3, cfg.num_heads, cfg.head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

    if jax.default_backend() == "tpu" and n >= 1024:
        # Long sequences (ViT-g at VPR resolutions: ~1500 tokens) go
        # through the Pallas flash kernel — the XLA path writes
        # [B, H, N, N] f32 scores to HBM twice per block (~7 GB over 32
        # blocks at 1530 tokens; the measured DINO bottleneck).
        from revisit_anything_tpu.ops.attention import attend
        out = attend(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                     v.transpose(0, 2, 1, 3))
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return _dense(out, blk["proj"])

    scale = 1.0 / math.sqrt(cfg.head_dim)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return _dense(out.reshape(b, n, d), blk["proj"])


def _ffn(x, blk, cfg: DinoV2Config):
    if cfg.ffn == "swiglu":
        x12 = _dense(x, blk["w12"])
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return _dense(jax.nn.silu(x1) * x2, blk["w3"])
    h = jax.nn.gelu(_dense(x, blk["fc1"]), approximate=False)
    return _dense(h, blk["fc2"])


def _block(x, blk, cfg: DinoV2Config):
    a = _attention(_layer_norm(x, blk["norm1"], cfg.eps), blk, cfg)
    if blk.get("ls1") is not None:
        a = a * blk["ls1"]
    x = x + a
    f = _ffn(_layer_norm(x, blk["norm2"], cfg.eps), blk, cfg)
    if blk.get("ls2") is not None:
        f = f * blk["ls2"]
    return x + f


def interpolate_pos_embed(params: Params, cfg: DinoV2Config,
                          grid_hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize the pretrain patch position grid to ``grid_hw`` (bicubic),
    keeping the cls position — dinov2's interpolate_pos_encoding with
    the hub scale-factor semantics (cfg.interpolate_offset; src coord =
    (dst+0.5)·pretrain/(grid+offset) − 0.5)."""
    pos = params["pos_embed"].astype(jnp.float32)
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    gh0, gw0 = cfg.pretrain_grid
    gh, gw = grid_hw
    if (gh, gw) != (gh0, gw0):
        from revisit_anything_tpu.ops.resize import bicubic_resize_torch
        grid = patch_pos.reshape(gh0, gw0, cfg.embed_dim)
        off = cfg.interpolate_offset
        scales = ((gh0 / (gh + off), gw0 / (gw + off)) if off
                  else (None, None))
        grid = bicubic_resize_torch(grid, (gh, gw), coord_scales=scales)
        patch_pos = grid.reshape(1, gh * gw, cfg.embed_dim)
    return jnp.concatenate([cls_pos, patch_pos], axis=1)


def embed_patches(params: Params, cfg: DinoV2Config,
                  images: jnp.ndarray) -> jnp.ndarray:
    """images [B, H, W, 3] (normalized, H/W multiples of 14) → tokens
    [B, 1+R+N, D] with pos embedding added. Computes in the params' dtype
    (bf16 params → bf16 activations)."""
    images = images.astype(params["patch_embed"]["w"].dtype)
    b, h, w, _ = images.shape
    p = cfg.patch_size
    gh, gw = h // p, w // p
    x = images.reshape(b, gh, p, gw, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * 3)
    x = jnp.dot(x, params["patch_embed"]["w"],
                preferred_element_type=jnp.float32).astype(images.dtype)
    x = x + params["patch_embed"]["b"]
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + interpolate_pos_embed(params, cfg, (gh, gw)).astype(x.dtype)
    if cfg.num_register_tokens:
        reg = jnp.broadcast_to(params["register_tokens"].astype(x.dtype),
                               (b, cfg.num_register_tokens, cfg.embed_dim))
        x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)
    return x


@partial(jax.jit, static_argnames=("cfg", "num_blocks", "final_norm"))
def forward_tokens(params: Params, cfg: DinoV2Config, images: jnp.ndarray,
                   num_blocks: Optional[int] = None,
                   final_norm: bool = True) -> jnp.ndarray:
    """Run the first ``num_blocks`` transformer blocks (all if None).

    Returns token states [B, 1+R+N, D]."""
    from revisit_anything_tpu.utils.packing import maybe_unpack
    params = maybe_unpack(params)
    x = embed_patches(params, cfg, images)
    n = cfg.depth if num_blocks is None else num_blocks
    for blk in params["blocks"][:n]:
        x = _block(x, blk, cfg)
    if final_norm:
        x = _layer_norm(x, params["norm"], cfg.eps)
    return x


@partial(jax.jit, static_argnames=("cfg", "layer", "facet"))
def extract_dense(params: Params, cfg: DinoV2Config, images: jnp.ndarray,
                  layer: int, facet: str = "value") -> jnp.ndarray:
    """Dense patch features, reproducing DinoV2ExtractFeatures semantics
    (utilities.py:263-288) without hooks.

    facet "query"/"key"/"value": the corresponding slice of block
    ``layer``'s qkv projection (computed from blocks 0..layer-1 outputs +
    block ``layer``'s norm1/qkv — the hook point). facet "token": the
    output of block ``layer``.

    Returns [B, N_patches, D] (cls/register tokens dropped, no norm —
    the production extractor uses norm_descs=False, func_vpr.py:532).
    """
    from revisit_anything_tpu.utils.packing import maybe_unpack
    params = maybe_unpack(params)
    x = embed_patches(params, cfg, images)
    for blk in params["blocks"][:layer]:
        x = _block(x, blk, cfg)
    skip = 1 + cfg.num_register_tokens
    if facet == "token":
        x = _block(x, params["blocks"][layer], cfg)
        return x[:, skip:]
    blk = params["blocks"][layer]
    qkv = _dense(_layer_norm(x, blk["norm1"], cfg.eps), blk["qkv"])
    d = cfg.embed_dim
    sl = {"query": slice(0, d), "key": slice(d, 2 * d),
          "value": slice(2 * d, 3 * d)}[facet]
    return qkv[:, skip:, sl]


def preprocess(images_uint8: np.ndarray,
               patch_multiple: bool = True) -> np.ndarray:
    """RGB uint8 [B, H, W, 3] → normalized float32, center-cropped to
    patch-size multiples (getAnyLocFt semantics, func_vpr.py:489-506)."""
    x = images_uint8.astype(np.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    if patch_multiple:
        h, w = x.shape[1:3]
        hn, wn = (h // 14) * 14, (w // 14) * 14
        top, left = center_crop_offsets(h, w, hn, wn)
        x = x[:, top:top + hn, left:left + wn]
    return x


def center_crop_offsets(h: int, w: int, hn: int, wn: int):
    """torchvision CenterCrop offsets: int(round(trim / 2.0)) with
    Python's banker's rounding — NOT floor; they differ for trims 3, 7,
    11 (e.g. H=479: round(1.5)=2 vs floor 1), shifting the whole crop by
    one pixel vs the reference (tvf.CenterCrop in getAnyLocFt,
    func_vpr.py:489-506)."""
    return int(round((h - hn) / 2.0)), int(round((w - wn) / 2.0))


# ---------------------------------------------------------------------------
# Checkpoint conversion (host-side; torch used for deserialization only)
# ---------------------------------------------------------------------------


def convert_dinov2_hub_state_dict(sd: Dict[str, np.ndarray],
                                  cfg: DinoV2Config) -> Params:
    """Map the official facebookresearch/dinov2 checkpoint layout (fused
    qkv, SwiGLU w12/w3 or MLP fc1/fc2) onto our param tree. ``sd`` maps
    name → numpy array."""
    g = lambda k: jnp.asarray(np.asarray(sd[k], dtype=np.float32))

    def dense(prefix, transpose=True):
        w = g(prefix + ".weight")
        return {"w": w.T if transpose else w, "b": g(prefix + ".bias")}

    def ln(prefix):
        return {"scale": g(prefix + ".weight"), "bias": g(prefix + ".bias")}

    blocks = []
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        blk = {
            "norm1": ln(p + ".norm1"),
            "qkv": dense(p + ".attn.qkv"),
            "proj": dense(p + ".attn.proj"),
            "norm2": ln(p + ".norm2"),
            "ls1": g(p + ".ls1.gamma") if f"{p}.ls1.gamma" in sd else None,
            "ls2": g(p + ".ls2.gamma") if f"{p}.ls2.gamma" in sd else None,
        }
        if cfg.ffn == "swiglu":
            blk["w12"] = dense(p + ".mlp.w12")
            blk["w3"] = dense(p + ".mlp.w3")
        else:
            blk["fc1"] = dense(p + ".mlp.fc1")
            blk["fc2"] = dense(p + ".mlp.fc2")
        blocks.append(blk)

    pe_w = np.asarray(sd["patch_embed.proj.weight"], dtype=np.float32)
    # conv [D, 3, p, p] → matmul [(p*p*3), D] matching our reshape order
    # (gh, p, gw, p, 3) → (p, p, 3) flattened.
    pe_w = pe_w.transpose(2, 3, 1, 0).reshape(-1, cfg.embed_dim)

    params: Params = {
        "patch_embed": {"w": jnp.asarray(pe_w),
                        "b": g("patch_embed.proj.bias")},
        "cls_token": g("cls_token"),
        "pos_embed": g("pos_embed"),
        "blocks": blocks,
        "norm": ln("norm"),
    }
    if "register_tokens" in sd:
        params["register_tokens"] = g("register_tokens")
    return params


def convert_transformers_state_dict(sd: Dict[str, np.ndarray],
                                    cfg: DinoV2Config) -> Params:
    """Map a HuggingFace transformers Dinov2Model state dict (split q/k/v)
    onto our param tree."""
    g = lambda k: np.asarray(sd[k], dtype=np.float32)

    def ln(prefix):
        return {"scale": jnp.asarray(g(prefix + ".weight")),
                "bias": jnp.asarray(g(prefix + ".bias"))}

    blocks = []
    for i in range(cfg.depth):
        p = f"encoder.layer.{i}"
        a = p + ".attention.attention"
        qkv_w = np.concatenate([g(a + ".query.weight"), g(a + ".key.weight"),
                                g(a + ".value.weight")], axis=0)
        qkv_b = np.concatenate([g(a + ".query.bias"), g(a + ".key.bias"),
                                g(a + ".value.bias")], axis=0)
        blk = {
            "norm1": ln(p + ".norm1"),
            "qkv": {"w": jnp.asarray(qkv_w.T), "b": jnp.asarray(qkv_b)},
            "proj": {"w": jnp.asarray(g(p + ".attention.output.dense.weight").T),
                     "b": jnp.asarray(g(p + ".attention.output.dense.bias"))},
            "norm2": ln(p + ".norm2"),
            "ls1": jnp.asarray(g(p + ".layer_scale1.lambda1")),
            "ls2": jnp.asarray(g(p + ".layer_scale2.lambda1")),
        }
        if cfg.ffn == "swiglu":
            blk["w12"] = {"w": jnp.asarray(g(p + ".mlp.weights_in.weight").T),
                          "b": jnp.asarray(g(p + ".mlp.weights_in.bias"))}
            blk["w3"] = {"w": jnp.asarray(g(p + ".mlp.weights_out.weight").T),
                         "b": jnp.asarray(g(p + ".mlp.weights_out.bias"))}
        else:
            blk["fc1"] = {"w": jnp.asarray(g(p + ".mlp.fc1.weight").T),
                          "b": jnp.asarray(g(p + ".mlp.fc1.bias"))}
            blk["fc2"] = {"w": jnp.asarray(g(p + ".mlp.fc2.weight").T),
                          "b": jnp.asarray(g(p + ".mlp.fc2.bias"))}
        blocks.append(blk)

    pe_w = g("embeddings.patch_embeddings.projection.weight")
    pe_w = pe_w.transpose(2, 3, 1, 0).reshape(-1, cfg.embed_dim)
    return {
        "patch_embed": {"w": jnp.asarray(pe_w),
                        "b": jnp.asarray(
                            g("embeddings.patch_embeddings.projection.bias"))},
        "cls_token": jnp.asarray(g("embeddings.cls_token")),
        "pos_embed": jnp.asarray(g("embeddings.position_embeddings")),
        "blocks": blocks,
        "norm": ln("layernorm"),
    }


def load_checkpoint(path: str, cfg: DinoV2Config) -> Params:
    """Load a torch-saved DINOv2 checkpoint (hub layout) from disk."""
    import torch  # host-side deserialization only
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    sd_np = {k: v.numpy() for k, v in sd.items()}
    if any(k.startswith("encoder.layer") for k in sd_np):
        return convert_transformers_state_dict(sd_np, cfg)
    return convert_dinov2_hub_state_dict(sd_np, cfg)
