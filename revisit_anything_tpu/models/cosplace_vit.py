"""CosPlace-ViT intermediate-feature extractor.

The reference's CosPlaceViTExtractFeatures (utilities.py:134-288 region)
loads a HuggingFace ``ViTModel`` (ViT-B/16, separate q/k/v projections,
pre-LN encoder blocks) from a CosPlace checkpoint and hooks layer L's
query/key/value Linear output or the block output ("token" facet). Here
the forward is structured to RETURN the facet — no hooks: run blocks
0..L-1, then compute the facet from block L directly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class HfViTConfig:
    """HuggingFace ViTConfig defaults (vit-base-patch16-224)."""
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    image_size: int = 224
    intermediate: int = 3072
    eps: float = 1e-12


VIT_BASE = HfViTConfig()


def init_params(cfg: HfViTConfig, key: jax.Array,
                dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 6 + 12 * cfg.depth))
    d, m = cfg.embed_dim, cfg.intermediate
    n = (cfg.image_size // cfg.patch_size) ** 2

    def w(*shape, scale=0.02):
        return jax.random.normal(next(ks), shape, dtype) * scale

    def lin(i, o):
        return {"w": w(i, o), "b": jnp.zeros((o,), dtype)}

    def ln():
        return {"scale": jnp.ones((d,), dtype),
                "bias": jnp.zeros((d,), dtype)}

    blocks = []
    for _ in range(cfg.depth):
        blocks.append({
            "ln1": ln(), "q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
            "attn_out": lin(d, d), "ln2": ln(),
            "fc1": lin(d, m), "fc2": lin(m, d)})
    return {
        "cls": w(1, 1, d),
        "pos": w(1, n + 1, d),
        "patch_w": w(cfg.patch_size, cfg.patch_size, 3, d),
        "patch_b": jnp.zeros((d,), dtype),
        "blocks": blocks,
        "norm": ln(),
    }


def convert_hf_vit_state_dict(sd: Dict[str, np.ndarray],
                              cfg: HfViTConfig) -> Params:
    """Map a transformers ViTModel state dict onto our tree."""
    g = lambda k: jnp.asarray(np.asarray(sd[k], np.float32))

    def lin(prefix):
        return {"w": g(f"{prefix}.weight").T, "b": g(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": g(f"{prefix}.weight"), "bias": g(f"{prefix}.bias")}

    blocks = []
    for i in range(cfg.depth):
        p = f"encoder.layer.{i}"
        blocks.append({
            "ln1": ln(f"{p}.layernorm_before"),
            "q": lin(f"{p}.attention.attention.query"),
            "k": lin(f"{p}.attention.attention.key"),
            "v": lin(f"{p}.attention.attention.value"),
            "attn_out": lin(f"{p}.attention.output.dense"),
            "ln2": ln(f"{p}.layernorm_after"),
            "fc1": lin(f"{p}.intermediate.dense"),
            "fc2": lin(f"{p}.output.dense")})
    # conv kernel [D, 3, ph, pw] → [ph, pw, 3, D]
    pw = np.asarray(sd["embeddings.patch_embeddings.projection.weight"],
                    np.float32).transpose(2, 3, 1, 0)
    return {
        "cls": g("embeddings.cls_token"),
        "pos": g("embeddings.position_embeddings"),
        "patch_w": jnp.asarray(pw),
        "patch_b": g("embeddings.patch_embeddings.projection.bias"),
        "blocks": blocks,
        "norm": ln("layernorm"),
    }


def load_checkpoint(path: str, cfg: HfViTConfig = VIT_BASE) -> Params:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd)
    return convert_hf_vit_state_dict(
        {k: v.numpy() for k, v in sd.items()}, cfg)


# the f32-compute LN and mixed-precision dense primitives are identical
# to dinov2's (which carry the measured-perf rationale) — one definition
from revisit_anything_tpu.models.dinov2 import _layer_norm  # noqa: E402


def _dense(x, p):
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32).astype(
        x.dtype) + p["b"]


def _attn(x, blk, cfg: HfViTConfig):
    b, n, d = x.shape
    h = cfg.num_heads
    hd = d // h
    q = _dense(x, blk["q"]).reshape(b, n, h, hd)
    k = _dense(x, blk["k"]).reshape(b, n, h, hd)
    v = _dense(x, blk["v"]).reshape(b, n, h, hd)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) / (hd ** 0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return _dense(out.reshape(b, n, d), blk["attn_out"])


def _block(x, blk, cfg: HfViTConfig):
    x = x + _attn(_layer_norm(x, blk["ln1"], cfg.eps), blk, cfg)
    y = _layer_norm(x, blk["ln2"], cfg.eps)
    y = _dense(jax.nn.gelu(_dense(y, blk["fc1"]), approximate=False),
               blk["fc2"])
    return x + y


def embed(params: Params, cfg: HfViTConfig,
          images: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] normalized → [B, 1+N, D] with cls + pos."""
    b, h, w, _ = images.shape
    p = cfg.patch_size
    x = images.reshape(b, h // p, p, w // p, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, p * p * 3)
    kern = params["patch_w"].reshape(-1, cfg.embed_dim)
    x = jnp.dot(x, kern, preferred_element_type=jnp.float32) \
        + params["patch_b"]
    cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x.astype(cls.dtype)], axis=1)
    return x + params["pos"]


@partial(jax.jit, static_argnames=("cfg", "layer", "facet", "use_cls",
                                   "norm_descs"))
def extract_features(params: Params, cfg: HfViTConfig, images: jnp.ndarray,
                     layer: int, facet: str = "value",
                     use_cls: bool = False,
                     norm_descs: bool = True) -> jnp.ndarray:
    """CosPlaceViTExtractFeatures.__call__ semantics: the facet of block
    ``layer`` ("query"/"key"/"value" Linear outputs, or "token" = block
    output), cls token optionally dropped, optional L2 norm over D.

    Returns [B, N(+1), D].
    """
    x = embed(params, cfg, images)
    for blk in params["blocks"][:layer]:
        x = _block(x, blk, cfg)
    blk = params["blocks"][layer]
    if facet == "token":
        out = _block(x, blk, cfg)
    else:
        xin = _layer_norm(x, blk["ln1"], cfg.eps)
        out = _dense(xin, blk[{"query": "q", "key": "k",
                               "value": "v"}[facet]])
    if not use_cls:
        out = out[:, 1:]
    if norm_descs:
        out = out / jnp.maximum(
            jnp.linalg.norm(out.astype(jnp.float32), axis=-1,
                            keepdims=True), 1e-12).astype(out.dtype)
    return out
