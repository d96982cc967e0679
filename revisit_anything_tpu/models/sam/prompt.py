"""SAM prompt encoder: random-Fourier positional encoding + point embeds.

Mirrors sam/segment_anything/modeling/prompt_encoder.py:16-214. Only the
pieces the automatic mask generator needs are on the hot path (single
positive point + padding point per prompt; no boxes/masks), but box and
dense-PE support is included for API completeness.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from revisit_anything_tpu.models.sam.config import SamArchConfig

Params = Dict[str, Any]


def _fourier_pe(coords01: jnp.ndarray, gaussian: jnp.ndarray) -> jnp.ndarray:
    """coords in [0,1] (...x2) → [..., 2*num_feats] via the random Fourier
    matrix (PositionEmbeddingRandom._pe_encoding)."""
    c = 2.0 * coords01 - 1.0
    # HIGHEST precision: the build's bf16-class f32 default would perturb
    # every prompt coordinate by ~2^-9 before sin/cos (a pixels-level
    # click shift at 1024 res); the K=2 contraction costs nothing
    c = jnp.dot(c.astype(jnp.float32), gaussian.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST)
    c = 2.0 * np.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


@partial(jax.jit, static_argnames=("cfg",))
def dense_positional_embedding(params: Params, cfg: SamArchConfig) -> jnp.ndarray:
    """get_dense_pe: PE of the 64x64 grid cell centers → [1, 64, 64, 256]."""
    from revisit_anything_tpu.utils.packing import maybe_unpack
    params = maybe_unpack(params)
    g = cfg.grid
    ys = (np.arange(g, dtype=np.float32) + 0.5) / g
    xs = (np.arange(g, dtype=np.float32) + 0.5) / g
    grid = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1)  # [g,g,2] xy
    gaussian = params["prompt"].get("pe_gaussian_dense",
                                    params["prompt"]["pe_gaussian"])
    pe = _fourier_pe(jnp.asarray(grid), gaussian)
    return pe[None]


@partial(jax.jit, static_argnames=("cfg", "pad"))
def embed_points(params: Params, cfg: SamArchConfig,
                 coords: jnp.ndarray, labels: jnp.ndarray,
                 pad: bool = True) -> jnp.ndarray:
    """Sparse prompt embeddings for point prompts.

    Args:
      coords: [B, N, 2] (x, y) in the 1024-resized frame.
      labels: [B, N] (1 positive, 0 negative, -1 padding).
      pad: append one padding point (AMG uses box-less prompts →
        pad=True, prompt_encoder.py:155-189).

    Returns [B, N(+1), 256].
    """
    from revisit_anything_tpu.utils.packing import maybe_unpack
    params = maybe_unpack(params)
    pr = params["prompt"]
    coords = coords.astype(jnp.float32) + 0.5   # pixel-center shift
    if pad:
        b = coords.shape[0]
        coords = jnp.concatenate(
            [coords, jnp.zeros((b, 1, 2), coords.dtype)], axis=1)
        labels = jnp.concatenate(
            [labels, -jnp.ones((b, 1), labels.dtype)], axis=1)
    pe = _fourier_pe(coords / cfg.image_size, pr["pe_gaussian"])
    lab = labels[..., None]
    out = jnp.where(lab == -1, pr["not_a_point"], pe)
    out = jnp.where(lab == 0, out + pr["point_embed"][0], out)
    out = jnp.where(lab == 1, out + pr["point_embed"][1], out)
    return out


@partial(jax.jit, static_argnames=("cfg",))
def embed_boxes(params: Params, cfg: SamArchConfig,
                boxes: jnp.ndarray) -> jnp.ndarray:
    """[B, N, 4] XYXY boxes → [B, 2N, 256] corner embeddings."""
    from revisit_anything_tpu.utils.packing import maybe_unpack
    params = maybe_unpack(params)
    pr = params["prompt"]
    b, n, _ = boxes.shape
    corners = (boxes.astype(jnp.float32) + 0.5).reshape(b, n, 2, 2)
    pe = _fourier_pe(corners / cfg.image_size, pr["pe_gaussian"])
    pe = pe.at[:, :, 0].add(pr["point_embed"][2])
    pe = pe.at[:, :, 1].add(pr["point_embed"][3])
    return pe.reshape(b, 2 * n, -1)


@partial(jax.jit, static_argnames=("cfg", "batch"))
def no_mask_dense_embedding(params: Params, cfg: SamArchConfig,
                            batch: int) -> jnp.ndarray:
    """Dense embedding when no mask prompt is given: broadcast
    no_mask_embed over the 64x64 grid → [B, 64, 64, 256]."""
    from revisit_anything_tpu.utils.packing import maybe_unpack
    params = maybe_unpack(params)
    g = cfg.grid
    return jnp.broadcast_to(
        params["prompt"]["no_mask"].reshape(1, 1, 1, -1),
        (batch, g, g, cfg.prompt_dim))


@partial(jax.jit, static_argnames=("cfg",))
def embed_masks(params: Params, cfg: SamArchConfig,
                masks: jnp.ndarray) -> jnp.ndarray:
    """Mask-prompt dense embedding: low-res mask logits [B, 4g, 4g] →
    [B, g, g, prompt_dim] via the downscaling stack (conv k2s2 → channel
    LN → GELU, twice, then a 1x1 conv — PromptEncoder.mask_downscaling,
    prompt_encoder.py:51-60). The stride-2 convs are reshape+matmuls."""
    from revisit_anything_tpu.utils.packing import maybe_unpack
    params = maybe_unpack(params)
    md = params["prompt"]["mask_down"]
    x = masks[..., None].astype(jnp.float32)            # NHWC, C=1

    def conv2s2(x, w, b):
        bsz, h, wd, c = x.shape
        xr = x.reshape(bsz, h // 2, 2, wd // 2, 2, c)
        xr = xr.transpose(0, 1, 3, 2, 4, 5).reshape(
            bsz, h // 2, wd // 2, 4 * c)
        return jnp.dot(xr, w.astype(jnp.float32).reshape(-1, w.shape[-1]),
                       preferred_element_type=jnp.float32) + b

    def chan_ln(x, p, eps=1e-6):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]

    x = jax.nn.gelu(chan_ln(conv2s2(x, md["conv1_w"], md["conv1_b"]),
                            md["ln1"]), approximate=False)
    x = jax.nn.gelu(chan_ln(conv2s2(x, md["conv2_w"], md["conv2_b"]),
                            md["ln2"]), approximate=False)
    x = jnp.dot(x, md["conv3_w"].astype(jnp.float32),
                preferred_element_type=jnp.float32) + md["conv3_b"]
    return x
