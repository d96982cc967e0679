"""Serialized SAM decoder for serving — the ONNX-export equivalent.

The reference ships a decoder-only ONNX wrapper + export script
(sam/segment_anything/utils/onnx.py, scripts/export_onnx_model.py) so the
prompt→mask path can run outside the Python stack. The JAX-native
equivalent is ``jax.export``: ``export_decoder`` serializes a jitted
(prompt embeddings → masks, iou) StableHLO function with the parameters
baked in; ``load_decoder`` rehydrates it anywhere JAX runs.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from revisit_anything_tpu.models.sam.config import SamArchConfig
from revisit_anything_tpu.models.sam.decoder import decode_masks
from revisit_anything_tpu.models.sam.prompt import (
    dense_positional_embedding, embed_points, no_mask_dense_embedding)


def make_decode_fn(params, cfg: SamArchConfig, num_prompts: int,
                   multimask: bool = True):
    """(image_embedding [64,64,256], points_1024 [Np,2]) →
    (lowres masks [Np, M, 256, 256], iou [Np, M]) — the ONNX wrapper's
    surface (image-embedding + prompt in, masks out)."""
    image_pe = dense_positional_embedding(params, cfg)[0]

    def fn(image_embedding, points_1024):
        sparse = embed_points(params, cfg, points_1024[:, None, :],
                              jnp.ones((num_prompts, 1), jnp.int32),
                              pad=True)
        dense = no_mask_dense_embedding(params, cfg, num_prompts)
        return decode_masks(params, cfg, image_embedding, image_pe,
                            sparse, dense, multimask=multimask)

    return fn


def export_decoder(params, cfg: SamArchConfig, path: str,
                   num_prompts: int = 256, multimask: bool = True,
                   platforms=None) -> None:
    """Serialize the decoder (params baked in) as StableHLO bytes.

    ``platforms``: target platform list (e.g. ["cpu", "tpu"]) — without
    it the artifact runs only on the EXPORTING backend's platform. Note:
    exporting on TPU bakes the Pallas mask-head kernel (TPU-only); for a
    portable artifact export from a CPU process (the gate picks the pure
    XLA path at trace time) with platforms=["cpu", ...]."""
    from jax import export as jexport
    fn = make_decode_fn(params, cfg, num_prompts, multimask)
    g = cfg.grid
    args = (
        jax.ShapeDtypeStruct((g, g, cfg.prompt_dim), jnp.float32),
        jax.ShapeDtypeStruct((num_prompts, 2), jnp.float32),
    )
    kwargs = {"platforms": list(platforms)} if platforms else {}
    exported = jexport.export(jax.jit(fn), **kwargs)(*args)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_decoder(path: str):
    """Rehydrate an exported decoder; returns a callable
    (image_embedding, points_1024) → (masks, iou)."""
    from jax import export as jexport
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call
