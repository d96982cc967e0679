"""Interactive SAM predictor — the SamPredictor API equivalent.

Mirrors sam/segment_anything/predictor.py:17-269: ``set_image`` runs the
encoder once and caches the embedding; ``predict`` decodes arbitrary
point/box prompts against it, returning masks at the original resolution
plus IoU predictions and low-res logits. Prompts are given in original
image coordinates (ResizeLongestSide.apply_coords/apply_boxes handled
internally, utils/transforms.py:40-58).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from revisit_anything_tpu.models.sam.amg import _preprocess_any
from revisit_anything_tpu.models.sam.config import SamArchConfig
from revisit_anything_tpu.models.sam.decoder import decode_masks
from revisit_anything_tpu.models.sam.encoder import encode_image
from revisit_anything_tpu.models.sam.prompt import (
    dense_positional_embedding, embed_boxes, embed_masks, embed_points,
    no_mask_dense_embedding)
from revisit_anything_tpu.ops.resize import bilinear_weight_matrix


class SamPredictor:
    """Encode once, prompt many times."""

    def __init__(self, params, cfg: SamArchConfig):
        self.params = params
        self.cfg = cfg
        self._embedding = None
        self._input_hw = None
        self._orig_hw = None

    def set_image(self, image_rgb: np.ndarray) -> None:
        """Encode an RGB uint8 image (predictor.py set_image :34-83)."""
        self._orig_hw = image_rgb.shape[:2]
        batched, self._input_hw = _preprocess_any(image_rgb, self.cfg)
        self._embedding = encode_image(self.params, self.cfg, batched)[0]
        # fused lowres→original resize matrices depend only on image
        # geometry: build once per set_image, not per predict
        cfg = self.cfg
        up = bilinear_weight_matrix(cfg.image_size, cfg.lowres_size)
        self._wh = jnp.asarray(bilinear_weight_matrix(
            self._orig_hw[0], self._input_hw[0]) @ up[:self._input_hw[0]])
        self._ww = jnp.asarray(bilinear_weight_matrix(
            self._orig_hw[1], self._input_hw[1]) @ up[:self._input_hw[1]])

    @property
    def is_image_set(self) -> bool:
        return self._embedding is not None

    def get_image_embedding(self) -> jnp.ndarray:
        assert self.is_image_set, "call set_image first"
        return self._embedding

    def _scale(self) -> np.ndarray:
        h, w = self._orig_hw
        return np.array([self._input_hw[1] / w, self._input_hw[0] / h],
                        np.float32)

    def predict(self,
                point_coords: Optional[np.ndarray] = None,
                point_labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None,
                mask_input: Optional[np.ndarray] = None,
                multimask_output: bool = True,
                return_logits: bool = False
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Predict masks for ONE prompt set (predictor.py predict :85-166).

        Args:
          point_coords: [N, 2] (x, y) in original image coords.
          point_labels: [N] (1 fg / 0 bg).
          box: [4] XYXY in original image coords.
          mask_input: [1, 4g, 4g] low-res mask logits from a previous
            prediction round (typically low_res_logits[best]).

        Returns (masks [M, H, W] bool (or float logits), iou [M],
        low_res_logits [M, 256, 256]).
        """
        assert self.is_image_set, "call set_image first"
        cfg = self.cfg
        scale = self._scale()

        sparse_parts = []
        if point_coords is not None:
            assert point_labels is not None, (
                "point_labels must be supplied if point_coords is "
                "supplied.")                      # predictor.py:128-130
            pts = (np.asarray(point_coords, np.float32) * scale)[None]
            labels = np.asarray(point_labels, np.int32)[None]
            sparse_parts.append(embed_points(
                self.params, cfg, jnp.asarray(pts), jnp.asarray(labels),
                pad=box is None)[0])
        if box is not None:
            b = np.asarray(box, np.float32).reshape(2, 2) * scale
            sparse_parts.append(embed_boxes(
                self.params, cfg, jnp.asarray(b.reshape(1, 1, 4)))[0])
        if not sparse_parts:
            raise ValueError("provide point_coords and/or box")
        sparse = jnp.concatenate(sparse_parts, axis=0)[None]

        if mask_input is not None:
            dense = embed_masks(self.params, cfg,
                                jnp.asarray(mask_input, jnp.float32))
        else:
            dense = no_mask_dense_embedding(self.params, cfg, 1)
        pe = dense_positional_embedding(self.params, cfg)[0]
        lowres, iou = decode_masks(self.params, cfg, self._embedding, pe,
                                   sparse, dense,
                                   multimask=multimask_output)
        lowres = lowres[0]                              # [M, 256, 256]

        # postprocess_masks to original resolution (fused linear maps,
        # precomputed in set_image). HIGHEST precision: near-threshold
        # pixels flip vs torch at the build's bf16-class f32 default.
        import jax
        m = jnp.einsum("oh,nhw->now", self._wh,
                       lowres.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
        m = jnp.einsum("pw,now->nop", self._ww, m,
                       precision=jax.lax.Precision.HIGHEST)
        masks = np.asarray(m)
        if not return_logits:
            masks = masks > cfg.mask_threshold
        return masks, np.asarray(iou[0]), np.asarray(lowres)
