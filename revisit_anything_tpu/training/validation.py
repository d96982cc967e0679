"""In-training validation: held-out reference/query recalls.

The reference evaluates validation sets every epoch inside the Lightning
module (VLAD-BuFF/vpr_model.py:308-377: descriptors in [R1..Rn, Q1..Qm]
order, faiss recalls via utils/validation.py get_validation_recalls) and
retains checkpoints by the ``pitts30k_val/R1`` monitor
(train.py:383-392). Here validation is an explicit function called every
``val_every`` steps from the train loop; best-metric retention lives in
training/checkpoint.py (save_best_state).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class ValidationSet:
    """One held-out set: reference images, query images, per-query
    positive reference indices (the vpr_model.py val_dataset contract)."""
    name: str
    ref_paths: List[str]
    query_paths: List[str]
    gt: List[Sequence[int]]
    image_hw: Tuple[int, int] = (224, 224)

    @classmethod
    def from_directory(cls, root: str,
                       image_hw: Tuple[int, int] = (224, 224),
                       name: Optional[str] = None) -> "ValidationSet":
        """Layout: <root>/ref/*.{jpg,png}, <root>/query/*.{jpg,png},
        <root>/gt.npy (object array: positive ref indices per query)."""
        def listdir(sub):
            d = os.path.join(root, sub)
            return [os.path.join(d, f) for f in sorted(os.listdir(d))
                    if f.lower().endswith((".jpg", ".jpeg", ".png"))]
        gt = np.load(os.path.join(root, "gt.npy"), allow_pickle=True)
        return cls(name=name or os.path.basename(os.path.abspath(root)),
                   ref_paths=listdir("ref"), query_paths=listdir("query"),
                   gt=[list(map(int, g)) for g in gt], image_hw=image_hw)


# module-level jitted forward (one wrapper — a fresh jax.jit per call
# would retrace every validation round); cfg is static, unjitted the ViT
# forward dispatches every op individually (~30 ms tunnel RTT each)
_JIT_FORWARD = None


def _jit_forward():
    global _JIT_FORWARD
    if _JIT_FORWARD is None:
        from revisit_anything_tpu.training.train import model_forward
        _JIT_FORWARD = jax.jit(model_forward, static_argnames=("cfg",))
    return _JIT_FORWARD


def _descriptors(params, cfg, paths: Sequence[str],
                 image_hw: Tuple[int, int], batch_size: int) -> np.ndarray:
    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.pipeline.extract import (_resize_cv2_bilinear,
                                                       load_image_rgb)
    fwd = _jit_forward()
    out = []
    for s in range(0, len(paths), batch_size):
        imgs = np.stack([
            _resize_cv2_bilinear(load_image_rgb(p),
                                 (image_hw[1], image_hw[0]))
            for p in paths[s:s + batch_size]])
        x = dn.preprocess(imgs)
        out.append(np.asarray(fwd(params, cfg, jnp.asarray(x))))
    return np.concatenate(out) if out else np.zeros((0, 1), np.float32)


def run_validation(params, cfg, val_set: ValidationSet,
                   k_values: Sequence[int] = (1, 5, 10),
                   batch_size: int = 16,
                   print_results: bool = True) -> Dict[int, float]:
    """Full-model descriptors for refs then queries, kNN recalls —
    vpr_model.py:320-371 semantics with k_values (1, 5, 10)."""
    from revisit_anything_tpu.retrieval.analysis import get_validation_recalls
    refs = _descriptors(params, cfg, val_set.ref_paths, val_set.image_hw,
                        batch_size)
    queries = _descriptors(params, cfg, val_set.query_paths,
                           val_set.image_hw, batch_size)
    return get_validation_recalls(refs, queries, val_set.gt,
                                  k_values=k_values,
                                  dataset_name=val_set.name,
                                  print_results=print_results)
