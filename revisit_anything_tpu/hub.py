"""Model registry — the torch.hub entry-point equivalent.

The reference exposes ``torch.hub.load(..., "vlad_buff", ...)``
(VLAD-BuFF/hubconf.py) plus registry constructors for SAM
(sam_model_registry) and hub names for DINO models. Here one function
builds any model family by name, optionally from a checkpoint, returning
``(params, cfg, forward_fn)`` where ``forward_fn(params, images_nhwc)`` is
the model's primary inference entry.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax

MODELS = (
    "sam_vit_h", "sam_vit_l", "sam_vit_b",
    "dinov2_vitg14", "dinov2_vitl14", "dinov2_vitb14", "dinov2_vits14",
    "dino_vits8", "dino_vits16", "dino_vitb8", "dino_vitb16",
    "vlad_buff", "dino_salad",
)


def load_model(name: str, checkpoint: Optional[str] = None,
               seed: int = 0, **kwargs
               ) -> Tuple[Any, Any, Callable]:
    """Build a model by name.

    Returns (params, cfg, forward_fn):
    - sam_*: forward_fn = automatic mask generation over one RGB uint8
      image → List[MaskRecord].
    - dinov2_*/dino_*: forward_fn = dense facet extraction (kwargs:
      layer, facet) over normalized NHWC images.
    - vlad_buff / dino_salad: forward_fn = whole-image global descriptor.
    Without ``checkpoint``, parameters are randomly initialized.
    """
    key = jax.random.PRNGKey(seed)

    if name.startswith("sam_"):
        from revisit_anything_tpu.models.sam import (SAM_REGISTRY,
                                                     init_sam_params,
                                                     load_sam_checkpoint)
        from revisit_anything_tpu.models.sam.amg import (AmgConfig,
                                                         generate_masks)
        cfg = SAM_REGISTRY[name[len("sam_"):]]
        params = (load_sam_checkpoint(checkpoint, cfg) if checkpoint
                  else init_sam_params(cfg, key))
        amg = kwargs.get("amg", AmgConfig())

        def forward(params, image_rgb):
            return generate_masks(params, cfg, image_rgb, amg)
        return params, cfg, forward

    if name.startswith("dinov2_"):
        from revisit_anything_tpu.models import dinov2 as dn
        cfg = dn.CONFIGS[name]
        params = (dn.load_checkpoint(checkpoint, cfg) if checkpoint
                  else dn.init_params(cfg, key))
        layer = kwargs.get("layer", 31 if "vitg" in name else cfg.depth - 1)
        facet = kwargs.get("facet", "value")

        def forward(params, images):
            return dn.extract_dense(params, cfg, images, layer, facet)
        return params, cfg, forward

    if name.startswith("dino_vit"):
        from revisit_anything_tpu.models import dinov1 as d1
        from revisit_anything_tpu.models import dinov2 as dn
        cfg = d1.CONFIGS[name]
        params = (d1.load_checkpoint(checkpoint, cfg) if checkpoint
                  else dn.init_params(cfg, key))
        layer = kwargs.get("layer", 11)
        facet = kwargs.get("facet", "key")
        # the reference extractor defaults to an OVERLAPPING stride-4
        # grid (ViTExtractor __init__ stride=4, and cfg dino_strides=4
        # throughout func_vpr) — patch_size here would silently emit a
        # ~4x-coarser non-reference grid
        stride = kwargs.get("stride", 4)

        def forward(params, images):
            return d1.extract_dense(params, cfg, images, layer, facet,
                                    stride)
        return params, cfg, forward

    if name == "vlad_buff":
        from revisit_anything_tpu.models import dinov2 as dn
        from revisit_anything_tpu.training.aggregators import netvlad_init
        from revisit_anything_tpu.training.vladbuff import (
            global_descriptor, load_vladbuff_checkpoint,
            load_vladbuff_params)
        cfg = dn.VIT_B14
        if checkpoint and checkpoint.endswith(".npy"):
            # our own saved param tree (possibly WPCA-baked —
            # save_vladbuff_params / add-pca CLI)
            params = load_vladbuff_params(checkpoint)
        elif checkpoint:
            params = load_vladbuff_checkpoint(checkpoint, cfg)
        else:
            kb, ka = jax.random.split(key)
            params = {"backbone": dn.init_params(cfg, kb),
                      "aggregator": netvlad_init(
                          ka, cfg.embed_dim,
                          kwargs.get("clusters", 64),
                          kwargs.get("antiburst", True),
                          nv_pca=kwargs.get("nv_pca"),
                          nv_pca_mode=kwargs.get("nv_pca_mode", "rot"))}

        def forward(params, images):
            return global_descriptor(params, cfg, images)
        return params, cfg, forward

    if name == "dino_salad":
        from revisit_anything_tpu.models import dinov2 as dn
        from revisit_anything_tpu.training.aggregators import salad_init
        from revisit_anything_tpu.training.vladbuff import (
            load_dinosalad_checkpoint, salad_global_descriptor)
        cfg = dn.VIT_B14
        if checkpoint:
            params = load_dinosalad_checkpoint(checkpoint, cfg)
        else:
            kb, ka = jax.random.split(key)
            params = {"backbone": dn.init_params(cfg, kb),
                      "aggregator": salad_init(ka, cfg.embed_dim)}

        def forward(params, images):
            return salad_global_descriptor(params, cfg, images)
        return params, cfg, forward

    raise KeyError(f"unknown model {name!r}; known: {MODELS}")
