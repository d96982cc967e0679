"""VPR training loop — the optax re-design of VLAD-BuFF's Lightning module.

Covers VPRModel (VLAD-BuFF/vpr_model.py:16-377) + train.py:297-418:
DINOv2 backbone with a frozen prefix and N trainable final blocks
(models/backbones/dinov2.py:40-77), NetVLAD(+AntiBurst) aggregation,
MultiSimilarity loss+miner, AdamW with linear LR warmdown. TPU-first:

- the frozen prefix runs under stop_gradient (no backward FLOPs/memory),
  and its params are masked out of the optimizer;
- one jitted train_step; batch = flattened places (each place contributes
  ``imgs_per_place`` views sharing a label, GSVCitiesDataloader semantics);
- multi-chip: data parallel over the mesh "data" axis + tensor parallel
  over "model" (aggregator clusters, backbone FFN hidden) via NamedSharding
  annotations — XLA inserts psum/all_gather.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from revisit_anything_tpu.models import dinov2 as dn
from revisit_anything_tpu.training.aggregators import (netvlad_forward,
                                                       netvlad_init)
from revisit_anything_tpu.training.losses import multi_similarity_loss

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VPRTrainConfig:
    backbone: dn.DinoV2Config = dn.VIT_B14
    num_trainable_blocks: int = 4          # train.py --num_trainable_blocks
    clusters: int = 64
    antiburst: bool = True
    lr: float = 6e-5                       # train.py --lr
    weight_decay: float = 9.5e-9           # train.py --weight_decay
    warmup_steps: int = 600                # unused by the reference
    #                                        schedules (kept for custom
    #                                        schedules; see make_schedule)
    total_steps: int = 20000
    lin_end_factor: float = 0.2            # train.py lr_sched_args
    lin_total_iters: int = 4000            # (:366-370)
    imgs_per_place: int = 4
    # vpr_model.py configure_optimizers (:187-227): sgd | adam | adamw
    # ("adam" is AdamW in the reference too, vpr_model.py:200-203) and
    # linear | multistep | cosine schedules
    optimizer: str = "adamw"               # train.py --optimizer
    momentum: float = 0.9                  # train.py --momentum (sgd)
    lr_sched: str = "linear"               # train.py --lr_sched
    milestones: tuple = (5, 10, 15)        # multistep (unit: epochs->steps
    steps_per_epoch: int = 0               # 0: milestones are raw steps
    gamma: float = 0.3                     # multistep decay
    cosine_t_max: int = 0                  # cosine; 0 -> total_steps


@dataclasses.dataclass
class VPRTrainState:
    params: Params                         # {"backbone":…, "aggregator":…}
    opt_state: Any
    step: jnp.ndarray


def backbone_forward(backbone_params: Params, cfg: dn.DinoV2Config,
                     images: jnp.ndarray, num_trainable: int) -> jnp.ndarray:
    """[B, H, W, 3] → [B, D, gh, gw] patch features; gradients flow only
    through the last ``num_trainable`` blocks + final norm (VLAD-BuFF
    backbone semantics, models/backbones/dinov2.py:40-77)."""
    if num_trainable > cfg.depth:
        raise ValueError(f"num_trainable_blocks {num_trainable} exceeds "
                         f"backbone depth {cfg.depth}")
    x = dn.embed_patches(backbone_params, cfg, images)
    split = cfg.depth - num_trainable
    for blk in backbone_params["blocks"][:split]:
        x = dn._block(x, blk, cfg)
    x = jax.lax.stop_gradient(x)
    for blk in backbone_params["blocks"][split:]:
        x = dn._block(x, blk, cfg)
    x = dn._layer_norm(x, backbone_params["norm"], cfg.eps)
    patches = x[:, 1 + cfg.num_register_tokens:]
    b, n, d = patches.shape
    gh = images.shape[1] // cfg.patch_size
    gw = images.shape[2] // cfg.patch_size
    return patches.reshape(b, gh, gw, d).transpose(0, 3, 1, 2)


def model_forward(params: Params, cfg: VPRTrainConfig,
                  images: jnp.ndarray) -> jnp.ndarray:
    feats = backbone_forward(params["backbone"], cfg.backbone, images,
                             cfg.num_trainable_blocks)
    return netvlad_forward(params["aggregator"], feats)


def _trainable_mask(params: Params, cfg: VPRTrainConfig) -> Params:
    """Pytree of bools: aggregator + last N backbone blocks + final norm."""
    if cfg.num_trainable_blocks > cfg.backbone.depth:
        raise ValueError(f"num_trainable_blocks {cfg.num_trainable_blocks}"
                         f" exceeds backbone depth {cfg.backbone.depth}")
    split = cfg.backbone.depth - cfg.num_trainable_blocks

    def mask_backbone(path_is_trainable):
        bb = params["backbone"]
        out = jax.tree.map(lambda _: False, bb)
        out["blocks"] = ([jax.tree.map(lambda _: False, b)
                          for b in bb["blocks"][:split]]
                         + [jax.tree.map(lambda _: True, b)
                            for b in bb["blocks"][split:]])
        out["norm"] = jax.tree.map(lambda _: True, bb["norm"])
        return out

    agg_mask = jax.tree.map(lambda _: True, params["aggregator"])
    # CRN's accumulation conv is FIXED in the reference
    # (requires_grad=False, aggregation.py:506-510) — keep the optimizer
    # off it
    if "crn" in agg_mask:
        for frozen in ("acc_w", "acc_b"):
            agg_mask["crn"][frozen] = False
    return {"backbone": mask_backbone(True), "aggregator": agg_mask}


def make_schedule(cfg: VPRTrainConfig):
    """linear (LinearLR), multistep (MultiStepLR) or cosine
    (CosineAnnealingLR) — vpr_model.py:209-226."""
    sched = cfg.lr_sched.lower()
    if sched == "linear":
        # torch LinearLR exactly (vpr_model.py:219-225, defaults
        # train.py:365-370): factor 1 → lin_end_factor over
        # lin_total_iters steps, CONSTANT afterwards. No warmup — the
        # reference's optimizer_step wrapper only steps the scheduler
        # per batch (vpr_model.py:229-233); cfg.warmup_steps is ignored
        # here (an earlier one-cycle implementation warmed up from
        # lr/25 and decayed to ~0, a silent divergence from VLAD-BuFF).
        return optax.linear_schedule(
            init_value=cfg.lr,
            end_value=cfg.lr * cfg.lin_end_factor,
            transition_steps=cfg.lin_total_iters)
    if sched == "multistep":
        unit = cfg.steps_per_epoch if cfg.steps_per_epoch > 0 else 1
        return optax.piecewise_constant_schedule(
            cfg.lr, {int(m * unit): cfg.gamma for m in cfg.milestones})
    if sched == "cosine":
        t_max = cfg.cosine_t_max or cfg.total_steps
        return optax.cosine_decay_schedule(cfg.lr, t_max)
    raise ValueError(f"unknown lr_sched {cfg.lr_sched!r}")


def make_optimizer(cfg: VPRTrainConfig, params: Params):
    """sgd/adam/adamw + schedule, frozen-prefix masked out
    (vpr_model.py configure_optimizers; "adam" is AdamW in the reference
    too, vpr_model.py:200-203)."""
    schedule = make_schedule(cfg)
    opt = cfg.optimizer.lower()
    if opt == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(schedule, momentum=cfg.momentum))
    elif opt in ("adamw", "adam"):
        tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    return optax.masked(tx, _trainable_mask(params, cfg))


def create_train_state(cfg: VPRTrainConfig, key: jax.Array,
                       init_descriptors=None) -> VPRTrainState:
    """Fresh train state.

    ``init_descriptors`` [N, D]: sample backbone descriptors for the
    reference's NetVLAD cluster initialization (initialize_netvlad_layer,
    aggregation.py:392-468 — euclidean faiss.Kmeans niter=100 centroids,
    assign weights alpha·normalized centroids with alpha from the
    top1−top2 assignment gap). The reference default is
    initialize_clusters=True (train.py:143-147); without descriptors the
    aggregator starts from random init instead.
    """
    kb, ka = jax.random.split(key)
    backbone = dn.init_params(cfg.backbone, kb)
    if init_descriptors is not None:
        from revisit_anything_tpu.ops.kmeans import kmeans_fit
        from revisit_anything_tpu.training.aggregators import (
            netvlad_init_from_cluster_centers)
        x = jnp.asarray(np.asarray(init_descriptors, np.float32))
        centers, _ = kmeans_fit(x, cfg.clusters, ka, num_iters=100,
                                mode="euclidean")
        aggregator = netvlad_init_from_cluster_centers(
            centers, descriptors=x, antiburst=cfg.antiburst)
    else:
        aggregator = netvlad_init(ka, cfg.backbone.embed_dim, cfg.clusters,
                                  cfg.antiburst)
    params = {"backbone": backbone, "aggregator": aggregator}
    opt_state = make_optimizer(cfg, params).init(params)
    return VPRTrainState(params, opt_state, jnp.zeros((), jnp.int32))


def loss_fn(params: Params, cfg: VPRTrainConfig, images: jnp.ndarray,
            labels: jnp.ndarray) -> jnp.ndarray:
    descriptors = model_forward(params, cfg, images)
    return multi_similarity_loss(descriptors, labels)


def _step_impl(params, opt_state, step, cfg, images, labels):
    """Shared step body for the unsharded and sharded jits — ONE place
    for the step math so the two cannot diverge."""
    loss, grads = jax.value_and_grad(loss_fn)(params, cfg, images, labels)
    tx = make_optimizer(cfg, params)
    updates, new_opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_opt_state, step + 1, loss


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
def train_step(params: Params, opt_state, step: jnp.ndarray,
               cfg: VPRTrainConfig, images: jnp.ndarray,
               labels: jnp.ndarray):
    """One optimization step. images [B, H, W, 3] float32 (normalized),
    labels [B] place ids (each place appears imgs_per_place times)."""
    return _step_impl(params, opt_state, step, cfg, images, labels)


# ---------------------------------------------------------------------------
# Multi-chip sharding
# ---------------------------------------------------------------------------


def _tp_spec_for(path, leaf):
    """Tensor-parallel spec by path suffix: works for params AND for
    optimizer moments (adamw's mu/nu mirror the param tree, so their
    paths END with the same param names)."""
    names = [getattr(p, "key", getattr(p, "idx", None))
             for p in path]
    names = [str(n) for n in names if n is not None]
    joined = "/".join(names)
    if not hasattr(leaf, "ndim") or leaf.ndim < 2:
        return P()
    if joined.endswith(("fc1/w", "w12/w", "lin1/w")):
        return P(None, "model")
    if joined.endswith(("fc2/w", "w3/w", "lin2/w")):
        return P("model", None)
    if joined.endswith("assign_w"):
        return P(None, "model")
    if joined.endswith("centroids"):
        return P("model", None)
    return P()


def param_sharding_rules(mesh: Mesh, params: Params) -> Params:
    """NamedShardings: tensor-parallel over 'model' for FFN hidden dims and
    aggregator clusters; everything else replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _tp_spec_for(path, leaf)),
        params)


def make_sharded_train_step(mesh: Mesh, cfg: VPRTrainConfig,
                            params: Params, opt_state):
    """jit train_step with dp ('data') batch sharding + tp ('model') param
    sharding. Returns (step_fn, sharded_params, sharded_opt_state)."""
    p_shard = param_sharding_rules(mesh, params)
    # optimizer moments shard LIKE their params (replicating them would
    # store 2x full-size adamw state per chip and reshard every step)
    o_shard = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _tp_spec_for(path, leaf)),
        opt_state)
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    params_s = jax.device_put(params, p_shard)
    opt_state_s = jax.device_put(opt_state, o_shard)

    @partial(jax.jit,
             in_shardings=(p_shard, o_shard, repl, data, data),
             out_shardings=(p_shard, o_shard, repl, repl),
             donate_argnums=(0, 1))
    def step_fn(params_, opt_state_, step_, images_, labels_):
        return _step_impl(params_, opt_state_, step_, cfg, images_,
                          labels_)

    return step_fn, params_s, opt_state_s
