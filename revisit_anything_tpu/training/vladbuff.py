"""VLAD-BuFF model import + inference — the SegVLAD-FineT backbone path.

The reference's loadDINONV (func_vpr.py:1679-1737) builds
VPRModel(dinov2_vitb14 backbone [4 trainable blocks] + NetVLAD-64) from the
released DnV2_NV Lightning checkpoint, and place_rec_DINO_finetuned.py
writes the backbone's 768-d dense features to ``*_dinoNV_*.h5``
(unnormalized — func_vpr.py process_DINONV :1739-1760). Here:

- ``convert_vladbuff_checkpoint`` maps the Lightning state dict
  (backbone.model.* + aggregator.*) onto our DINOv2 param tree + NetVLAD
  aggregator params (+ optional baked WPCA conv);
- ``extract_dinonv_features`` runs the backbone densely (full resolution,
  layer = full depth, token facet, final norm), matching the VLAD-BuFF
  DINOv2 wrapper (models/backbones/dinov2.py:40-77);
- ``global_descriptor`` = backbone + NetVLAD (+WPCA) for the VLAD-BuFF
  eval.py benchmark path;
- ``fit_wpca`` reproduces add_pca.py's eig-PCA-with-whitening baked as a
  linear layer (add_pca.py:63-123, :389-596).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from revisit_anything_tpu.models import dinov2 as dn
from revisit_anything_tpu.ops.vlad import l2_normalize
from revisit_anything_tpu.training.aggregators import netvlad_forward

Params = Dict[str, Any]


def convert_vladbuff_checkpoint(state_dict: Dict[str, np.ndarray],
                                cfg: dn.DinoV2Config = dn.VIT_B14
                                ) -> Params:
    """Lightning VPRModel state dict → {"backbone", "aggregator", "wpca"?}.

    Keys: backbone.model.<dinov2 hub layout>, aggregator.conv.weight
    [C, D, 1, 1], aggregator.centroids [C, D], optional
    aggregator.ab_params [3], optional WPCA conv (wpca.*/WPCA layers from
    add_pca.py:560-600).
    """
    bb_sd = {k[len("backbone.model."):]: v for k, v in state_dict.items()
             if k.startswith("backbone.model.")}
    backbone = dn.convert_dinov2_hub_state_dict(bb_sd, cfg)

    g = lambda k: np.asarray(state_dict[k], dtype=np.float32)
    agg: Params = {
        "assign_w": jnp.asarray(
            g("aggregator.conv.weight")[:, :, 0, 0].T),   # [D, C]
        "centroids": jnp.asarray(g("aggregator.centroids")),
    }
    if "aggregator.ab_params" in state_dict:
        agg["ab_params"] = jnp.asarray(g("aggregator.ab_params"))
    # nv_pca pre-projections (aggregation.py:194-207): mean/rot (default),
    # bottleneck Linear (--nv_pca_alt), 2-layer MLP (--nv_pca_alt_mlp).
    # NOTE: the torch module registers pca_mean/pca_rot even in the alt
    # modes; the forward only uses them in "rot" mode, so they are mapped
    # only when no alt module is present.
    if "aggregator.bottleneck.weight" in state_dict:
        agg["bottleneck"] = {
            "w": jnp.asarray(g("aggregator.bottleneck.weight").T),
            "b": jnp.asarray(g("aggregator.bottleneck.bias"))}
    elif "aggregator.mlp.0.weight" in state_dict:
        agg["nv_mlp"] = {
            "fc1": {"w": jnp.asarray(g("aggregator.mlp.0.weight").T),
                    "b": jnp.asarray(g("aggregator.mlp.0.bias"))},
            "fc2": {"w": jnp.asarray(g("aggregator.mlp.2.weight").T),
                    "b": jnp.asarray(g("aggregator.mlp.2.bias"))}}
    elif "aggregator.pca_rot" in state_dict:
        agg["pca_mean"] = jnp.asarray(g("aggregator.pca_mean"))
        agg["pca_rot"] = jnp.asarray(g("aggregator.pca_rot"))

    out: Params = {"backbone": backbone, "aggregator": agg}
    wpca_keys = [k for k in state_dict if "wpca" in k.lower()
                 and k.endswith(".weight")]
    if wpca_keys:
        # add_pca.py loops over sorted --num_pcs and add_module()s each
        # WPCA_{n} cumulatively before re-saving, so a wpca{n}_last.ckpt
        # can contain SEVERAL WPCA_k modules: take the LARGEST output dim
        # (= the n the checkpoint is named for), not insertion order
        wk = max(wpca_keys, key=lambda k: state_dict[k].shape[0])
        w = g(wk)
        w = w[:, :, 0, 0] if w.ndim == 4 else w
        bk = wk[:-len(".weight")] + ".bias"
        out["wpca"] = {"w": jnp.asarray(w),
                       "b": jnp.asarray(g(bk)) if bk in state_dict
                       else jnp.zeros((w.shape[0],), jnp.float32)}
    return out


def load_vladbuff_checkpoint(path: str,
                             cfg: dn.DinoV2Config = dn.VIT_B14) -> Params:
    import torch  # host-side deserialization only
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return convert_vladbuff_checkpoint(
        {k: v.numpy() for k, v in sd.items()}, cfg)


def extract_dinonv_features(params: Params, cfg: dn.DinoV2Config,
                            images: jnp.ndarray) -> jnp.ndarray:
    """Dense 768-d backbone features [B, D, gh, gw] (token facet, final
    norm) — what the reference stores in *_dinoNV_*.h5 (unnormalized)."""
    tokens = dn.forward_tokens(params["backbone"], cfg, images,
                               final_norm=True)
    patches = tokens[:, 1 + cfg.num_register_tokens:]
    b, n, d = patches.shape
    gh = images.shape[1] // cfg.patch_size
    gw = images.shape[2] // cfg.patch_size
    return patches.reshape(b, gh, gw, d).transpose(0, 3, 1, 2)


def global_descriptor(params: Params, cfg: dn.DinoV2Config,
                      images: jnp.ndarray) -> jnp.ndarray:
    """Whole-image VLAD-BuFF descriptor: backbone → NetVLAD (→ WPCA,
    L2-normalized) — the eval.py inference path."""
    feats = extract_dinonv_features(params, cfg, images)
    desc = netvlad_forward(params["aggregator"], feats)
    if "wpca" in params:
        desc = jnp.dot(desc, params["wpca"]["w"].T,
                       preferred_element_type=jnp.float32) \
            + params["wpca"]["b"]
        desc = l2_normalize(desc, axis=1)
    return desc


def convert_dinosalad_checkpoint(state_dict: Dict[str, np.ndarray],
                                 cfg: dn.DinoV2Config = dn.VIT_B14
                                 ) -> Params:
    """DINO-SALAD checkpoint (loadDINOSALAD, func_vpr.py:1770-1795) →
    {"backbone", "aggregator"} with our salad param layout. Aggregator
    names: token_features.{0,2} (Linear), cluster_features.{0,3} /
    score.{0,3} (1x1 Conv), dust_bin."""
    bb_sd = {k[len("backbone.model."):]: v for k, v in state_dict.items()
             if k.startswith("backbone.model.")}
    backbone = dn.convert_dinov2_hub_state_dict(bb_sd, cfg)

    g = lambda k: np.asarray(state_dict[k], dtype=np.float32)

    def linear(prefix):
        return {"w": jnp.asarray(g(prefix + ".weight").T),
                "b": jnp.asarray(g(prefix + ".bias"))}

    def conv1x1(prefix):
        w = g(prefix + ".weight")[:, :, 0, 0]        # [out, in]
        return {"w": jnp.asarray(w.T), "b": jnp.asarray(g(prefix + ".bias"))}

    agg = {
        "score_w1": conv1x1("aggregator.score.0"),
        "score_w2": conv1x1("aggregator.score.3"),
        "feat_w1": conv1x1("aggregator.cluster_features.0"),
        "feat_w2": conv1x1("aggregator.cluster_features.3"),
        "tok_w1": linear("aggregator.token_features.0"),
        "tok_w2": linear("aggregator.token_features.2"),
        "dustbin": jnp.asarray(g("aggregator.dust_bin")),
    }
    return {"backbone": backbone, "aggregator": agg}


def load_dinosalad_checkpoint(path: str,
                              cfg: dn.DinoV2Config = dn.VIT_B14) -> Params:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return convert_dinosalad_checkpoint(
        {k: v.numpy() for k, v in sd.items()}, cfg)


def extract_dinosalad_features(params: Params, cfg: dn.DinoV2Config,
                               images: jnp.ndarray) -> jnp.ndarray:
    """Dense backbone features for the dinoSALAD h5 path, L2-normalized
    over channels (process_single_DINO_SALAD, func_vpr.py:1843-1852)."""
    feats = extract_dinonv_features(params, cfg, images)
    return l2_normalize(feats, axis=1)


def salad_global_descriptor(params: Params, cfg: dn.DinoV2Config,
                            images: jnp.ndarray) -> jnp.ndarray:
    """Whole-image DINO-SALAD descriptor: backbone (patch features + cls
    token) → SALAD aggregation."""
    from revisit_anything_tpu.training.aggregators import salad_forward
    tokens = dn.forward_tokens(params["backbone"], cfg, images,
                               final_norm=True)
    cls_tok = tokens[:, 0]
    patches = tokens[:, 1 + cfg.num_register_tokens:]
    b, n, d = patches.shape
    gh = images.shape[1] // cfg.patch_size
    gw = images.shape[2] // cfg.patch_size
    feats = patches.reshape(b, gh, gw, d).transpose(0, 3, 1, 2)
    return salad_forward(params["aggregator"], feats, token=cls_tok)


def fit_wpca(descriptors: jnp.ndarray, num_components: int,
             eps: float = 1e-9) -> Dict[str, jnp.ndarray]:
    """Whitened PCA baked as a linear layer y = W x + b
    (add_pca.py pca() :63-123): W = diag(1/sqrt(lam + 1e-9)) U^T,
    b = -W mu (the whitening eps is ADDITIVE, add_pca.py:566-570).

    Like the reference, the eigendecomposition runs on whichever of the
    covariance [D, D] / gram [N, N] is smaller (the MATLAB-style dual
    path, add_pca.py:92-120): at the production 49152-d NetVLAD
    descriptors with 10k samples, the primal covariance would be a
    ~9.7 GB buffer and an O(D³) eigh — the dual recovers the directions
    as U = Xᵀ U_dual diag(1/sqrt(max(lam, 1e-9))) / sqrt(N−1)."""
    x = descriptors.astype(jnp.float32)          # [N, D]
    n, d = x.shape
    mu = jnp.mean(x, axis=0)
    xc = x - mu
    hp = jax.lax.Precision.HIGHEST
    if d <= n:
        cov = jnp.dot(xc.T, xc, preferred_element_type=jnp.float32,
                      precision=hp) / (n - 1)
        lam, u = jnp.linalg.eigh(cov)
        order = jnp.argsort(-lam)[:num_components]
        lam, u = lam[order], u[:, order]         # u [D, K]
    else:
        gram = jnp.dot(xc, xc.T, preferred_element_type=jnp.float32,
                       precision=hp) / (n - 1)
        lam, ud = jnp.linalg.eigh(gram)
        order = jnp.argsort(-lam)[:num_components]
        lam, ud = lam[order], ud[:, order]       # ud [N, K]
        u = jnp.dot(xc.T,
                    ud / jnp.sqrt(jnp.maximum(lam, 1e-9))[None, :],
                    preferred_element_type=jnp.float32,
                    precision=hp) / jnp.sqrt(n - 1.0)
    w = (u / jnp.sqrt(lam + eps)[None, :]).T     # [K, D]
    b = -jnp.dot(w, mu, precision=hp)
    return {"w": w, "b": b}


def bake_wpca(params: Params, descriptors: jnp.ndarray,
              num_pcs: int) -> Params:
    """Return params with a whitened-PCA output layer fitted on
    ``descriptors`` baked in as ``params["wpca"]`` — the add_pca.py
    WPCA_{n} Conv2d flow (add_pca.py:560-600)."""
    out = dict(params)
    out["wpca"] = fit_wpca(descriptors, num_pcs)
    return out


def save_vladbuff_params(path: str, params: Params) -> str:
    """Persist a (possibly WPCA-baked) VLAD-BuFF param tree — the
    ``wpca{n}_last.ckpt`` re-save step of add_pca.py:589-596."""
    host = jax.device_get(params)
    np.save(path, np.asarray(host, dtype=object), allow_pickle=True)
    return path if path.endswith(".npy") else path + ".npy"


def load_vladbuff_params(path: str) -> Params:
    host = np.load(path if path.endswith(".npy") else path + ".npy",
                   allow_pickle=True).item()
    return jax.tree.map(jnp.asarray, host)
