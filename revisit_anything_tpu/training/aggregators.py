"""Trainable aggregators: NetVLAD (+AntiBurst), GeM, SALAD.

TPU re-designs of the VLAD-BuFF aggregators
(VLAD-BuFF/models/aggregators/aggregation.py:166-468 and salad.py:43-168):
the 1x1 soft-assign conv is a matmul; the per-cluster residual loop is one
einsum over [B, C, P, D]; the AntiBurst weighting is the [B, P, P] gram
matrix (``selfDis = -2 + 2 xᵀx``) pushed through a learnable
sigmoid-sum-power (getWeights, aggregation.py:148-162).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from revisit_anything_tpu.ops.vlad import l2_normalize

Params = Dict[str, Any]


def netvlad_init(key: jax.Array, dim: int, clusters: int = 64,
                 antiburst: bool = True,
                 # every reference entry point defaults (8, 7, 1) —
                 # train.py:188-190, eval.py, hubconf.py, func_vpr.py:1690
                 ab_w: float = 8.0, ab_b: float = 7.0, ab_p: float = 1.0,
                 nv_pca: Optional[int] = None, nv_pca_mode: str = "rot",
                 dtype=jnp.float32) -> Params:
    """Parameters for NetVLAD(+AntiBurst). ``assign_w`` is the 1x1 conv
    (bias-free, aggregation.py:334); centroids are trainable.

    ``nv_pca``: learnable pre-projection of the input descriptors to
    nv_pca dims before assignment (aggregation.py:194-207) — the
    192-PrePool model configs. Modes: "rot" (mean + rotation, the
    default), "fc" (bottleneck Linear, --nv_pca_alt), "mlp"
    (Linear-ReLU-Linear, --nv_pca_alt_mlp)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    d_eff = nv_pca if nv_pca is not None else dim
    p: Params = {
        "assign_w": jax.random.normal(k1, (d_eff, clusters), dtype) * 0.02,
        "centroids": jax.random.normal(k2, (clusters, d_eff), dtype) * 0.02,
    }
    if nv_pca is not None:
        if nv_pca_mode == "rot":
            p["pca_mean"] = jax.random.uniform(k3, (dim,), dtype)
            p["pca_rot"] = jax.random.uniform(k4, (nv_pca, dim), dtype)
        elif nv_pca_mode == "fc":
            p["bottleneck"] = {
                "w": jax.random.normal(k3, (dim, nv_pca), dtype) * 0.02,
                "b": jnp.zeros((nv_pca,), dtype)}
        elif nv_pca_mode == "mlp":
            p["nv_mlp"] = {
                "fc1": {"w": jax.random.normal(k3, (dim, nv_pca),
                                               dtype) * 0.02,
                        "b": jnp.zeros((nv_pca,), dtype)},
                "fc2": {"w": jax.random.normal(k4, (nv_pca, nv_pca),
                                               dtype) * 0.02,
                        "b": jnp.zeros((nv_pca,), dtype)}}
        else:
            raise ValueError(f"nv_pca_mode {nv_pca_mode!r}")
    if antiburst:
        p["ab_params"] = jnp.asarray([ab_w, ab_b, ab_p], dtype)
    return p


def _nv_pca_project(params: Params, x: jnp.ndarray,
                    normalize_input: bool) -> jnp.ndarray:
    """Learnable pre-projection of [B, D, P] descriptors
    (NetVLAD.forward, aggregation.py:275-288): project, then re-normalize
    over the new descriptor dim."""
    if "pca_rot" in params:
        x = x - params["pca_mean"][None, :, None]
        x = jnp.einsum("bdp,kd->bkp", x, params["pca_rot"],
                       preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    elif "bottleneck" in params:
        x = jnp.einsum("bdp,dk->bkp", x, params["bottleneck"]["w"],
                       preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) \
            + params["bottleneck"]["b"][None, :, None]
    elif "nv_mlp" in params:
        m = params["nv_mlp"]
        x = jnp.einsum("bdp,dk->bkp", x, m["fc1"]["w"],
                       preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) \
            + m["fc1"]["b"][None, :, None]
        x = jax.nn.relu(x)
        x = jnp.einsum("bdp,dk->bkp", x, m["fc2"]["w"],
                       preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) \
            + m["fc2"]["b"][None, :, None]
    else:
        return x
    if normalize_input:
        x = l2_normalize(x, axis=1)
    return x


def netvlad_init_from_cluster_centers(centers: jnp.ndarray,
                                      descriptors=None,
                                      alpha: float = None,
                                      antiburst: bool = True) -> Params:
    """NetVLAD init from kmeans centers (init_params,
    aggregation.py:239-257): assign weights = alpha · normalized centers
    (no bias), with alpha derived from the sample descriptors when given
    — alpha = −log(0.01) / mean(top1−top2 assignment dot gap); a fixed
    alpha (default 30, the open-NetVLAD convention) otherwise."""
    cn = l2_normalize(centers, axis=1)
    if alpha is None:
        if descriptors is not None:
            dots = jnp.dot(cn, jnp.asarray(descriptors, jnp.float32).T,
                           precision=jax.lax.Precision.HIGHEST)
            top2 = jax.lax.top_k(dots.T, 2)[0]           # [N, 2]
            gap = jnp.mean(top2[:, 0] - top2[:, 1])
            alpha = float(-jnp.log(0.01) / jnp.maximum(gap, 1e-12))
        else:
            alpha = 30.0
    p: Params = {
        "assign_w": (alpha * cn).T.astype(jnp.float32),
        "centroids": centers.astype(jnp.float32),
    }
    if antiburst:
        p["ab_params"] = jnp.asarray([8.0, 7.0, 1.0], jnp.float32)
    return p


def _antiburst_weights(x_flat: jnp.ndarray, ab_params: jnp.ndarray
                       ) -> jnp.ndarray:
    """w[b, p] = (Σ_q sigmoid(w·selfDis[b,p,q] + b))^p_exp with
    selfDis = -2 + 2 xᵀx (aggregation.py:148-162, :337-344)."""
    gram = jnp.einsum("bdp,bdq->bpq", x_flat, x_flat,
                      preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    self_dis = -2.0 + 2.0 * gram
    w = jax.nn.sigmoid(ab_params[0] * self_dis + ab_params[1])
    return jnp.sum(w, axis=-1) ** ab_params[2]


def netvlad_forward(params: Params, features: jnp.ndarray,
                    normalize_input: bool = True) -> jnp.ndarray:
    """features [B, D, H, W] (backbone layout) → [B, clusters*D] VLADs.

    Mirrors NetVLAD.forward (aggregation.py:266-390): input L2-norm over D,
    softmax soft assignment, optional AntiBurst down-weighting, residual
    aggregation, intra-norm + global L2.
    """
    b, d = features.shape[:2]
    x = features.reshape(b, d, -1)                       # [B, D, P]
    if normalize_input:
        x = l2_normalize(x, axis=1)
    x = _nv_pca_project(params, x, normalize_input)      # nv_pca configs
    logits = jnp.einsum("bdp,dc->bcp", x, params["assign_w"],
                        preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    soft_assign = jax.nn.softmax(logits, axis=1)         # [B, C, P]
    if "ab_params" in params:
        w_burst = _antiburst_weights(x, params["ab_params"])
        soft_assign = soft_assign / w_burst[:, None, :]
    # vlad[b,c,d] = Σ_p soft_assign[b,c,p] * (x[b,d,p] - centroid[c,d])
    vlad = (jnp.einsum("bcp,bdp->bcd", soft_assign, x,
                       preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
            - jnp.sum(soft_assign, axis=2)[:, :, None] * params["centroids"])
    vlad = l2_normalize(vlad, axis=2)                    # intra-norm
    vlad = vlad.reshape(b, -1)
    return l2_normalize(vlad, axis=1)


def gem_pool(features: jnp.ndarray, p: float = 3.0,
             eps: float = 1e-6) -> jnp.ndarray:
    """GeM pooling (aggregation.py GeM): [B, D, H, W] → [B, D]."""
    x = jnp.clip(features, eps, None) ** p
    return jnp.mean(x, axis=(2, 3)) ** (1.0 / p)


def mac_pool(features: jnp.ndarray) -> jnp.ndarray:
    """MAC: global max pool (aggregation.py MAC)."""
    return jnp.max(features, axis=(2, 3))


def spoc_pool(features: jnp.ndarray) -> jnp.ndarray:
    """SPoC: global sum/average pool (aggregation.py SPoC)."""
    return jnp.mean(features, axis=(2, 3))


def rmac_pool(features: jnp.ndarray, levels: int = 3,
              eps: float = 1e-6) -> jnp.ndarray:
    """R-MAC, cirtorch layers.functional.rmac semantics — the reference
    RMAC class is a direct `LF.rmac(x, L, eps)` call (aggregation.py:
    98-108; the LF import is missing there, so the cirtorch original is
    the ground truth): global max-pool region, then per-level region
    grids of size floor(2·min(H,W)/(l+1)) whose long-axis surplus count
    Wd/Hd comes from the ~40% overlap search over steps 2..7, centers by
    the floor arithmetic, each region's max-pool L2-scaled by
    (norm + eps). Final L2 matches cirtorch's norm-after-pool net.
    [B, D, H, W] → [B, D]."""
    b, d, hgt, wid = features.shape
    ovr = 0.4
    steps = np.array([2, 3, 4, 5, 6, 7], np.float64)
    w = min(hgt, wid)
    if max(hgt, wid) != w:
        bdist = (max(hgt, wid) - w) / (steps - 1)
        idx = int(np.argmin(np.abs((w * w - w * bdist) / (w * w) - ovr)))
    else:
        idx = -1
    wd = idx + 1 if hgt < wid else 0
    hd = idx + 1 if hgt > wid else 0

    v = jnp.max(features, axis=(2, 3))                 # global region
    out = v / (jnp.linalg.norm(v, axis=1, keepdims=True) + eps)
    for lvl in range(1, levels + 1):
        wl = int(np.floor(2 * w / (lvl + 1)))
        if wl == 0:
            continue
        wl2 = int(np.floor(wl / 2 - 1))
        b_w = 0.0 if lvl + wd == 1 else (wid - wl) / (lvl + wd - 1)
        cen_w = (np.floor(wl2 + np.arange(lvl + wd) * b_w) - wl2).astype(int)
        b_h = 0.0 if lvl + hd == 1 else (hgt - wl) / (lvl + hd - 1)
        cen_h = (np.floor(wl2 + np.arange(lvl + hd) * b_h) - wl2).astype(int)
        for y0 in cen_h:
            for x0 in cen_w:
                reg = features[:, :, y0:y0 + wl, x0:x0 + wl]
                vt = jnp.max(reg, axis=(2, 3))
                vt = vt / (jnp.linalg.norm(vt, axis=1, keepdims=True) + eps)
                out = out + vt
    return out / jnp.maximum(jnp.linalg.norm(out, axis=1, keepdims=True),
                             eps)


def cosplace_init(key: jax.Array, in_dim: int, out_dim: int,
                  dtype=jnp.float32) -> Params:
    k = jax.random.split(key, 1)[0]
    return {"fc_w": jax.random.normal(k, (in_dim, out_dim), dtype) * 0.02,
            "fc_b": jnp.zeros((out_dim,), dtype),
            "gem_p": jnp.ones((), dtype) * 3.0}


def cosplace_forward(params: Params, features: jnp.ndarray) -> jnp.ndarray:
    """CosPlace (cosplace.py): channel-L2 → GeM(learnable p) → FC → L2."""
    x = l2_normalize(features, axis=1)
    x = gem_pool(x, p=params["gem_p"])
    x = jnp.dot(x, params["fc_w"]) + params["fc_b"]
    return l2_normalize(x, axis=1)


def convap_init(key: jax.Array, in_dim: int, out_dim: int = 512,
                dtype=jnp.float32) -> Params:
    return {"conv_w": jax.random.normal(key, (in_dim, out_dim),
                                        dtype) * 0.02,
            "conv_b": jnp.zeros((out_dim,), dtype)}


def convap_forward(params: Params, features: jnp.ndarray,
                   s1: int = 2, s2: int = 2) -> jnp.ndarray:
    """ConvAP (convap.py): 1x1 channel conv → adaptive s1xs2 avg pool →
    flatten → L2."""
    b, d, hgt, wid = features.shape
    x = jnp.einsum("bdhw,do->bohw", features, params["conv_w"],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    x = x + params["conv_b"][None, :, None, None]
    # adaptive average pooling to (s1, s2): torch bin edges
    def pool_axis(arr, axis, out_size, in_size):
        starts = (np.arange(out_size) * in_size) // out_size
        ends = -(-((np.arange(out_size) + 1) * in_size) // out_size)
        pieces = [jnp.mean(jax.lax.slice_in_dim(arr, int(s), int(e), axis=axis),
                           axis=axis, keepdims=True)
                  for s, e in zip(starts, ends)]
        return jnp.concatenate(pieces, axis=axis)
    x = pool_axis(x, 2, s1, hgt)
    x = pool_axis(x, 3, s2, wid)
    return l2_normalize(x.reshape(b, -1), axis=1)


def mixvpr_init(key: jax.Array, in_channels: int, in_h: int, in_w: int,
                out_channels: int = 512, mix_depth: int = 1,
                mlp_ratio: float = 1.0, out_rows: int = 4,
                dtype=jnp.float32) -> Params:
    hw = in_h * in_w
    ks = jax.random.split(key, 2 * mix_depth + 2)
    mixers = []
    for i in range(mix_depth):
        hid = int(hw * mlp_ratio)
        mixers.append({
            "ln": {"scale": jnp.ones((hw,), dtype),
                   "bias": jnp.zeros((hw,), dtype)},
            "fc1": {"w": jax.random.normal(ks[2 * i], (hw, hid),
                                           dtype) * 0.02,
                    "b": jnp.zeros((hid,), dtype)},
            "fc2": {"w": jax.random.normal(ks[2 * i + 1], (hid, hw),
                                           dtype) * 0.02,
                    "b": jnp.zeros((hw,), dtype)},
        })
    return {
        "mixers": mixers,
        "channel_proj": {"w": jax.random.normal(
            ks[-2], (in_channels, out_channels), dtype) * 0.02,
            "b": jnp.zeros((out_channels,), dtype)},
        "row_proj": {"w": jax.random.normal(ks[-1], (hw, out_rows),
                                            dtype) * 0.02,
                     "b": jnp.zeros((out_rows,), dtype)},
    }


def mixvpr_forward(params: Params, features: jnp.ndarray) -> jnp.ndarray:
    """MixVPR (mixvpr.py): feature-mixer MLPs over the flattened spatial
    axis, then channel and row projections. [B, D, H, W] → [B, out_c*rows]."""
    b, d = features.shape[:2]
    x = features.reshape(b, d, -1)                        # [B, D, HW]
    for mx in params["mixers"]:
        h = x
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        h = (h - mu) * jax.lax.rsqrt(var + 1e-5)
        h = h * mx["ln"]["scale"] + mx["ln"]["bias"]
        h = jax.nn.relu(jnp.dot(h, mx["fc1"]["w"]) + mx["fc1"]["b"])
        h = jnp.dot(h, mx["fc2"]["w"]) + mx["fc2"]["b"]
        x = x + h
    x = jnp.einsum("bdp,do->bpo", x, params["channel_proj"]["w"]) \
        + params["channel_proj"]["b"]                     # [B, HW, O]
    x = jnp.einsum("bpo,pr->bro", x, params["row_proj"]["w"]) \
        + params["row_proj"]["b"][:, None]                # [B, R, O]
    # torch MixVPR flattens [B, out_channels, out_rows] — (O, R) order
    # (mixvpr.py:64-70 permutes back before flatten(1))
    return l2_normalize(x.transpose(0, 2, 1).reshape(b, -1), axis=1)


def rrm_init(key: jax.Array, dim: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "ln1": {"scale": jnp.ones((dim,), dtype),
                "bias": jnp.zeros((dim,), dtype)},
        "fc1": {"w": jax.random.normal(k1, (dim, dim), dtype) * 0.02,
                "b": jnp.zeros((dim,), dtype)},
        "fc2": {"w": jax.random.normal(k2, (dim, dim), dtype) * 0.02,
                "b": jnp.zeros((dim,), dtype)},
        "ln2": {"scale": jnp.ones((dim,), dtype),
                "bias": jnp.zeros((dim,), dtype)},
    }


def rrm_forward(params: Params, features: jnp.ndarray) -> jnp.ndarray:
    """Residual Retrieval Module (aggregation.py RRM): GAP → LN → residual
    MLP → LN → L2."""
    def ln(x, p):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]

    x = jnp.mean(features, axis=(2, 3))
    x = ln(x, params["ln1"])
    h = jnp.dot(jax.nn.relu(jnp.dot(x, params["fc1"]["w"])
                            + params["fc1"]["b"]), params["fc2"]["w"]) \
        + params["fc2"]["b"]
    x = ln(x + h, params["ln2"])
    return l2_normalize(x, axis=1)


# ---------------------------------------------------------------------------
# SALAD (Sinkhorn optimal-transport assignment, salad.py:8-168)
# ---------------------------------------------------------------------------


def salad_init(key: jax.Array, dim: int, num_clusters: int = 64,
               cluster_dim: int = 128, token_dim: int = 256,
               dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 6)
    s = 0.02

    def dense(k, i, o):
        return {"w": jax.random.normal(k, (i, o), dtype) * s,
                "b": jnp.zeros((o,), dtype)}

    return {
        # score projection (clusters) and feature projection (cluster_dim)
        "score_w1": dense(ks[0], dim, 512),
        "score_w2": dense(ks[1], 512, num_clusters),
        "feat_w1": dense(ks[2], dim, 512),
        "feat_w2": dense(ks[3], 512, cluster_dim),
        # global token MLP
        "tok_w1": dense(ks[4], dim, 512),
        "tok_w2": dense(ks[5], 512, token_dim),
        "dustbin": jnp.asarray(1.0, dtype),
    }


def _log_optimal_transport(scores: jnp.ndarray, dustbin: jnp.ndarray,
                           iters: int = 3) -> jnp.ndarray:
    """SuperGlue log-space optimal transport (salad.py:8-40): dustbin row
    appended, marginals mu = [1/(m+n)]*m + (n-m)/(m+n), nu = [1/(m+n)]*n,
    final Z - norm."""
    b, m, n = scores.shape
    if n <= m:
        raise ValueError(
            f"SALAD optimal transport needs more patches ({n}) than "
            f"clusters ({m}): the dustbin marginal is log(n-m) "
            "(salad.py:26-35) — use a larger input or fewer clusters")
    bins = jnp.broadcast_to(dustbin, (b, 1, n)).astype(scores.dtype)
    couplings = jnp.concatenate([scores, bins], axis=1)   # [B, m+1, n]
    norm = -jnp.log(float(m + n))
    log_mu = jnp.concatenate([jnp.full((m,), norm),
                              jnp.asarray([np.log(n - m) + norm])])
    log_nu = jnp.full((n,), norm)
    u = jnp.zeros((b, m + 1))
    v = jnp.zeros((b, n))
    for _ in range(iters):
        u = log_mu[None] - jax.nn.logsumexp(couplings + v[:, None, :],
                                            axis=2)
        v = log_nu[None] - jax.nn.logsumexp(couplings + u[:, :, None],
                                            axis=1)
    return couplings + u[:, :, None] + v[:, None, :] - norm


def salad_forward(params: Params, features: jnp.ndarray,
                  token: Optional[jnp.ndarray] = None,
                  sinkhorn_iters: int = 3) -> jnp.ndarray:
    """[B, D, H, W] (+ optional [B, D] global token) → SALAD descriptor
    [B, token_dim + cluster_dim*num_clusters], matching salad.py:112-168
    including the (cluster_dim, num_clusters) flatten order."""
    b, d = features.shape[:2]
    x = features.reshape(b, d, -1).transpose(0, 2, 1)    # [B, P, D]

    def mlp(h, w1, w2):
        h = jnp.dot(h, w1["w"]) + w1["b"]
        h = jax.nn.relu(h)
        return jnp.dot(h, w2["w"]) + w2["b"]

    scores = mlp(x, params["score_w1"], params["score_w2"])  # [B, P, C]
    scores = scores.transpose(0, 2, 1)                       # [B, C, P]
    feats = mlp(x, params["feat_w1"], params["feat_w2"])     # [B, P, l]

    log_p = _log_optimal_transport(scores, params["dustbin"],
                                   sinkhorn_iters)
    p_assign = jnp.exp(log_p)[:, :-1, :]                     # [B, C, P]

    # v[b, l, m] = Σ_p f[b, p, l] · p[b, m, p]; normalize over l per
    # cluster; flatten in (l, m) order like torch flatten(1).
    agg = jnp.einsum("bpl,bmp->blm", feats, p_assign,
                     preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    agg = l2_normalize(agg, axis=1).reshape(b, -1)

    if token is None:
        token = jnp.mean(x, axis=1)
    tok = mlp(token, params["tok_w1"], params["tok_w2"])
    tok = l2_normalize(tok, axis=1)
    return l2_normalize(jnp.concatenate([tok, agg], axis=1), axis=1)


# ---------------------------------------------------------------------------
# CRN (Contextual Reweighting Network) — aggregation.py:471-563
# ---------------------------------------------------------------------------


def crn_init(key: jax.Array, dim: int, clusters: int = 64,
             dtype=jnp.float32) -> Params:
    """NetVLAD params + the CRN context module: 3x3/5x5/7x7 context conv
    filters (xavier-normal, zero bias) and the FIXED 1x1 accumulation conv
    (weights 1, bias 0, frozen — aggregation.py:497-510)."""
    kn, k3, k5, k7 = jax.random.split(key, 4)
    p = netvlad_init(kn, dim, clusters, antiburst=False, dtype=dtype)

    def xavier(k, shape):
        fan_in = shape[0] * shape[1] * shape[2]
        fan_out = shape[0] * shape[1] * shape[3]
        std = (2.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.normal(k, shape, dtype) * std

    p["crn"] = {
        "f3": {"w": xavier(k3, (3, 3, dim, 32)),
               "b": jnp.zeros((32,), dtype)},
        "f5": {"w": xavier(k5, (5, 5, dim, 32)),
               "b": jnp.zeros((32,), dtype)},
        "f7": {"w": xavier(k7, (7, 7, dim, 20)),
               "b": jnp.zeros((20,), dtype)},
        "acc_w": jnp.ones((84, 1), dtype),      # fixed (requires_grad=False)
        "acc_b": jnp.zeros((1,), dtype),
    }
    return p


def _avgpool_3x3_s2_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(kernel=3, stride=2, padding=0, ceil_mode=True) on NCHW:
    ceil-mode windows that overhang the input average only the valid
    elements (torch semantics)."""
    n, c, h, w = x.shape
    oh = -(-max(h - 3, 0) // 2) + 1
    ow = -(-max(w - 3, 0) // 2) + 1
    ph = max(0, (oh - 1) * 2 + 3 - h)
    pw = max(0, (ow - 1) * 2 + 3 - w)
    xs = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw)))
    ones = jnp.pad(jnp.ones((1, 1, h, w), x.dtype),
                   ((0, 0), (0, 0), (0, ph), (0, pw)))

    def sums(t):
        return jax.lax.reduce_window(t, 0.0, jax.lax.add,
                                     (1, 1, 3, 3), (1, 1, 2, 2), "VALID")

    return sums(xs) / sums(ones)


def _conv_same(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """NCHW conv with HWIO weights, SAME padding."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    return y + b[None, :, None, None]


def crn_forward(params: Params, features: jnp.ndarray,
                normalize_input: bool = True) -> jnp.ndarray:
    """CRN.forward (aggregation.py:530-563): the soft assignment is
    reweighted by a contextual mask — avg-pool-downsampled multiscale
    context convs, relu, fixed 1x1 accumulation, relu, 2x bilinear
    upsample. Requires even H/W (the reference's scale_factor=2 upsample
    must restore the input grid)."""
    from revisit_anything_tpu.ops.resize import bilinear_resize_torch
    b, d, h, w = features.shape
    assert h % 2 == 0 and w % 2 == 0, "CRN needs an even patch grid"
    x = features
    if normalize_input:
        x = l2_normalize(x, axis=1)

    crn = params["crn"]
    xd = _avgpool_3x3_s2_ceil(x)
    g = jnp.concatenate([_conv_same(xd, crn["f3"]["w"], crn["f3"]["b"]),
                         _conv_same(xd, crn["f5"]["w"], crn["f5"]["b"]),
                         _conv_same(xd, crn["f7"]["w"], crn["f7"]["b"])],
                        axis=1)
    g = jax.nn.relu(g)
    acc = jnp.einsum("bchw,co->bohw", g, crn["acc_w"],
                     preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)         + crn["acc_b"][None, :, None, None]
    mask = jax.nn.relu(acc)
    mask = bilinear_resize_torch(mask, (h, w))           # scale_factor=2

    x_flat = x.reshape(b, d, -1)
    logits = jnp.einsum("bdp,dc->bcp", x_flat, params["assign_w"],
                        preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    soft_assign = jax.nn.softmax(logits, axis=1)
    soft_assign = soft_assign * mask.reshape(b, 1, h * w)

    vlad = (jnp.einsum("bcp,bdp->bcd", soft_assign, x_flat,
                       preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
            - jnp.sum(soft_assign, axis=2)[:, :, None] * params["centroids"])
    vlad = l2_normalize(vlad, axis=2)
    return l2_normalize(vlad.reshape(b, -1), axis=1)
