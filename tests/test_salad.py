"""SALAD parity vs a literal torch oracle of the reference aggregation."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from revisit_anything_tpu.training.aggregators import (salad_forward,
                                                       salad_init)
from revisit_anything_tpu.training.vladbuff import (
    convert_dinosalad_checkpoint)
from revisit_anything_tpu.models import dinov2 as dn


def torch_log_ot(scores, alpha, iters=3):
    b, m, n = scores.shape
    one = scores.new_tensor(1)
    ms, ns = (m * one), (n * one)
    bins = alpha.expand(b, 1, n)
    couplings = torch.cat([scores, bins], 1)
    norm = -(ms + ns).log()
    log_mu = torch.cat([norm.expand(m), ((ns - ms).log() + norm)[None]])
    log_nu = norm.expand(n)
    log_mu, log_nu = log_mu[None].expand(b, -1), log_nu[None].expand(b, -1)
    u, v = torch.zeros_like(log_mu), torch.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - torch.logsumexp(couplings + v.unsqueeze(1), dim=2)
        v = log_nu - torch.logsumexp(couplings + u.unsqueeze(2), dim=1)
    return couplings + u.unsqueeze(2) + v.unsqueeze(1) - norm


def torch_salad(params, x_np, token_np):
    """Literal oracle of SALAD.forward (salad.py:112-168)."""
    x = torch.from_numpy(x_np)                      # [B, D, H, W]
    t = torch.from_numpy(token_np)

    def mlp(h, w1, w2):
        h = h @ torch.from_numpy(np.asarray(w1["w"])) \
            + torch.from_numpy(np.asarray(w1["b"]))
        h = F.relu(h)
        return h @ torch.from_numpy(np.asarray(w2["w"])) \
            + torch.from_numpy(np.asarray(w2["b"]))

    b, d = x.shape[:2]
    flat = x.flatten(2).permute(0, 2, 1)            # [B, P, D]
    f = mlp(flat, params["feat_w1"], params["feat_w2"]).permute(0, 2, 1)
    p = mlp(flat, params["score_w1"], params["score_w2"]).permute(0, 2, 1)
    t = mlp(t, params["tok_w1"], params["tok_w2"])

    p = torch_log_ot(p, torch.from_numpy(np.asarray(params["dustbin"])), 3)
    p = torch.exp(p)[:, :-1, :]
    l = f.shape[1]
    m = p.shape[1]
    p_e = p.unsqueeze(1).repeat(1, l, 1, 1)
    f_e = f.unsqueeze(2).repeat(1, 1, m, 1)
    v = torch.cat([
        F.normalize(t, p=2, dim=-1),
        F.normalize((f_e * p_e).sum(dim=-1), p=2, dim=1).flatten(1),
    ], dim=-1)
    return F.normalize(v, p=2, dim=-1).numpy()


def test_salad_matches_reference_oracle(rng):
    params = salad_init(jax.random.PRNGKey(0), dim=24, num_clusters=6,
                        cluster_dim=8, token_dim=10)
    x = rng.standard_normal((2, 24, 4, 5)).astype(np.float32)
    token = rng.standard_normal((2, 24)).astype(np.float32)
    ours = np.asarray(salad_forward(params, jnp.asarray(x),
                                    jnp.asarray(token)))
    ref = torch_salad(params, x, token)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_dinosalad_checkpoint_conversion(rng):
    cfg = dn.DinoV2Config(embed_dim=32, depth=1, num_heads=2, ffn="mlp",
                          pretrain_grid=(4, 4))
    from tests.test_vladbuff import synth_hub_state_dict
    sd = {f"backbone.model.{k}": v.numpy()
          for k, v in synth_hub_state_dict(cfg, rng).items()}

    def conv(o, i):
        return torch.from_numpy(
            rng.standard_normal((o, i, 1, 1)).astype(np.float32))

    def lin(o, i):
        return torch.from_numpy(
            rng.standard_normal((o, i)).astype(np.float32))

    sd.update({
        "aggregator.score.0.weight": conv(512, 32).numpy(),
        "aggregator.score.0.bias": np.zeros(512, np.float32),
        "aggregator.score.3.weight": conv(6, 512).numpy(),
        "aggregator.score.3.bias": np.zeros(6, np.float32),
        "aggregator.cluster_features.0.weight": conv(512, 32).numpy(),
        "aggregator.cluster_features.0.bias": np.zeros(512, np.float32),
        "aggregator.cluster_features.3.weight": conv(8, 512).numpy(),
        "aggregator.cluster_features.3.bias": np.zeros(8, np.float32),
        "aggregator.token_features.0.weight": lin(512, 32).numpy(),
        "aggregator.token_features.0.bias": np.zeros(512, np.float32),
        "aggregator.token_features.2.weight": lin(10, 512).numpy(),
        "aggregator.token_features.2.bias": np.zeros(10, np.float32),
        "aggregator.dust_bin": np.asarray(1.5, np.float32),
    })
    params = convert_dinosalad_checkpoint(sd, cfg)
    from revisit_anything_tpu.training.vladbuff import (
        extract_dinosalad_features, salad_global_descriptor)
    imgs = rng.standard_normal((1, 56, 56, 3)).astype(np.float32)
    feats = np.asarray(extract_dinosalad_features(params, cfg,
                                                  jnp.asarray(imgs)))
    assert feats.shape == (1, 32, 4, 4)
    np.testing.assert_allclose(
        np.linalg.norm(feats, axis=1), 1.0, atol=1e-4)
    desc = np.asarray(salad_global_descriptor(params, cfg,
                                              jnp.asarray(imgs)))
    assert desc.shape == (1, 10 + 6 * 8)
    np.testing.assert_allclose(np.linalg.norm(desc, axis=1), 1.0, atol=1e-5)
