"""ResNet backbone: torch-functional oracle parity + structure checks.

(torchvision is unavailable; the oracle reimplements the torchvision
forward with torch.nn.functional ops over the same synthetic state dict.)
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax

from revisit_anything_tpu.models.resnet import (
    CONFIGS, RESNET18, RESNET50, ResNetConfig, convert_torchvision_resnet,
    init_resnet_params, resnet_forward)


def synth_state_dict(cfg, rng):
    sd = {}

    def add(name_c, name_b, cin, cout, k):
        sd[name_c + ".weight"] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * 0.05
        sd[name_b + ".weight"] = 1 + 0.1 * rng.standard_normal(
            cout).astype(np.float32)
        sd[name_b + ".bias"] = 0.1 * rng.standard_normal(
            cout).astype(np.float32)
        sd[name_b + ".running_mean"] = 0.1 * rng.standard_normal(
            cout).astype(np.float32)
        sd[name_b + ".running_var"] = np.abs(
            1 + 0.1 * rng.standard_normal(cout)).astype(np.float32)

    add("conv1", "bn1", 3, cfg.width, 7)
    cin = cfg.width
    for li, n_blocks in enumerate(cfg.layers, start=1):
        planes = cfg.width * 2 ** (li - 1)
        cout = planes * cfg.expansion
        for bi in range(n_blocks):
            pre = f"layer{li}.{bi}"
            if cfg.block == "basic":
                add(pre + ".conv1", pre + ".bn1", cin, planes, 3)
                add(pre + ".conv2", pre + ".bn2", planes, planes, 3)
            else:
                add(pre + ".conv1", pre + ".bn1", cin, planes, 1)
                add(pre + ".conv2", pre + ".bn2", planes, planes, 3)
                add(pre + ".conv3", pre + ".bn3", planes, cout, 1)
            if bi == 0 and (cin != cout or li > 1):
                add(pre + ".downsample.0", pre + ".downsample.1",
                    cin, cout, 1)
            cin = cout
    return sd


def torch_resnet_forward(sd, cfg, x_np):
    """torchvision ResNet eval forward via torch.nn.functional."""
    t = lambda k: torch.from_numpy(sd[k])

    def conv(x, key, stride, pad):
        return F.conv2d(x, t(key + ".weight"), stride=stride, padding=pad)

    def bn(x, key):
        return F.batch_norm(x, t(key + ".running_mean"),
                            t(key + ".running_var"), t(key + ".weight"),
                            t(key + ".bias"), training=False, eps=1e-5)

    x = torch.from_numpy(x_np)
    x = F.relu(bn(conv(x, "conv1", 2, 3), "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for li, n_blocks in enumerate(cfg.layers, start=1):
        if li in cfg.layers_to_crop:
            break
        for bi in range(n_blocks):
            pre = f"layer{li}.{bi}"
            stride = 2 if (li > 1 and bi == 0) else 1
            identity = x
            if cfg.block == "basic":
                y = F.relu(bn(conv(x, pre + ".conv1", stride, 1),
                              pre + ".bn1"))
                y = bn(conv(y, pre + ".conv2", 1, 1), pre + ".bn2")
            else:
                y = F.relu(bn(conv(x, pre + ".conv1", 1, 0), pre + ".bn1"))
                y = F.relu(bn(conv(y, pre + ".conv2", stride, 1),
                              pre + ".bn2"))
                y = bn(conv(y, pre + ".conv3", 1, 0), pre + ".bn3")
            if f"{pre}.downsample.0.weight" in sd:
                identity = bn(conv(x, pre + ".downsample.0", stride, 0),
                              pre + ".downsample.1")
            x = F.relu(y + identity)
    return x.numpy()


TINY_BASIC = ResNetConfig("basic", (1, 1, 1, 1), width=8)
TINY_BOTTLE = ResNetConfig("bottleneck", (1, 1, 1, 1), width=8)


def test_basic_resnet_matches_torch_oracle(rng):
    sd = synth_state_dict(TINY_BASIC, rng)
    params = convert_torchvision_resnet(sd, TINY_BASIC)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(resnet_forward(params, TINY_BASIC, x))
    ref = torch_resnet_forward(sd, TINY_BASIC,
                               np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_bottleneck_resnet_matches_torch_oracle(rng):
    sd = synth_state_dict(TINY_BOTTLE, rng)
    params = convert_torchvision_resnet(sd, TINY_BOTTLE)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(resnet_forward(params, TINY_BOTTLE, x))
    ref = torch_resnet_forward(sd, TINY_BOTTLE,
                               np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_layer_crop(rng):
    cfg = ResNetConfig("basic", (1, 1, 1, 1), width=8, layers_to_crop=(4,))
    sd = synth_state_dict(ResNetConfig("basic", (1, 1, 1, 1), width=8), rng)
    params = convert_torchvision_resnet(sd, cfg)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    out = np.asarray(resnet_forward(params, cfg, x))
    # cropped at layer3 output: stride 16, channels 8*4=32
    assert out.shape == (1, 32, 4, 4)
    ref = torch_resnet_forward(sd, cfg,
                               np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_out_channels_property():
    assert RESNET50.out_channels == 2048
    assert RESNET18.out_channels == 512
    assert ResNetConfig("bottleneck", (3, 4, 6, 3),
                        layers_to_crop=(4,)).out_channels == 1024


def test_init_params_forward(rng):
    params = init_resnet_params(TINY_BASIC, jax.random.PRNGKey(0))
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    out = np.asarray(resnet_forward(params, TINY_BASIC, x))
    assert np.isfinite(out).all()
    assert set(CONFIGS) == {"resnet18", "resnet34", "resnet50",
                            "resnet101", "resnet152"}
