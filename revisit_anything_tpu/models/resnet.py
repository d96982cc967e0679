"""ResNet backbones (functional JAX) — the VLAD-BuFF CNN backbone family.

Mirrors VLAD-BuFF/models/backbones/resnet.py:7-106: a torchvision-layout
ResNet run through conv1..layer4 (no avgpool/fc), with optional cropping of
layer3/layer4 and freeze-prefix semantics handled by the optimizer mask at
train time. Inference uses frozen batch-norm (eval mode — running stats
folded into scale/bias at conversion).

Variants: resnet18/34 (BasicBlock) and resnet50/101/152 (Bottleneck).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    block: str                      # "basic" | "bottleneck"
    layers: Tuple[int, int, int, int]
    width: int = 64
    layers_to_crop: Tuple[int, ...] = ()

    def __post_init__(self):
        # the forward stops at the first cropped layer, so cropping 3
        # implicitly drops 4 as well; require it explicitly or
        # out_channels would misreport the feature width
        if 3 in self.layers_to_crop and 4 not in self.layers_to_crop:
            raise ValueError("layers_to_crop=(3,) also drops layer4 — "
                             "pass layers_to_crop=(4, 3) explicitly")

    @property
    def expansion(self) -> int:
        return 1 if self.block == "basic" else 4

    @property
    def out_channels(self) -> int:
        base = 512 * self.expansion
        if 4 in self.layers_to_crop:
            base //= 2
        if 3 in self.layers_to_crop:
            base //= 2
        return base


RESNET18 = ResNetConfig("basic", (2, 2, 2, 2))
RESNET34 = ResNetConfig("basic", (3, 4, 6, 3))
RESNET50 = ResNetConfig("bottleneck", (3, 4, 6, 3))
RESNET101 = ResNetConfig("bottleneck", (3, 4, 23, 3))
RESNET152 = ResNetConfig("bottleneck", (3, 8, 36, 3))

CONFIGS = {"resnet18": RESNET18, "resnet34": RESNET34,
           "resnet50": RESNET50, "resnet101": RESNET101,
           "resnet152": RESNET152}


def _conv(x, w, stride=1, padding=None):
    # torch uses symmetric padding (k-1)//2; XLA's "SAME" pads
    # asymmetrically for strided convs — must be explicit.
    if padding is None:
        p = (w.shape[0] - 1) // 2
        padding = ((p, p), (p, p))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _conv_bn(x, p, stride=1, relu=True):
    """Conv + folded (frozen) batch norm (+ ReLU)."""
    y = _conv(x, p["w"], stride)
    y = y * p["bn_scale"] + p["bn_bias"]
    return jax.nn.relu(y) if relu else y


def _basic_block(x, p, stride):
    identity = x
    y = _conv_bn(x, p["conv1"], stride)
    y = _conv_bn(y, p["conv2"], 1, relu=False)
    if "downsample" in p:
        identity = _conv_bn(x, p["downsample"], stride, relu=False)
    return jax.nn.relu(y + identity)


def _bottleneck_block(x, p, stride):
    identity = x
    y = _conv_bn(x, p["conv1"], 1)
    y = _conv_bn(y, p["conv2"], stride)
    y = _conv_bn(y, p["conv3"], 1, relu=False)
    if "downsample" in p:
        identity = _conv_bn(x, p["downsample"], stride, relu=False)
    return jax.nn.relu(y + identity)


@partial(jax.jit, static_argnames=("cfg",))
def resnet_forward(params: Params, cfg: ResNetConfig,
                   images: jnp.ndarray) -> jnp.ndarray:
    """images [B, H, W, 3] (ImageNet-normalized) → features
    [B, C, H/s, W/s] (channel-first, matching the torch backbone)."""
    x = images.astype(params["stem"]["w"].dtype)
    # stem: 7x7/2 conv + bn + relu + 3x3/2 maxpool (torch padding 1)
    x = _conv(x, params["stem"]["w"], stride=2, padding=((3, 3), (3, 3)))
    x = jax.nn.relu(x * params["stem"]["bn_scale"] + params["stem"]["bn_bias"])
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))

    block = _basic_block if cfg.block == "basic" else _bottleneck_block
    for li, stage in enumerate(params["layers"], start=1):
        if li in cfg.layers_to_crop:
            break
        for bi, blk in enumerate(stage):
            stride = 2 if (li > 1 and bi == 0) else 1
            x = block(x, blk, stride)
    return jnp.transpose(x, (0, 3, 1, 2))


def convert_torchvision_resnet(state_dict: Dict[str, np.ndarray],
                               cfg: ResNetConfig,
                               eps: float = 1e-5) -> Params:
    """torchvision ResNet state dict → our param tree with batch norms
    folded for inference (scale = gamma/sqrt(var+eps), bias = beta - scale*mean)."""
    g = lambda k: np.asarray(state_dict[k], dtype=np.float32)

    def conv_bn(conv_key, bn_key):
        w = g(conv_key + ".weight").transpose(2, 3, 1, 0)     # HWIO
        gamma = g(bn_key + ".weight")
        beta = g(bn_key + ".bias")
        mean = g(bn_key + ".running_mean")
        var = g(bn_key + ".running_var")
        scale = gamma / np.sqrt(var + eps)
        return {"w": jnp.asarray(w),
                "bn_scale": jnp.asarray(scale),
                "bn_bias": jnp.asarray(beta - scale * mean)}

    layers: List[List[Params]] = []
    for li, n_blocks in enumerate(cfg.layers, start=1):
        if li in cfg.layers_to_crop:
            break
        stage = []
        for bi in range(n_blocks):
            pre = f"layer{li}.{bi}"
            blk: Params = {
                "conv1": conv_bn(pre + ".conv1", pre + ".bn1"),
                "conv2": conv_bn(pre + ".conv2", pre + ".bn2"),
            }
            if cfg.block == "bottleneck":
                blk["conv3"] = conv_bn(pre + ".conv3", pre + ".bn3")
            if f"{pre}.downsample.0.weight" in state_dict:
                blk["downsample"] = conv_bn(pre + ".downsample.0",
                                            pre + ".downsample.1")
            stage.append(blk)
        layers.append(stage)

    return {"stem": conv_bn("conv1", "bn1"), "layers": layers}


def init_resnet_params(cfg: ResNetConfig, key: jax.Array,
                       dtype=jnp.float32) -> Params:
    """Random-init params (synthetic testing; real weights come from
    torchvision checkpoints)."""
    def synth_sd():
        sd = {}
        rngs = np.random.default_rng(int(jax.random.randint(
            key, (), 0, 2**31 - 1)))

        def add_conv_bn(name_c, name_b, cin, cout, k):
            sd[name_c + ".weight"] = rngs.standard_normal(
                (cout, cin, k, k)).astype(np.float32) * 0.05
            sd[name_b + ".weight"] = np.ones(cout, np.float32)
            sd[name_b + ".bias"] = np.zeros(cout, np.float32)
            sd[name_b + ".running_mean"] = np.zeros(cout, np.float32)
            sd[name_b + ".running_var"] = np.ones(cout, np.float32)

        add_conv_bn("conv1", "bn1", 3, cfg.width, 7)
        cin = cfg.width
        for li, n_blocks in enumerate(cfg.layers, start=1):
            planes = cfg.width * 2 ** (li - 1)
            cout = planes * cfg.expansion
            for bi in range(n_blocks):
                pre = f"layer{li}.{bi}"
                if cfg.block == "basic":
                    add_conv_bn(pre + ".conv1", pre + ".bn1", cin, planes, 3)
                    add_conv_bn(pre + ".conv2", pre + ".bn2", planes,
                                planes, 3)
                else:
                    add_conv_bn(pre + ".conv1", pre + ".bn1", cin, planes, 1)
                    add_conv_bn(pre + ".conv2", pre + ".bn2", planes,
                                planes, 3)
                    add_conv_bn(pre + ".conv3", pre + ".bn3", planes,
                                cout, 1)
                if bi == 0 and (cin != cout or li > 1):
                    add_conv_bn(pre + ".downsample.0", pre + ".downsample.1",
                                cin, cout, 1)
                cin = cout
        return sd

    params = convert_torchvision_resnet(synth_sd(), cfg)
    if dtype != jnp.float32:
        params = jax.tree.map(lambda x: x.astype(dtype), params)
    return params
