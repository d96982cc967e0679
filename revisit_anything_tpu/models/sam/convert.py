"""SAM checkpoint conversion (host-side; torch only deserializes).

Two source layouts:
- the original ``sam_vit_h_4b8939.pth`` state dict (the reference loads it
  via sam_model_registry, build_sam.py:103-107) — prefix ``image_encoder.``
  / ``prompt_encoder.`` / ``mask_decoder.``;
- HuggingFace ``SamModel`` (prefix ``vision_encoder.`` etc.), used as the
  random-weight parity oracle in tests.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from revisit_anything_tpu.models.sam.config import SamArchConfig

Params = Dict[str, Any]


def _np(sd, k):
    return np.asarray(sd[k], dtype=np.float32)


def _dense_t(sd, prefix):
    """torch Linear [out, in] → {w: [in, out], b: [out]}."""
    p = {"w": jnp.asarray(_np(sd, prefix + ".weight").T)}
    p["b"] = (jnp.asarray(_np(sd, prefix + ".bias"))
              if prefix + ".bias" in sd else None)
    return p


def _ln(sd, prefix):
    return {"scale": jnp.asarray(_np(sd, prefix + ".weight")),
            "bias": jnp.asarray(_np(sd, prefix + ".bias"))}


def _convt_w(sd, prefix):
    """ConvTranspose2d(k=2,s=2) weight [in, out, 2, 2] → [in, 4*out]
    matching the decoder upscaler's matmul+reshape layout (kh, kw, cout)
    (see decoder._upscale_masks_blocks)."""
    w = _np(sd, prefix + ".weight")
    cin, cout = w.shape[0], w.shape[1]
    return (jnp.asarray(w.transpose(0, 2, 3, 1).reshape(cin, 4 * cout)),
            jnp.asarray(_np(sd, prefix + ".bias")))


def _mlp_layers(sd, prefix, n, hf=False):
    if hf:
        names = ([f"{prefix}.proj_in"]
                 + [f"{prefix}.layers.{i}" for i in range(n - 2)]
                 + [f"{prefix}.proj_out"])
    else:
        names = [f"{prefix}.layers.{i}" for i in range(n)]
    return [_dense_t(sd, nm) for nm in names]


def _encoder_common(sd, cfg: SamArchConfig, p):
    """Shared encoder mapping; ``p`` maps logical names → state-dict keys."""
    pe_w = _np(sd, p["patch_w"])
    pe_w = pe_w.transpose(2, 3, 1, 0).reshape(-1, cfg.encoder_dim)
    blocks = []
    for i in range(cfg.encoder_depth):
        b = p["block"](i)
        blocks.append({
            "norm1": _ln(sd, b["norm1"]),
            "qkv": _dense_t(sd, b["qkv"]),
            "proj": _dense_t(sd, b["proj"]),
            "rel_pos_h": jnp.asarray(_np(sd, b["rel_h"])),
            "rel_pos_w": jnp.asarray(_np(sd, b["rel_w"])),
            "norm2": _ln(sd, b["norm2"]),
            "lin1": _dense_t(sd, b["lin1"]),
            "lin2": _dense_t(sd, b["lin2"]),
        })
    conv1 = _np(sd, p["neck_c1"])[:, :, 0, 0].T          # [D, 256]
    conv2 = _np(sd, p["neck_c2"]).transpose(2, 3, 1, 0)   # HWIO
    return {
        "patch_embed": {"w": jnp.asarray(pe_w),
                        "b": jnp.asarray(_np(sd, p["patch_b"]))},
        "pos_embed": jnp.asarray(_np(sd, p["pos_embed"])),
        "blocks": blocks,
        "neck": {"conv1_w": jnp.asarray(conv1), "ln1": _ln(sd, p["neck_ln1"]),
                 "conv2_w": jnp.asarray(conv2), "ln2": _ln(sd, p["neck_ln2"])},
    }


def _decoder_common(sd, cfg: SamArchConfig, pfx: str, hf: bool):
    def attn(prefix):
        return {"q": _dense_t(sd, prefix + ".q_proj"),
                "k": _dense_t(sd, prefix + ".k_proj"),
                "v": _dense_t(sd, prefix + ".v_proj"),
                "out": _dense_t(sd, prefix + ".out_proj")}

    layers = []
    for i in range(cfg.decoder_depth):
        lp = f"{pfx}.transformer.layers.{i}"
        layers.append({
            "self_attn": attn(lp + ".self_attn"),
            "norm1": _ln(sd, lp + (".layer_norm1" if hf else ".norm1")),
            "t2i": attn(lp + ".cross_attn_token_to_image"),
            "norm2": _ln(sd, lp + (".layer_norm2" if hf else ".norm2")),
            "lin1": _dense_t(sd, lp + ".mlp.lin1"),
            "lin2": _dense_t(sd, lp + ".mlp.lin2"),
            "norm3": _ln(sd, lp + (".layer_norm3" if hf else ".norm3")),
            "i2t": attn(lp + ".cross_attn_image_to_token"),
            "norm4": _ln(sd, lp + (".layer_norm4" if hf else ".norm4")),
        })

    if hf:
        up1_w, up1_b = _convt_w(sd, pfx + ".upscale_conv1")
        up2_w, up2_b = _convt_w(sd, pfx + ".upscale_conv2")
        up_ln = _ln(sd, pfx + ".upscale_layer_norm")
        final_norm = _ln(sd, pfx + ".transformer.layer_norm_final_attn")
    else:
        up1_w, up1_b = _convt_w(sd, pfx + ".output_upscaling.0")
        up2_w, up2_b = _convt_w(sd, pfx + ".output_upscaling.3")
        up_ln = _ln(sd, pfx + ".output_upscaling.1")
        final_norm = _ln(sd, pfx + ".transformer.norm_final_attn")

    return {
        "iou_token": jnp.asarray(_np(sd, pfx + ".iou_token.weight")),
        "mask_tokens": jnp.asarray(_np(sd, pfx + ".mask_tokens.weight")),
        "layers": layers,
        "final_attn": attn(pfx + ".transformer.final_attn_token_to_image"),
        "norm_final": final_norm,
        "up1_w": up1_w, "up1_b": up1_b, "up_ln": up_ln,
        "up2_w": up2_w, "up2_b": up2_b,
        "hyper_mlps": [
            _mlp_layers(sd, f"{pfx}.output_hypernetworks_mlps.{i}", 3, hf)
            for i in range(cfg.num_mask_tokens)],
        "iou_head": _mlp_layers(sd, pfx + ".iou_prediction_head",
                                cfg.iou_head_depth, hf),
    }


def convert_original_sam_state_dict(sd: Dict[str, np.ndarray],
                                    cfg: SamArchConfig) -> Params:
    enc = _encoder_common(sd, cfg, {
        "patch_w": "image_encoder.patch_embed.proj.weight",
        "patch_b": "image_encoder.patch_embed.proj.bias",
        "pos_embed": "image_encoder.pos_embed",
        "block": lambda i: {
            "norm1": f"image_encoder.blocks.{i}.norm1",
            "qkv": f"image_encoder.blocks.{i}.attn.qkv",
            "proj": f"image_encoder.blocks.{i}.attn.proj",
            "rel_h": f"image_encoder.blocks.{i}.attn.rel_pos_h",
            "rel_w": f"image_encoder.blocks.{i}.attn.rel_pos_w",
            "norm2": f"image_encoder.blocks.{i}.norm2",
            "lin1": f"image_encoder.blocks.{i}.mlp.lin1",
            "lin2": f"image_encoder.blocks.{i}.mlp.lin2",
        },
        "neck_c1": "image_encoder.neck.0.weight",
        "neck_ln1": "image_encoder.neck.1",
        "neck_c2": "image_encoder.neck.2.weight",
        "neck_ln2": "image_encoder.neck.3",
    })
    def conv_hwio(key):
        return jnp.asarray(_np(sd, key).transpose(2, 3, 1, 0))

    prompt = {
        "pe_gaussian": jnp.asarray(_np(
            sd, "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix")),
        "point_embed": jnp.asarray(np.stack(
            [_np(sd, f"prompt_encoder.point_embeddings.{i}.weight")[0]
             for i in range(4)])),
        "not_a_point": jnp.asarray(
            _np(sd, "prompt_encoder.not_a_point_embed.weight")[0]),
        "no_mask": jnp.asarray(
            _np(sd, "prompt_encoder.no_mask_embed.weight")[0]),
        "mask_down": {
            "conv1_w": conv_hwio("prompt_encoder.mask_downscaling.0.weight"),
            "conv1_b": jnp.asarray(
                _np(sd, "prompt_encoder.mask_downscaling.0.bias")),
            "ln1": _ln(sd, "prompt_encoder.mask_downscaling.1"),
            "conv2_w": conv_hwio("prompt_encoder.mask_downscaling.3.weight"),
            "conv2_b": jnp.asarray(
                _np(sd, "prompt_encoder.mask_downscaling.3.bias")),
            "ln2": _ln(sd, "prompt_encoder.mask_downscaling.4"),
            "conv3_w": jnp.asarray(_np(
                sd, "prompt_encoder.mask_downscaling.6.weight")[:, :, 0, 0].T),
            "conv3_b": jnp.asarray(
                _np(sd, "prompt_encoder.mask_downscaling.6.bias")),
        },
    }
    dec = _decoder_common(sd, cfg, "mask_decoder", hf=False)
    return {"encoder": enc, "prompt": prompt, "decoder": dec}


def convert_hf_sam_state_dict(sd: Dict[str, np.ndarray],
                              cfg: SamArchConfig) -> Params:
    enc = _encoder_common(sd, cfg, {
        "patch_w": "vision_encoder.patch_embed.projection.weight",
        "patch_b": "vision_encoder.patch_embed.projection.bias",
        "pos_embed": "vision_encoder.pos_embed",
        "block": lambda i: {
            "norm1": f"vision_encoder.layers.{i}.layer_norm1",
            "qkv": f"vision_encoder.layers.{i}.attn.qkv",
            "proj": f"vision_encoder.layers.{i}.attn.proj",
            "rel_h": f"vision_encoder.layers.{i}.attn.rel_pos_h",
            "rel_w": f"vision_encoder.layers.{i}.attn.rel_pos_w",
            "norm2": f"vision_encoder.layers.{i}.layer_norm2",
            "lin1": f"vision_encoder.layers.{i}.mlp.lin1",
            "lin2": f"vision_encoder.layers.{i}.mlp.lin2",
        },
        "neck_c1": "vision_encoder.neck.conv1.weight",
        "neck_ln1": "vision_encoder.neck.layer_norm1",
        "neck_c2": "vision_encoder.neck.conv2.weight",
        "neck_ln2": "vision_encoder.neck.layer_norm2",
    })
    prompt = {
        # HF keeps two Fourier matrices (image-wide vs prompt); both equal
        # the original's single pe_layer in converted checkpoints, but a
        # random HF oracle has them independent — keep both.
        "pe_gaussian": jnp.asarray(_np(
            sd, "prompt_encoder.shared_embedding.positional_embedding")),
        "pe_gaussian_dense": jnp.asarray(_np(
            sd, "shared_image_embedding.positional_embedding")),
        "point_embed": jnp.asarray(np.stack(
            [_np(sd, f"prompt_encoder.point_embed.{i}.weight")[0]
             for i in range(4)])),
        "not_a_point": jnp.asarray(
            _np(sd, "prompt_encoder.not_a_point_embed.weight")[0]),
        "no_mask": jnp.asarray(
            _np(sd, "prompt_encoder.no_mask_embed.weight")[0]),
        "mask_down": {
            "conv1_w": jnp.asarray(_np(
                sd, "prompt_encoder.mask_embed.conv1.weight"
            ).transpose(2, 3, 1, 0)),
            "conv1_b": jnp.asarray(
                _np(sd, "prompt_encoder.mask_embed.conv1.bias")),
            "ln1": _ln(sd, "prompt_encoder.mask_embed.layer_norm1"),
            "conv2_w": jnp.asarray(_np(
                sd, "prompt_encoder.mask_embed.conv2.weight"
            ).transpose(2, 3, 1, 0)),
            "conv2_b": jnp.asarray(
                _np(sd, "prompt_encoder.mask_embed.conv2.bias")),
            "ln2": _ln(sd, "prompt_encoder.mask_embed.layer_norm2"),
            "conv3_w": jnp.asarray(_np(
                sd, "prompt_encoder.mask_embed.conv3.weight")[:, :, 0, 0].T),
            "conv3_b": jnp.asarray(
                _np(sd, "prompt_encoder.mask_embed.conv3.bias")),
        },
    }
    dec = _decoder_common(sd, cfg, "mask_decoder", hf=True)
    return {"encoder": enc, "prompt": prompt, "decoder": dec}


def load_sam_checkpoint(path: str, cfg: SamArchConfig) -> Params:
    """Load a torch SAM checkpoint (.pth) from disk into our param tree."""
    import torch  # host-side deserialization only
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd_np = {k: v.numpy() for k, v in sd.items()}
    if any(k.startswith("vision_encoder.") for k in sd_np):
        return convert_hf_sam_state_dict(sd_np, cfg)
    return convert_original_sam_state_dict(sd_np, cfg)
