"""Cross-implementation AMG verification: our TPU AMG vs HuggingFace's
mask-generation pipeline on the SAME random SAM weights.

Run: python scripts/compare_amg_vs_hf.py
Observed: every mask produced by either implementation has an IoU>0.9
counterpart in the other (mask-content parity of grid->decode->upsample->
threshold). Set sizes differ because the HF pipeline does not forward
points_per_side (runs its default 32x32 grid) and dedupes differently;
HF's torchvision NMS dependency is satisfied with our greedy NMS (itself
equivalence-tested in tests/test_nms.py).
"""
import os; os.environ["JAX_PLATFORMS"]="cpu"
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, torch, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
from transformers import SamConfig, SamMaskDecoderConfig, SamModel, SamPromptEncoderConfig, SamVisionConfig
from transformers.models.sam.image_processing_sam import SamImageProcessor
from transformers.pipelines import pipeline as hf_pipeline
# torchvision is absent; give HF's AMG postprocess our greedy NMS
import transformers.models.sam.image_processing_sam as _ip
from revisit_anything_tpu.ops.nms import nms_host as _nms_host
def _batched_nms(boxes, scores, idxs, iou_threshold):
    keep = _nms_host(boxes.detach().numpy(), scores.detach().numpy(),
                     iou_threshold)
    return torch.as_tensor(keep, dtype=torch.long)
_ip.batched_nms = _batched_nms

IMG, DIM, PD = 128, 64, 32
vc = SamVisionConfig(hidden_size=DIM, num_hidden_layers=2, num_attention_heads=4,
    image_size=IMG, patch_size=16, global_attn_indexes=[1], window_size=4,
    output_channels=PD, num_pos_feats=PD//2, mlp_dim=DIM*4)
pc = SamPromptEncoderConfig(hidden_size=PD, image_embedding_size=IMG//16, image_size=IMG, num_pos_feats=PD//2)
mc = SamMaskDecoderConfig(hidden_size=PD, iou_head_hidden_dim=PD, num_hidden_layers=2, num_attention_heads=4)
torch.manual_seed(0)
model = SamModel(SamConfig(vision_config=vc.to_dict(), prompt_encoder_config=pc.to_dict(), mask_decoder_config=mc.to_dict())).eval()
with torch.no_grad():
    for p in model.parameters():
        p.data.normal_(0, 0.05)

processor = SamImageProcessor(size={"longest_edge": IMG}, pad_size={"height": IMG, "width": IMG})
gen = hf_pipeline("mask-generation", model=model, image_processor=processor, device=-1)

rng = np.random.default_rng(0)
img = rng.integers(0, 255, (60, 100, 3), dtype=np.uint8)
from PIL import Image
out = gen(Image.fromarray(img), points_per_side=8, points_per_batch=32,
          pred_iou_thresh=-1e9, stability_score_thresh=0.0,
          crops_nms_thresh=0.7)
hf_masks = [np.asarray(m) for m in out["masks"]]
hf_scores = [float(s) for s in out["scores"]]
print("HF masks:", len(hf_masks), "scores:", np.round(hf_scores[:5], 3))

# ours on converted weights
from revisit_anything_tpu.models.sam import SamArchConfig, convert_hf_sam_state_dict
from revisit_anything_tpu.models.sam.amg import AmgConfig, generate_masks
sd = {k: v.numpy() for k, v in model.state_dict().items()}
cfg = SamArchConfig(encoder_dim=DIM, encoder_depth=2, encoder_heads=4,
    global_attn_indexes=(1,), image_size=IMG, patch_size=16, window_size=4,
    prompt_dim=PD, decoder_heads=4, decoder_mlp_dim=2048, iou_head_hidden=PD)
params = convert_hf_sam_state_dict(sd, cfg)
amg = AmgConfig(points_per_side=8, points_per_batch=32,
                pred_iou_thresh=-1e9, stability_score_thresh=0.0, box_nms_thresh=0.7)
ours = generate_masks(params, cfg, img, amg)
print("ours:", len(ours), "ious:", np.round([r.predicted_iou for r in ours[:5]], 3))

def iou(a, b):
    inter = np.logical_and(a, b).sum(); union = np.logical_or(a, b).sum()
    return inter/union if union else 1.0
matched = 0
for hm in hf_masks:
    best = max((iou(hm, r.segmentation) for r in ours), default=0)
    matched += best > 0.9
print(f"HF masks matched in ours at IoU>0.9: {matched}/{len(hf_masks)}")
matched2 = 0
for r in ours:
    best = max((iou(r.segmentation, hm) for hm in hf_masks), default=0)
    matched2 += best > 0.9
print(f"our masks matched in HF at IoU>0.9: {matched2}/{len(ours)}")

# --- multi-crop (crop_n_layers=1) correspondence ---
# HF's mask-generation pipeline is broken for crops_n_layers>0 in this
# transformers version (crop-embedding batch 5 vs point batch 1 ->
# ValueError in SamModel.forward), so the cross-check drives HF per crop:
# our generate_crop_boxes produces the reference crop geometry
# (oracle-tested in tests/test_amg.py), each crop runs through HF's
# single-image path, and every mask our multi-crop AMG keeps must have an
# IoU>0.9 counterpart in the union of HF's uncropped per-crop masks (our
# set is a subset after crop-edge filtering + cross-crop NMS).
from revisit_anything_tpu.models.sam.amg import generate_crop_boxes
crop_boxes, _layers = generate_crop_boxes(img.shape[:2], 1, 512 / 1500)
hf_union = []
for (cx0, cy0, cx1, cy1) in crop_boxes:
    crop = img[cy0:cy1, cx0:cx1]
    out_c = gen(Image.fromarray(crop), points_per_batch=32,
                pred_iou_thresh=-1e9, stability_score_thresh=0.0,
                crops_nms_thresh=0.7)
    for m in out_c["masks"]:
        unc = np.zeros(img.shape[:2], bool)
        unc[cy0:cy1, cx0:cx1] = np.asarray(m)
        hf_union.append(unc)
print(f"multi-crop: HF union (5 single-crop runs) {len(hf_union)} masks")

amg_mc = AmgConfig(points_per_side=8, points_per_batch=32,
                   pred_iou_thresh=-1e9, stability_score_thresh=0.0,
                   box_nms_thresh=0.7, crop_n_layers=1)
ours_mc = generate_masks(params, cfg, img, amg_mc)
m2 = sum(max((iou(r.segmentation, hm) for hm in hf_union), default=0) > 0.9
         for r in ours_mc)
print(f"multi-crop ours→HF-union IoU>0.9: {m2}/{len(ours_mc)}")
assert len(ours_mc) > 0 and m2 >= 0.9 * len(ours_mc), "multi-crop mismatch"
print("multi-crop correspondence OK")
