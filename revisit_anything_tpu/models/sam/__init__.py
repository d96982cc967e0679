from revisit_anything_tpu.models.sam.config import (
    SamArchConfig, SAM_VIT_H, SAM_VIT_L, SAM_VIT_B, SAM_REGISTRY)
from revisit_anything_tpu.models.sam.encoder import encode_image
from revisit_anything_tpu.models.sam.prompt import (
    embed_points, dense_positional_embedding, no_mask_dense_embedding)
from revisit_anything_tpu.models.sam.decoder import decode_masks
from revisit_anything_tpu.models.sam.params import init_sam_params
from revisit_anything_tpu.models.sam.convert import (
    convert_hf_sam_state_dict, convert_original_sam_state_dict,
    load_sam_checkpoint)
