from revisit_anything_tpu.io.h5io import (
    read_image_masks, write_image_masks, read_dino_features,
    write_dino_features, list_image_keys, MaskRecord)
from revisit_anything_tpu.io.vocab import load_cluster_centers
