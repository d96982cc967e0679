from revisit_anything_tpu.pipeline.extract import (
    extract_sam_masks, extract_dino_features)
from revisit_anything_tpu.pipeline.aggregate import (
    compute_segment_vlads, SegmentBank)
from revisit_anything_tpu.pipeline.evaluate import (
    run_segloc_retrieval, run_anyloc_retrieval)
from revisit_anything_tpu.pipeline.vocabulary import (
    fit_vocabulary_from_h5, fit_pca_from_vlads)
