from revisit_anything_tpu.ops.resize import (
    nearest_resize, bilinear_resize_align_corners)
from revisit_anything_tpu.ops.masks import (
    mask_pool_matrices, pool_masks_to_patch_grid, mask_centroids)
from revisit_anything_tpu.ops.adjacency import delaunay_adjacency
from revisit_anything_tpu.ops.vlad import (
    l2_normalize, hard_assignment, segment_vlad, global_vlad)
from revisit_anything_tpu.ops.pca import (
    PCAParams, pca_apply, pca_fit, load_sklearn_pca_pickle)
from revisit_anything_tpu.ops.kmeans import kmeans_fit
from revisit_anything_tpu.ops.knn import knn_l2, knn_inner_product
