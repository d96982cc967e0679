from revisit_anything_tpu.datasets.gt import (
    get_gt, radius_positives, parse_camera_pose, utm_from_paths)
from revisit_anything_tpu.datasets.images import list_dataset_images
