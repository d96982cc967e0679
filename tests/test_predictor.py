"""SamPredictor API tests (small random model)."""

import numpy as np
import pytest

import jax

from revisit_anything_tpu.models.sam import SamArchConfig, init_sam_params
from revisit_anything_tpu.models.sam.predictor import SamPredictor

SMALL = SamArchConfig(encoder_dim=64, encoder_depth=2, encoder_heads=4,
                      global_attn_indexes=(1,), image_size=128,
                      patch_size=16, window_size=4, prompt_dim=32,
                      decoder_heads=4, decoder_mlp_dim=128,
                      iou_head_hidden=32)


@pytest.fixture(scope="module")
def predictor():
    params = init_sam_params(SMALL, jax.random.PRNGKey(0))
    return SamPredictor(params, SMALL)


def test_requires_set_image(predictor, rng):
    p = SamPredictor(predictor.params, SMALL)
    with pytest.raises(AssertionError):
        p.predict(point_coords=np.array([[5, 5]]), point_labels=np.array([1]))


def test_point_predict(predictor, rng):
    img = rng.integers(0, 255, (60, 100, 3), dtype=np.uint8)
    predictor.set_image(img)
    masks, iou, lowres = predictor.predict(
        point_coords=np.array([[50, 30]]), point_labels=np.array([1]))
    assert masks.shape == (3, 60, 100) and masks.dtype == bool
    assert iou.shape == (3,)
    assert lowres.shape == (3, 32, 32)


def test_box_and_single_mask(predictor, rng):
    img = rng.integers(0, 255, (60, 100, 3), dtype=np.uint8)
    predictor.set_image(img)
    masks, iou, _ = predictor.predict(box=np.array([10, 10, 60, 50]),
                                      multimask_output=False)
    assert masks.shape == (1, 60, 100)
    masks2, _, _ = predictor.predict(
        point_coords=np.array([[20, 20]]), point_labels=np.array([1]),
        box=np.array([10, 10, 60, 50]), return_logits=True)
    assert masks2.dtype == np.float32


def test_no_prompt_raises(predictor, rng):
    img = rng.integers(0, 255, (60, 100, 3), dtype=np.uint8)
    predictor.set_image(img)
    with pytest.raises(ValueError):
        predictor.predict()
