"""GSV-Cities-style place batcher tests."""

import numpy as np
from PIL import Image

from revisit_anything_tpu.training.data import (PlacesBatcher,
                                                discover_places, prefetch)


def make_dataset(tmp_path, rng, cities=2, places=5, imgs=4, hw=(40, 40)):
    for c in range(cities):
        for p in range(places):
            d = tmp_path / f"city{c}" / f"place{p:03d}"
            d.mkdir(parents=True)
            for i in range(imgs):
                img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
                Image.fromarray(img).save(d / f"{i}.jpg")
    return str(tmp_path)


def test_discover_places(tmp_path, rng):
    root = make_dataset(tmp_path, rng)
    places = discover_places(root, min_images=4)
    assert len(places) == 10
    assert all(len(v) == 4 for v in places.values())


def test_batcher_shapes_and_labels(tmp_path, rng):
    root = make_dataset(tmp_path, rng)
    places = discover_places(root)
    b = PlacesBatcher(places, image_hw=(42, 56), places_per_batch=3,
                      img_per_place=4, seed=0)
    batches = list(b)
    assert len(batches) == 3          # 10 places // 3
    imgs, labels = batches[0]
    assert imgs.shape == (12, 42, 56, 3)  # cropped to patch multiples
    assert imgs.dtype == np.float32
    np.testing.assert_array_equal(labels, np.repeat(np.arange(3), 4))


def test_batcher_deterministic_per_seed(tmp_path, rng):
    root = make_dataset(tmp_path, rng)
    places = discover_places(root)
    a = list(PlacesBatcher(places, places_per_batch=2, seed=7))
    b = list(PlacesBatcher(places, places_per_batch=2, seed=7))
    for (ia, la), (ib, lb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)


def test_prefetch_preserves_order(tmp_path, rng):
    items = [(np.full((2, 2), i), i) for i in range(10)]
    out = list(prefetch(iter(items), depth=3))
    assert [o[1] for o in out] == list(range(10))


def test_batcher_feeds_train_step(tmp_path, rng):
    import jax
    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.training import (VPRTrainConfig,
                                               create_train_state,
                                               train_step)
    root = make_dataset(tmp_path, rng, cities=1, places=4, hw=(56, 56))
    places = discover_places(root)
    cfg = VPRTrainConfig(
        backbone=dn.DinoV2Config(embed_dim=32, depth=2, num_heads=2,
                                 ffn="mlp", pretrain_grid=(4, 4)),
        num_trainable_blocks=1, clusters=4, total_steps=10, warmup_steps=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batcher = PlacesBatcher(places, image_hw=(56, 56), places_per_batch=2,
                            img_per_place=4)
    params, opt, step = state.params, state.opt_state, state.step
    for imgs, labels in prefetch(iter(batcher)):
        params, opt, step, loss = train_step(params, opt, step, cfg,
                                             imgs, labels)
    assert np.isfinite(float(loss))
    assert int(step) == 2


def test_prefetch_reraises_worker_exception():
    from revisit_anything_tpu.training.data import prefetch

    def bad_iter():
        yield 1
        raise RuntimeError("corrupt image")

    it = prefetch(bad_iter())
    assert next(it) == 1
    import pytest
    with pytest.raises(RuntimeError, match="corrupt image"):
        list(it)
