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


def make_gsv_dataset(tmp_path, rng, cities=("Boston", "London"),
                     places=3, imgs=4, hw=(40, 40), skip_write=()):
    """GSV-Cities SHIPPED layout: Dataframes/<City>.csv + Images/<city_id>/
    with filenames the loader must reconstruct from the row fields
    (GSVCitiesDataset.get_img_name)."""
    (tmp_path / "Dataframes").mkdir()
    header = "place_id,city_id,panoid,year,month,northdeg,lat,lon\n"
    for city in cities:
        cid = city[:3].upper()
        rows = []
        for p in range(places):
            for i in range(imgs):
                lat, lon = 41.5 + p * 0.125, -71.25 - i * 0.5
                rows.append(f"{p + 10},{cid},pano{p}x{i},2019,{i + 1},"
                            f"{p * 37 % 360},{lat},{lon}\n")
                name = (f"{cid}_{p + 10:07d}_2019_{i + 1:02d}_"
                        f"{p * 37 % 360:03d}_{lat}_{lon}_pano{p}x{i}.jpg")
                if (city, p) not in skip_write:
                    d = tmp_path / "Images" / cid
                    d.mkdir(parents=True, exist_ok=True)
                    img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
                    Image.fromarray(img).save(d / name)
        (tmp_path / "Dataframes" / f"{city}.csv").write_text(
            header + "".join(rows))
    return str(tmp_path)


def test_discover_places_gsv_shipped_format(tmp_path, rng):
    """Shipped-format discovery: reference grouping semantics — per-city
    place-id prefixing (i * 10**5), min_img_per_place filter, exact
    filename reconstruction (every path must exist on disk)."""
    import os

    from revisit_anything_tpu.training.data import discover_places_gsv

    root = make_gsv_dataset(tmp_path, rng)
    places = discover_places_gsv(root)
    # cities sorted: Boston -> prefix 0, London -> prefix 1; same raw ids
    # (10..12) must stay distinct across cities (GSVCitiesDataset.py:78-81)
    assert sorted(places) == ["0000010", "0000011", "0000012",
                              "0100010", "0100011", "0100012"]
    for paths in places.values():
        assert len(paths) == 4
        for p in paths:
            assert os.path.exists(p), p     # filename recipe matches disk

    # min_img_per_place: a 4-image place survives at the default, is
    # dropped at 5 (GSVCitiesDataset.py:86-90)
    assert discover_places_gsv(root, min_img_per_place=5) == {}

    # explicit city selection reorders the prefixes
    only = discover_places_gsv(root, cities=["London"])
    assert sorted(only) == ["0000010", "0000011", "0000012"]
    assert all("LON_" in p for paths in only.values() for p in paths)


def test_gsv_shipped_feeds_batcher(tmp_path, rng):
    """Discovery → PlacesBatcher → labels grouped by place, images loaded
    from the reconstructed paths."""
    from revisit_anything_tpu.training.data import discover_places_gsv

    root = make_gsv_dataset(tmp_path, rng, cities=("Boston",), places=3)
    places = discover_places_gsv(root)
    b = PlacesBatcher(places, image_hw=(42, 56), places_per_batch=3,
                      img_per_place=4, seed=0)
    imgs, labels = next(iter(b))
    assert imgs.shape == (12, 42, 56, 3)
    np.testing.assert_array_equal(labels, np.repeat(np.arange(3), 4))


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


def test_gsv_float_typed_columns_render_like_pandas(tmp_path, rng):
    """A re-exported CSV whose year/northdeg columns parse as float (NaNs
    elsewhere in the pipeline make pandas infer float64) must reconstruct
    filenames via str() of the parsed value — '2019.0'/'177.5' EXACTLY as
    the reference's get_img_name does (GSVCitiesDataset.py:155-176) —
    not crash in int() or silently build non-existent int-formatted
    paths."""
    import os

    from PIL import Image

    from revisit_anything_tpu.training.data import discover_places_gsv

    (tmp_path / "Dataframes").mkdir()
    header = "place_id,city_id,panoid,year,month,northdeg,lat,lon\n"
    rows, names = [], []
    for i in range(4):
        lat, lon = 41.5 + i * 0.125, -71.25
        # year/northdeg carry a float-typed column (one decimal value
        # forces the whole pandas column to float64)
        rows.append(f"10,BOS,pano{i},2019.0,{i + 1},177.5,{lat},{lon}\n")
        names.append(f"BOS_0000010_2019.0_{i + 1:02d}_177.5_{lat}_{lon}_"
                     f"pano{i}.jpg")
    (tmp_path / "Dataframes" / "Boston.csv").write_text(
        header + "".join(rows))
    d = tmp_path / "Images" / "BOS"
    d.mkdir(parents=True)
    for name in names:
        Image.fromarray(
            rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(d / name)

    places = discover_places_gsv(str(tmp_path))
    assert sorted(places) == ["0000010"]
    for p in places["0000010"]:
        assert os.path.exists(p), p
