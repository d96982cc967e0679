"""Ground-truth construction tests with synthetic dataset fixtures."""

import os
import pickle

import numpy as np
import pytest

from revisit_anything_tpu.datasets import (get_gt, parse_camera_pose,
                                           radius_positives, utm_from_paths)


def test_radius_positives_semantics(rng):
    db = np.array([[0, 0], [10, 0], [100, 100]], dtype=float)
    q = np.array([[1, 0], [50, 50]], dtype=float)
    pos = radius_positives(db, q, radius=15)
    assert set(pos[0].tolist()) == {0, 1}
    assert len(pos[1]) == 0


def test_utm_from_paths():
    paths = ["img@123.5@678.25@x.jpg", "a@-10.0@20.0@.png"]
    utm = utm_from_paths(paths)
    np.testing.assert_allclose(utm, [[123.5, 678.25], [-10.0, 20.0]])


def test_parse_camera_pose(tmp_path):
    cam = tmp_path / "a.camera"
    cam.write_text(
        "fx 0 cx\n0 fy cy\n0 0 1\nk1 k2\n"
        "1 0 0\n0 1 0\n0 0 1\n0 0 0\n"
        "1.5 2.5 3.5\n"
        "640 480\n")
    pose = parse_camera_pose(str(cam))
    np.testing.assert_allclose(pose, [1.5, 2.5, 3.5])


def test_baidu_gt_pipeline(tmp_path):
    base = tmp_path / "baidu"
    for sub, positions in (
            ("training_gt", [[0, 0, 0], [5, 0, 0], [100, 0, 0]]),
            ("query_gt", [[1, 0, 0], [99, 0, 0]])):
        d = base / sub
        d.mkdir(parents=True)
        for i, p in enumerate(positions):
            (d / f"img_{i}.camera").write_text(
                "h\nh\nh\nh\n1 0 0\n0 1 0\n0 0 1\n0 0 0\n"
                f"{p[0]} {p[1]} {p[2]}\n640 480\n")
    gt = get_gt("baidu", str(tmp_path))
    assert set(gt[0].tolist()) == {0, 1}       # within 10m of (1,0,0)
    assert set(gt[1].tolist()) == {2}


def test_baidu_angular_positives(tmp_path):
    """The reference's optional orientation AND-filter
    (baidu_dataloader.py use_ang_positives :103,160-196): radius
    positives whose mean |euler(q) − euler(db)| ≥ ang_thresh drop."""
    base = tmp_path / "baidu"
    rot90z = "0 -1 0\n1 0 0\n0 0 1\n"            # euler zyx = (90, 0, 0)
    ident = "1 0 0\n0 1 0\n0 0 1\n"
    for sub, entries in (
            ("training_gt", [([0, 0, 0], ident), ([5, 0, 0], rot90z),
                             ([100, 0, 0], ident)]),
            ("query_gt", [([1, 0, 0], ident)])):
        d = base / sub
        d.mkdir(parents=True)
        for i, (p, rot) in enumerate(entries):
            (d / f"img_{i}.camera").write_text(
                f"h\nh\nh\nh\n{rot}0 0 0\n"
                f"{p[0]} {p[1]} {p[2]}\n640 480\n")
    gt_rad = get_gt("baidu", str(tmp_path))
    assert set(gt_rad[0].tolist()) == {0, 1}
    # mean |(90,0,0) − (0,0,0)| = 30° ≥ 20° → db 1 filtered out
    gt_ang = get_gt("baidu", str(tmp_path), baidu_ang_thresh=20.0)
    assert set(gt_ang[0].tolist()) == {0}
    # a generous threshold keeps both
    gt_wide = get_gt("baidu", str(tmp_path), baidu_ang_thresh=45.0)
    assert set(gt_wide[0].tolist()) == {0, 1}


def test_17places_and_amstertime_gt():
    q = [f"q{i}.jpg" for i in range(40)]
    r = [f"r{i}.jpg" for i in range(40)]
    gt17 = get_gt("17places", "/nonexistent", ref_paths=r, query_paths=q)
    assert gt17[20] == list(range(5, 36))
    gt_ams = get_gt("AmsterTime", "/nonexistent", ref_paths=r, query_paths=q)
    assert gt_ams[7] == [7]


def test_sfxl_gt():
    r = [f"db@{x}.0@0.0@.jpg" for x in (0, 30, 60)]
    q = ["q@10.0@0.0@.jpg"]
    gt = get_gt("SFXL", "/nonexistent", ref_paths=r, query_paths=q)
    assert set(gt[0].tolist()) == {0, 1}


def test_vpair_gt(tmp_path):
    d = tmp_path / "VPAir"
    d.mkdir()
    data = np.array([(0, [1, 2]), (1, [3])], dtype=object)
    np.save(d / "vpair_gt.npy", data, allow_pickle=True)
    gt = get_gt("VPAir", str(tmp_path))
    assert list(gt[0]) == [1, 2] and list(gt[1]) == [3]


def test_msls_gt(tmp_path):
    # synthetic SALAD-style npy files: 4 db (2 cph, 2 sf), 3 queries
    db = np.array(["train/cph/db_2.jpg", "train/sf/db_1.jpg",
                   "train/cph/db_1.jpg", "train/sf/db_0.jpg"])
    q_all = np.array(["train/cph/q_1.jpg", "train/sf/q_0.jpg",
                      "train/cph/q_0.jpg", "train/extra/skip.jpg"])
    q_idx = np.array([0, 1, 2])
    p_idx = np.array([np.array([0, 2]), np.array([1]),
                      np.array([2])], dtype=object)
    np.save(tmp_path / "msls_val_dbImages.npy", db)
    np.save(tmp_path / "msls_val_qImages.npy", q_all)
    np.save(tmp_path / "msls_val_qIdx.npy", q_idx)
    np.save(tmp_path / "msls_val_pIdx.npy", p_idx, allow_pickle=True)

    gt = get_gt("mslsCPH", "/nonexistent", msls_gt_root=str(tmp_path))
    # cph db natural order: db_1 (orig idx 2 → city idx 1), db_2 (orig 0 → 0)
    # cph queries natural order: q_0 (city idx 1), q_1 (city idx 0)
    # q_0 (orig gt [2]) → city db idx 1 → natsorted position 0
    # q_1 (orig gt [0,2]) → city idx [0,1] → natsorted [1, 0]
    assert gt[0].tolist() == [0]
    assert sorted(gt[1].tolist()) == [0, 1]

    gt_sf = get_gt("mslsSF", "/nonexistent", msls_gt_root=str(tmp_path))
    assert len(gt_sf) == 1
    # sf q_0 → orig db 1 (db_1); sf dbs natsorted = [db_0, db_1] → pos 1
    assert gt_sf[0].tolist() == [1]


def test_unknown_dataset_returns_none():
    assert get_gt("not_a_dataset", "/nonexistent") is None


def test_vladbuff_val_real_npys():
    """Load every benchmark whose npys ship in the reference tree."""
    import os

    import pytest

    from revisit_anything_tpu.datasets.vladbuff_val import (
        DEFAULT_GT_ROOT, REGISTRY, load_msls_val, load_vladbuff_val)
    if not os.path.isdir(DEFAULT_GT_ROOT):
        pytest.skip("reference npy root not mounted")
    loaded = 0
    for name, (subdir, db_npy, q_npy, gt_spec) in REGISTRY.items():
        if not os.path.exists(os.path.join(DEFAULT_GT_ROOT, subdir,
                                           db_npy)):
            continue
        if (gt_spec[0] == "npy"
                and not os.path.exists(os.path.join(DEFAULT_GT_ROOT,
                                                    subdir, gt_spec[1]))):
            # gt npys aren't downloadable here; a missing one now raises
            # a clear FileNotFoundError instead of silently gt=None
            with pytest.raises(FileNotFoundError):
                load_vladbuff_val(name)
            continue
        ds = load_vladbuff_val(name)
        assert ds.num_references > 0 and ds.num_queries > 0
        assert len(ds.images) == ds.num_references + ds.num_queries
        if ds.ground_truth is not None:
            assert len(ds.ground_truth) == ds.num_queries
            flat = np.concatenate([np.asarray(g).ravel()
                                   for g in ds.ground_truth if len(g)])
            assert flat.max() < ds.num_references
        loaded += 1
    assert loaded >= 4, f"only {loaded} benchmarks loadable"

    # the shipped msls_val dir has no dbImages.npy: gt would index an
    # empty database, so loading must fail loudly
    with pytest.raises(FileNotFoundError):
        load_msls_val()


def test_vladbuff_val_utm_radius(tmp_path):
    """UTM filename parsing + radius positives on synthetic npys."""
    from revisit_anything_tpu.datasets.vladbuff_val import load_vladbuff_val
    sub = tmp_path / "st_lucia"
    sub.mkdir()
    db = [f"ref/@{100.0 + i}@{200.0}@img{i}.jpg" for i in range(10)]
    q = ["q/@105.0@200.0@q0.jpg", "q/@300.0@300.0@q1.jpg"]
    np.save(sub / "st_lucia_dbImages.npy", np.array(db))
    np.save(sub / "st_lucia_qImages.npy", np.array(q))
    ds = load_vladbuff_val("st_lucia", gt_root=str(tmp_path))
    # 25 m radius around (105, 200): db indices with |100+i-105| <= 25 → all
    assert sorted(ds.ground_truth[0].tolist()) == list(range(10))
    assert len(ds.ground_truth[1]) == 0


def test_msls_city_classifier_cph_first():
    """Image keys are random strings that can contain 'sf'; the reference
    classifies cph FIRST (MapillaryDatasetVal.py:137-154), so such keys
    must not leak into the SF subset (a shipped cph query key does —
    plain substring filtering produced 243 SF queries vs the expected
    242)."""
    from revisit_anything_tpu.datasets.gt import msls_city_of
    assert msls_city_of(
        "train_val/cph/query/images/LDPdkYSQGgUsflOXmFS2gw.jpg") == "cph"
    assert msls_city_of("train_val/sf/database/images/abc.jpg") == "sf"
    assert msls_city_of("train_val/other/images/x.jpg") is None


def test_msls_gt_counts_match_reference_subsets():
    """With the real npys, per-city query counts must equal the
    msls_data_clean expected sizes (README.md:20-36): CPH 498, SF 242."""
    import os
    import pytest
    from revisit_anything_tpu.datasets.gt import _msls_gt
    root = "/root/reference/VLAD-BuFF/datasets/msls_val"
    if not os.path.exists(os.path.join(root, "msls_val_dbImages.npy")):
        pytest.skip("reference msls npys not mounted")
    assert len(_msls_gt("cph", root)) == 498
    assert len(_msls_gt("sf", root)) == 242
