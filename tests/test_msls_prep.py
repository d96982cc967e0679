"""MSLS preparation utilities."""

import numpy as np
import pytest

from revisit_anything_tpu.datasets.msls_prep import (
    EXPECTED_COUNTS, city_image_lists, filter_city_images, verify_counts)


@pytest.fixture
def gt_root(tmp_path):
    db = np.array(["train/cph/db_2.jpg", "train/sf/db_1.jpg",
                   "train/cph/db_1.jpg"])
    q_all = np.array(["train/cph/q_1.jpg", "train/sf/q_0.jpg"])
    np.save(tmp_path / "msls_val_dbImages.npy", db)
    np.save(tmp_path / "msls_val_qImages.npy", q_all)
    np.save(tmp_path / "msls_val_qIdx.npy", np.array([0, 1]))
    return str(tmp_path)


def test_city_lists_natsorted(gt_root):
    db, q = city_image_lists(gt_root, "cph")
    assert db == ["train/cph/db_1.jpg", "train/cph/db_2.jpg"]
    assert q == ["train/cph/q_1.jpg"]


def test_filter_copies_subset(gt_root, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    for name in ("db_1.jpg", "db_2.jpg", "q_1.jpg", "other.jpg"):
        (raw / name).write_bytes(b"x")
    out = tmp_path / "out"
    n_db, n_q = filter_city_images(gt_root, "cph", str(raw), str(out))
    assert (n_db, n_q) == (2, 1)
    assert sorted(p.name for p in (out / "database").iterdir()) == \
        ["db_1.jpg", "db_2.jpg"]


def test_verify_counts():
    assert verify_counts("cph", *EXPECTED_COUNTS["cph"])
    assert not verify_counts("sf", 1, 2)
    with pytest.raises(ValueError):
        verify_counts("sf", 1, 2, strict=True)
