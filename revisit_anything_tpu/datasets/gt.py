"""Ground-truth construction per dataset (host-side numpy/scipy).

Mirrors the reference's gt dispatch (gt.py:10-79) and its per-dataset
loaders (dataloaders/): Baidu .camera pose files with 10 m radius
positives, MSLS SALAD npy files with per-city natsort re-indexing, pitts /
SFXL UTM-from-filename at 25 m, InsideOut gps pickles at 50 m, 17places
index±15, AmsterTime identity, VPAir gt npy.
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Sequence

import numpy as np

from revisit_anything_tpu.io.h5io import natsorted_keys


def radius_positives(db_coords: np.ndarray, query_coords: np.ndarray,
                     radius: float) -> List[np.ndarray]:
    """Per-query database indices within ``radius`` (func_vpr.py
    get_positives :1656-1669 — sklearn radius_neighbors semantics)."""
    from sklearn.neighbors import NearestNeighbors
    knn = NearestNeighbors(n_jobs=-1)
    knn.fit(np.asarray(db_coords, dtype=np.float64))
    _, positives = knn.radius_neighbors(
        np.asarray(query_coords, dtype=np.float64), radius=radius)
    return list(positives)


def parse_camera_pose(path: str) -> np.ndarray:
    """Camera center [x, y, z] from a Baidu .camera file — the
    second-to-last line (baidu_dataloader.py get_cop_pose :55-73)."""
    with open(path) as f:
        lines = f.readlines()
    return np.fromstring(lines[-2], dtype=float, sep=" ")


def parse_camera_pose_rot(path: str):
    """(center [x, y, z], euler zyx degrees [3]) from a Baidu .camera
    file — lines 4-6 hold the 3x3 rotation matrix (baidu_dataloader.py
    get_cop_pose :55-73, scipy Rotation.as_euler('zyx', degrees=True))."""
    from scipy.spatial.transform import Rotation
    with open(path) as f:
        lines = f.readlines()
    xyz = np.fromstring(lines[-2], dtype=float, sep=" ")
    rot = np.stack([np.fromstring(lines[i], dtype=float, sep=" ")
                    for i in (4, 5, 6)])
    return xyz, Rotation.from_matrix(rot).as_euler("zyx", degrees=True)


def angular_filter_positives(positives: List[np.ndarray],
                             db_euler: np.ndarray,
                             q_euler: np.ndarray,
                             ang_thresh: float) -> List[np.ndarray]:
    """AND-filter radius positives by mean absolute euler-angle
    difference < ``ang_thresh`` degrees (baidu_dataloader.py
    use_ang_positives :160-196 — the reference's non-default knob)."""
    out = []
    for i, pos in enumerate(positives):
        keep = [j for j in np.asarray(pos)
                if np.mean(np.abs(q_euler[i] - db_euler[j])) < ang_thresh]
        out.append(np.asarray(keep, dtype=np.int64))
    return out


def utm_from_paths(paths: Sequence[str]) -> np.ndarray:
    """UTM (easting, northing) from '@'-delimited filename tokens
    (func_vpr.py get_utm :1647-1653)."""
    return np.array([(float(p.split("@")[1]), float(p.split("@")[2]))
                     for p in paths])


def _baidu_gt(data_root: str, dist_thresh: float = 10.0,
              ang_thresh: Optional[float] = None) -> List[np.ndarray]:
    """Baidu positives within ``dist_thresh`` meters; with ``ang_thresh``
    (degrees; the reference default is 20 when enabled) additionally
    within the mean euler-angle difference — baidu_dataloader.py
    use_ang_positives=False default :103, filter :160-196."""
    base = os.path.join(data_root, "baidu")

    def poses(sub):
        files = natsorted_keys(os.listdir(os.path.join(base, sub)))
        both = [parse_camera_pose_rot(os.path.join(base, sub, f))
                for f in files]
        return (np.stack([b[0] for b in both]),
                np.stack([b[1] for b in both]))

    db_xyz, db_euler = poses("training_gt")
    q_xyz, q_euler = poses("query_gt")
    positives = radius_positives(db_xyz, q_xyz, dist_thresh)
    if ang_thresh is None:
        return positives
    return angular_filter_positives(positives, db_euler, q_euler,
                                    ang_thresh)


def _vpair_gt(data_root: str) -> List[np.ndarray]:
    gt = np.load(os.path.join(data_root, "VPAir", "vpair_gt.npy"),
                 allow_pickle=True)
    return [np.asarray(entry[1]) for entry in gt]


def msls_city_of(name) -> "Optional[str]":
    """Reference per-city classification (MapillaryDatasetVal.py:137-154):
    cph is checked FIRST — image keys are random strings that can contain
    'sf' by accident (a shipped cph query key does), so 'sf' means
    "contains 'sf' and not 'cph'". A plain substring test put that query
    in BOTH cities and broke the expected 242-query SF count."""
    s = str(name)
    if "cph" in s:
        return "cph"
    if "sf" in s:
        return "sf"
    return None


def _msls_gt(city: str, gt_root: str) -> List[np.ndarray]:
    """MSLS val gt from the SALAD npy files with the reference's per-city
    filtering + natsort re-indexing (MapillaryDatasetVal.py:31-180)."""
    db_images = np.load(os.path.join(gt_root, "msls_val_dbImages.npy"))
    q_idx = np.load(os.path.join(gt_root, "msls_val_qIdx.npy"))
    q_images = np.load(os.path.join(gt_root, "msls_val_qImages.npy"))[q_idx]
    p_idx = np.load(os.path.join(gt_root, "msls_val_pIdx.npy"),
                    allow_pickle=True)

    db_sel = [i for i, p in enumerate(db_images)
              if msls_city_of(p) == city]
    q_sel = [i for i, p in enumerate(q_images)
             if msls_city_of(p) == city]
    db_old2new = {old: new for new, old in enumerate(db_sel)}

    db_city = [str(db_images[i]) for i in db_sel]
    q_city = [str(q_images[i]) for i in q_sel]
    gt_city = [[db_old2new[j] for j in p_idx[i] if j in db_old2new]
               for i in q_sel]

    # natsort re-indexing: both image lists are re-sorted naturally and gt
    # indices remapped accordingly.
    from revisit_anything_tpu.io.h5io import _natural_key
    db_order = sorted(range(len(db_city)),
                      key=lambda i: _natural_key(db_city[i]))
    q_order = sorted(range(len(q_city)),
                     key=lambda i: _natural_key(q_city[i]))
    db_pos = {old: new for new, old in enumerate(db_order)}
    gt_sorted = [np.asarray(sorted(db_pos[j] for j in gt_city[i]))
                 for i in q_order]
    return gt_sorted


def get_gt(dataset: str,
           data_root: str,
           ref_paths: Optional[Sequence[str]] = None,
           query_paths: Optional[Sequence[str]] = None,
           msls_gt_root: Optional[str] = None,
           baidu_ang_thresh: Optional[float] = None) -> Optional[List]:
    """Ground truth per dataset (gt.py:10-79 dispatch).

    ``baidu_ang_thresh``: optional Baidu orientation AND-filter in
    degrees (the reference's use_ang_positives knob, default off —
    baidu_dataloader.py:103)."""
    if dataset == "baidu":
        return _baidu_gt(data_root, ang_thresh=baidu_ang_thresh)
    if dataset in ("mslsSF", "mslsCPH"):
        city = "sf" if dataset == "mslsSF" else "cph"
        root = msls_gt_root or os.path.join(data_root, "msls_npy_files")
        return _msls_gt(city, root)
    if dataset == "pitts":
        base = os.path.join(data_root, "pitts", "pitts30k", "images", "test")
        db = np.load(os.path.join(base, "database.npy"))
        q = np.load(os.path.join(base, "queries.npy"))
        return radius_positives(utm_from_paths(db), utm_from_paths(q), 25)
    if dataset == "SFXL":
        if ref_paths is None or query_paths is None:
            raise ValueError("SFXL needs ref/query paths (UTM in filenames)")
        return radius_positives(utm_from_paths(ref_paths),
                                utm_from_paths(query_paths), 25)
    if dataset == "InsideOut":
        base = os.path.join(data_root, "InsideOut")
        with open(os.path.join(base, "gps_db_correct.pkl"), "rb") as f:
            utm_db = pickle.load(f)
        with open(os.path.join(base, "gps_q_new.pkl"), "rb") as f:
            utm_q = pickle.load(f)
        return radius_positives(np.asarray(utm_db), np.asarray(utm_q), 50)
    if dataset == "17places":
        if query_paths is None:
            raise ValueError("17places needs query paths (index gt)")
        rad = 15
        return [list(np.arange(i - rad, i + rad + 1))
                for i in range(len(query_paths))]
    if dataset == "AmsterTime":
        if ref_paths is None:
            raise ValueError("AmsterTime needs ref paths (identity gt)")
        return [[i] for i in range(len(ref_paths))]
    if dataset == "VPAir":
        return _vpair_gt(data_root)
    return None
