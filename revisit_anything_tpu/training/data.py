"""Training data pipeline — GSV-Cities-style place sampling (host-side).

The reference trains on GSV-Cities via a Lightning datamodule
(VLAD-BuFF/dataloaders/GSVCitiesDataloader.py): each batch element is a
*place* of ``img_per_place`` views; the flattened batch carries place ids
as labels for the metric-learning loss. Here the loader is a simple
generator over a directory layout

    root/<city>/<place_id>/<image>.jpg

(or an explicit {place_id: [paths]} mapping), yielding numpy batches ready
for the jitted train step — no torch DataLoader; host prefetch is a thread.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Tuple

import numpy as np

from revisit_anything_tpu.datasets.images import IMAGE_EXTS
from revisit_anything_tpu.models.dinov2 import preprocess


def discover_places(root: str, min_images: int = 4) -> Dict[str, List[str]]:
    """city/place_id/image layout → {place_key: [image paths]}."""
    places: Dict[str, List[str]] = {}
    for city in sorted(os.listdir(root)):
        city_dir = os.path.join(root, city)
        if not os.path.isdir(city_dir):
            continue
        for place in sorted(os.listdir(city_dir)):
            pdir = os.path.join(city_dir, place)
            if not os.path.isdir(pdir):
                continue
            imgs = [os.path.join(pdir, f) for f in sorted(os.listdir(pdir))
                    if f.lower().endswith(IMAGE_EXTS)]
            if len(imgs) >= min_images:
                places[f"{city}/{place}"] = imgs
    return places


def discover_places_gsv(root: str, cities: List[str] = None,
                        min_img_per_place: int = 4) -> Dict[str, List[str]]:
    """GSV-Cities in its SHIPPED on-disk format → {place_key: [paths]}.

    The dataset as distributed (gsv-cities) is NOT a directory tree of
    places; it is ``root/Dataframes/<City>.csv`` (one row per image) plus
    a flat ``root/Images/<city_id>/`` folder, with each image's filename
    reconstructed from its row fields. This mirrors the reference loader
    exactly (VLAD-BuFF/dataloaders/GSVCitiesDataset.py:57-100,139-176):

    - city ``i`` (>0) offsets its place ids by ``i * 10**5`` so equal ids
      from different cities stay distinct (``__getdataframes`` :78-81);
    - only places with >= ``min_img_per_place`` images survive (:86-90);
    - filename = ``{city_id}_{pl_id:07d}_{year:04d}_{month:02d}_
      {northdeg:03d}_{lat}_{lon}_{panoid}.jpg`` where pl_id is the
      UNPREFIXED id and every other field renders via ``str()`` of the
      value pandas parsed (``get_img_name`` :139-176) — a float-typed
      column (e.g. a re-exported CSV where NaNs made ``year`` float64)
      prints ``2019.0`` in the filename exactly as it does on disk, so
      the fields must NOT be coerced through int()/float() per-row.

    ``cities`` defaults to every CSV under ``Dataframes/`` (sorted —
    deterministic prefixes; the reference hardcodes TRAIN_CITIES and
    order only affects the synthetic prefix, not grouping).
    Returns {zero-filled prefixed place id: [image paths]} ready for
    ``PlacesBatcher``.
    """
    import pandas as pd

    df_dir = os.path.join(root, "Dataframes")
    if cities is None:
        cities = sorted(os.path.splitext(f)[0] for f in os.listdir(df_dir)
                        if f.lower().endswith(".csv"))
    places: Dict[str, List[str]] = {}
    for ci, city in enumerate(cities):
        df = pd.read_csv(os.path.join(df_dir, f"{city}.csv"))
        for row in df.itertuples(index=False):
            pl_id = int(row.place_id)
            pid = pl_id + ci * 10 ** 5
            name = "_".join([
                str(row.city_id),
                str(pl_id % 10 ** 5).zfill(7),
                str(row.year).zfill(4),
                str(row.month).zfill(2),
                str(row.northdeg).zfill(3),
                str(row.lat), str(row.lon),
                str(row.panoid)]) + ".jpg"
            path = os.path.join(root, "Images", str(row.city_id), name)
            places.setdefault(str(pid).zfill(7), []).append(path)
    return {k: v for k, v in places.items()
            if len(v) >= min_img_per_place}


class PlacesBatcher:
    """Yields (images [B, H, W, 3] float32 normalized, labels [B]) with
    B = places_per_batch * img_per_place (GSVCitiesDataloader semantics:
    batch_size places, 4 images each, labels = place index)."""

    def __init__(self, places: Dict[str, List[str]],
                 image_hw: Tuple[int, int] = (224, 224),
                 places_per_batch: int = 16,
                 img_per_place: int = 4,
                 seed: int = 0,
                 loader=None):
        self.place_keys = sorted(places)
        self.places = places
        self.image_hw = image_hw
        self.places_per_batch = places_per_batch
        self.img_per_place = img_per_place
        self.rng = np.random.default_rng(seed)
        self._loader = loader or self._load_image

    def _load_image(self, path: str) -> np.ndarray:
        import cv2
        from revisit_anything_tpu.pipeline.extract import load_image_rgb
        img = load_image_rgb(path)
        return cv2.resize(img, (self.image_hw[1], self.image_hw[0]),
                          interpolation=cv2.INTER_LINEAR)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self.rng.permutation(len(self.place_keys))
        for s in range(0, len(order) - self.places_per_batch + 1,
                       self.places_per_batch):
            sel = order[s:s + self.places_per_batch]
            imgs, labels = [], []
            for li, pi in enumerate(sel):
                paths = self.places[self.place_keys[pi]]
                take = self.rng.choice(len(paths), self.img_per_place,
                                       replace=len(paths) <
                                       self.img_per_place)
                for t in take:
                    imgs.append(self._loader(paths[t]))
                    labels.append(li)
            batch = preprocess(np.stack(imgs), patch_multiple=True)
            yield batch, np.asarray(labels, np.int32)


def prefetch(iterator, depth: int = 2):
    """Thread prefetch: overlaps host image IO/decode with device steps.
    Worker exceptions (e.g. a corrupt image) are re-raised in the
    consumer — without that the consumer would block on the queue
    forever."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
            q.put(sentinel)
        except BaseException as e:           # noqa: BLE001 — re-raised
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
