"""Tests against REAL reference artifacts (the vocabulary cache shipped at
/root/reference/cache) — validates interop with actual upstream files, not
just synthetic fixtures. Skipped when the reference mount is absent."""

import os

import numpy as np
import pytest

REF_VOCAB_ROOT = "/root/reference/cache/vocabulary/dinov2_vitg14/l31_value_c32"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_VOCAB_ROOT),
    reason="reference cache not mounted")


def test_load_real_cluster_centers():
    from revisit_anything_tpu.config import DINO_G_DIM, NUM_CLUSTERS
    from revisit_anything_tpu.io.vocab import load_cluster_centers
    path = os.path.join(REF_VOCAB_ROOT, "17places", "c_centers.pt")
    centers = load_cluster_centers(path)
    assert centers.shape == (NUM_CLUSTERS, DINO_G_DIM)
    assert centers.dtype == np.float32
    assert np.isfinite(centers).all()
    # kmeans centers over L2-normalized descriptors: near-unit norms
    norms = np.linalg.norm(centers, axis=1)
    assert 0.2 < norms.min() and norms.max() < 1.5


def test_all_domain_vocabularies_load():
    from revisit_anything_tpu.io.vocab import load_cluster_centers
    count = 0
    for domain in sorted(os.listdir(REF_VOCAB_ROOT)):
        path = os.path.join(REF_VOCAB_ROOT, domain, "c_centers.pt")
        if not os.path.exists(path):
            continue
        centers = load_cluster_centers(path)
        assert centers.ndim == 2 and centers.shape[0] == 32
        count += 1
    assert count >= 5


def test_real_vocab_drives_segment_vlad(rng):
    """Real 17places centers through the VLAD kernel: hard assignment uses
    all/most clusters on random unit descriptors, output unit-norm."""
    import jax.numpy as jnp
    from revisit_anything_tpu.io.vocab import load_cluster_centers
    from revisit_anything_tpu.ops.vlad import hard_assignment, segment_vlad
    centers = load_cluster_centers(
        os.path.join(REF_VOCAB_ROOT, "17places", "c_centers.pt"))
    desc = rng.standard_normal((400, 1536)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    labels = np.asarray(hard_assignment(jnp.asarray(desc),
                                        jnp.asarray(centers)))
    assert len(np.unique(labels)) > 8   # vocabulary is non-degenerate
    masks = rng.random((6, 400)) > 0.7
    v = np.asarray(segment_vlad(jnp.asarray(desc), jnp.asarray(centers),
                                jnp.asarray(masks)))
    assert v.shape == (6, 32 * 1536)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-4)


def test_nvfinetuned_vocab_e2e_retrieval(rng):
    """The REAL 768-d NVFinetuned vocabulary (the finetuned SegVLAD-FineT
    path, place_rec_main_finetuned.py:145-151,214,268) drives the full
    768-d → 24576-d aggregation + retrieval: planted-signal Recall@1 must
    be perfect."""
    import jax.numpy as jnp
    from revisit_anything_tpu.io.vocab import load_cluster_centers
    from revisit_anything_tpu.ops.adjacency import delaunay_adjacency
    from revisit_anything_tpu.ops.knn import knn_l2
    from revisit_anything_tpu.ops.vlad import segment_vlad
    from revisit_anything_tpu.retrieval.matching import get_matches_host
    from revisit_anything_tpu.retrieval.recall import calc_recall

    centers = load_cluster_centers(os.path.join(
        REF_VOCAB_ROOT, "17placesNVFinetuned", "c_centers.pt"))
    assert centers.shape == (32, 768)

    n_db, n_seg, p = 8, 5, 128
    masks_fixed = rng.random((n_db, n_seg, p)) < 0.3
    cents_fixed = rng.random((n_db, n_seg, 2)) * 100

    def bank(feats_list, which):
        descs, im_inds = [], []
        for i, d in enumerate(feats_list):
            d = d / np.linalg.norm(d, axis=1, keepdims=True)
            adj = delaunay_adjacency(
                cents_fixed[which[i]].astype(np.float64), 3)
            v = np.asarray(segment_vlad(
                jnp.asarray(d.astype(np.float32)), jnp.asarray(centers),
                jnp.asarray(masks_fixed[which[i]]), jnp.asarray(adj),
                num_clusters=32))
            assert v.shape == (n_seg, 32 * 768)
            descs.append(v)
            im_inds += [i] * n_seg
        return np.concatenate(descs), np.asarray(im_inds)

    db_feats = [rng.standard_normal((p, 768)).astype(np.float32)
                for _ in range(n_db)]
    q_ids = [1, 4, 6]
    q_feats = [db_feats[i]
               + 0.05 * rng.standard_normal((p, 768)).astype(np.float32)
               for i in q_ids]
    db_v, db_i = bank(db_feats, list(range(n_db)))
    q_v, q_i = bank(q_feats, q_ids)
    sq, matches = knn_l2(jnp.asarray(q_v), jnp.asarray(db_v), 20)
    sims = 2.0 - np.asarray(sq)
    ranges = [np.flatnonzero(q_i == j) for j in range(len(q_ids))]
    preds = get_matches_host(np.asarray(matches), sims, ranges, db_i, n=5)
    rec = calc_recall(preds, [[i] for i in q_ids], 5)
    assert rec[0] == 1.0, rec


def test_all_nvfinetuned_vocabularies_are_768d():
    """Every cached *NVFinetuned vocabulary is a 32x768 finetuned-path
    vocabulary (not just shape-checked against one)."""
    from revisit_anything_tpu.io.vocab import load_cluster_centers
    count = 0
    for domain in sorted(os.listdir(REF_VOCAB_ROOT)):
        if not domain.endswith("NVFinetuned"):
            continue
        path = os.path.join(REF_VOCAB_ROOT, domain, "c_centers.pt")
        if not os.path.exists(path):
            continue
        centers = load_cluster_centers(path)
        assert centers.shape == (32, 768), (domain, centers.shape)
        assert np.isfinite(centers).all(), domain
        count += 1
    assert count >= 5


def test_parity_harness_full_path(tmp_path, rng):
    """Drive scripts/reference_parity.py end-to-end on synthetic artifacts
    in the exact reference layout (h5 names from config, segFtVLAD1 +
    matches_sims pickles) so the harness is proven to auto-activate when
    17places_full.zip appears."""
    import pickle
    import subprocess
    import sys

    import h5py

    from revisit_anything_tpu.config import get_dataset
    from revisit_anything_tpu.io.h5io import (MaskRecord, write_dino_features,
                                              write_image_masks)
    from revisit_anything_tpu.io.vocab import load_cluster_centers
    from revisit_anything_tpu.pipeline.aggregate import compute_segment_vlads

    ds = get_dataset("17places")
    mh, mw = ds.sam_size.hw
    dh, dw = ds.size.patch_grid
    art = tmp_path / "artifacts"
    art.mkdir()

    def blob(k):
        out = np.zeros((k, mh, mw), bool)
        for i in range(k):
            cy, cx = rng.integers(30, mh - 30), rng.integers(30, mw - 30)
            yy, xx = np.ogrid[:mh, :mw]
            out[i] = (yy - cy) ** 2 + (xx - cx) ** 2 < rng.integers(
                15, 40) ** 2
        return out

    names = {}
    for tag, mask_name, dino_name in (
            ("r", ds.masks_h5_ref, ds.dino_h5_ref),
            ("q", ds.masks_h5_query, ds.dino_h5_query)):
        keys = [f"{tag}_{i:03d}.jpg" for i in range(2)]
        names[tag] = keys
        with h5py.File(art / mask_name, "w") as fm, \
                h5py.File(art / dino_name, "w") as fd:
            for k in keys:
                masks = blob(int(rng.integers(3, 6)))
                write_image_masks(fm, k, [
                    MaskRecord(s, int(s.sum()), (0, 0, 0, 0), 0.9,
                               np.zeros((1, 2)), 0.95, (0, 0, mw, mh))
                    for s in masks])
                feats = rng.standard_normal(
                    (1, 1536, dh, dw)).astype(np.float32)
                write_dino_features(fd, k, feats)

    # "reference" pickles produced by our own pipeline (self-consistency
    # of the diff machinery; with real pickles the same code paths run)
    centers = load_cluster_centers(os.path.join(
        REF_VOCAB_ROOT, ds.domain_vlad_cluster, "c_centers.pt"))
    db_bank = compute_segment_vlads(
        str(art / ds.masks_h5_ref), str(art / ds.dino_h5_ref), names["r"],
        centers, order=3, mask_hw=(mh, mw), desired_hw=ds.size.hw,
        num_clusters=32, progress=False)
    with open(art / "17places_segFtVLAD1_domain_indoor__order3.pkl",
              "wb") as f:
        pickle.dump(db_bank.descriptors, f)

    proc = subprocess.run(
        [sys.executable, "scripts/reference_parity.py",
         "--dataset", "17places", "--artifacts", str(art)],
        capture_output=True, text=True, cwd="/root/repo", timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    out = proc.stdout
    assert "OK vocabulary" in out, out
    assert "OK segFtVLAD1 diff" in out, out
    assert "recalls:" in out, out
    assert proc.returncode == 0, out + proc.stderr[-2000:]
