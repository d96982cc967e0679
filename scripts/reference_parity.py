"""Real-artifact parity harness: diff our pipeline against cached
reference artifacts (the 17places_full.zip layout, README.md:69-71).

Runs whatever artifacts are present and reports the rest as skipped:
  1. vocabulary  — c_centers.pt from /root/reference/cache (always
     available here): loads + sanity-checks the real 32x1536 centers and
     runs them through the VLAD kernel. This part runs TODAY.
  2. h5 stages   — {D}_{r,q}_masks_{W}.h5 + {D}_{r,q}_dino_{W}.h5 under
     --artifacts: aggregates segment VLADs with our kernels.
  3. descriptor diff — {D}_segFtVLAD1_domain_{dom}__*.pkl (reference
     torch pickle of db segment VLADs, place_rec_main.py:292-305): max
     abs / cosine diff vs ours.
  4. retrieval diff — fitted PCA pkl + {D}_matches_sims_*.pkl
     (recall_segloc, place_rec_main.py:62-75): our kNN matches + recalls
     vs the reference's.

Usage:
  python scripts/reference_parity.py --dataset 17places \
      [--artifacts /path/to/17places_full] [--order 3] [--domain indoor]

Exit code 0 when every runnable check passes; 1 on any mismatch.
"""

import argparse
import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Under the axon TPU plugin the JAX_PLATFORMS env var is silently
# ignored; apply it programmatically before first JAX use so callers
# (tests/test_reference_artifacts.py runs this harness with
# JAX_PLATFORMS=cpu) never touch the TPU tunnel.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

VOCAB_ROOT = "/root/reference/cache/vocabulary/dinov2_vitg14/l31_value_c32"


def log(msg):
    print(f"[parity] {msg}", flush=True)


def check_vocabulary(domain: str):
    from revisit_anything_tpu.io.vocab import load_cluster_centers
    path = os.path.join(VOCAB_ROOT, domain, "c_centers.pt")
    if not os.path.exists(path):
        log(f"SKIP vocabulary: {path} absent")
        return None
    centers = load_cluster_centers(path)
    assert centers.shape == (32, 1536), centers.shape
    assert np.isfinite(centers).all()
    log(f"OK vocabulary {domain}: {centers.shape}, "
        f"norms [{np.linalg.norm(centers, axis=1).min():.3f}, "
        f"{np.linalg.norm(centers, axis=1).max():.3f}]")

    # real centers through the VLAD kernel on synthetic descriptors
    import jax.numpy as jnp
    from revisit_anything_tpu.ops.vlad import hard_assignment, segment_vlad
    rng = np.random.default_rng(0)
    desc = rng.standard_normal((64, 1536)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    labels = np.asarray(hard_assignment(jnp.asarray(desc),
                                        jnp.asarray(centers)))
    masks = rng.random((4, 64)) < 0.3
    v = np.asarray(segment_vlad(jnp.asarray(desc), jnp.asarray(centers),
                                jnp.asarray(masks), None, num_clusters=32))
    assert v.shape == (4, 49152) and np.isfinite(v).all()
    log(f"OK VLAD kernel on real vocabulary "
        f"(labels use {len(set(labels.tolist()))}/32 clusters)")
    return centers


def check_finetuned_e2e(domain_prefix: str):
    """Drive the REAL NVFinetuned 768-d vocabulary end-to-end through the
    finetuned aggregation + retrieval path (768-d → 24576-d segment VLAD
    → PCA → kNN → Borda) on synthetic planted-signal data — mirroring
    place_rec_main_finetuned.py:145-151 (domain + 'NVFinetuned' vocab),
    :214 (desc_dim 768, vlad 24576), :268 (seg_vlad_gpu_single)."""
    from revisit_anything_tpu.io.vocab import load_cluster_centers
    path = os.path.join(VOCAB_ROOT, domain_prefix + "NVFinetuned",
                        "c_centers.pt")
    if not os.path.exists(path):
        log(f"SKIP finetuned: {path} absent")
        return None
    centers = load_cluster_centers(path)
    assert centers.shape == (32, 768), centers.shape
    assert np.isfinite(centers).all()

    import jax.numpy as jnp
    from revisit_anything_tpu.ops.adjacency import delaunay_adjacency
    from revisit_anything_tpu.ops.vlad import segment_vlad
    from revisit_anything_tpu.ops.knn import knn_l2
    from revisit_anything_tpu.retrieval.matching import get_matches_host
    from revisit_anything_tpu.retrieval.recall import calc_recall

    rng = np.random.default_rng(0)
    n_db, n_seg, p = 10, 5, 128
    def image_bank(feats_list):
        descs, im_inds = [], []
        for i, d in enumerate(feats_list):
            d = d / np.linalg.norm(d, axis=1, keepdims=True)
            masks = rng.random((n_seg, p)) < 0.3
            cents = rng.random((n_seg, 2)) * 100
            adj = delaunay_adjacency(cents.astype(np.float64), 3)
            v = np.asarray(segment_vlad(
                jnp.asarray(d.astype(np.float32)), jnp.asarray(centers),
                jnp.asarray(masks), jnp.asarray(adj), num_clusters=32))
            assert v.shape == (n_seg, 32 * 768)
            descs.append(v)
            im_inds += [i] * n_seg
        return np.concatenate(descs), np.asarray(im_inds)

    db_feats = [rng.standard_normal((p, 768)).astype(np.float32)
                for _ in range(n_db)]
    q_ids = [2, 5, 8]
    q_feats = [db_feats[i]
               + 0.05 * rng.standard_normal((p, 768)).astype(np.float32)
               for i in q_ids]
    db_v, db_i = image_bank(db_feats)
    q_v, q_i = image_bank(q_feats)
    sq, matches = knn_l2(jnp.asarray(q_v), jnp.asarray(db_v), 20)
    sims = 2.0 - np.asarray(sq)
    ranges = [np.flatnonzero(q_i == j) for j in range(len(q_ids))]
    preds = get_matches_host(np.asarray(matches), sims, ranges, db_i, n=5)
    rec = calc_recall(preds, [[i] for i in q_ids], 5)
    ok = rec[0] == 1.0
    log(f"{'OK' if ok else 'FAIL'} finetuned path on real "
        f"{domain_prefix}NVFinetuned centers: 768-d -> 24576-d VLAD -> "
        f"retrieval, planted-signal Recall@1={rec[0]:.2f}")
    return ok


def aggregate_bank(masks_h5, dino_h5, centers, order, mask_hw, desired_hw):
    import h5py
    from revisit_anything_tpu.io.h5io import list_image_keys
    from revisit_anything_tpu.pipeline.aggregate import compute_segment_vlads
    with h5py.File(masks_h5, "r") as f:
        keys = list_image_keys(f)
    return compute_segment_vlads(masks_h5, dino_h5, keys, centers,
                                 order=order, mask_hw=mask_hw,
                                 desired_hw=desired_hw, num_clusters=32,
                                 progress=False), keys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="17places")
    ap.add_argument("--artifacts", default=None,
                    help="extracted 17places_full.zip directory")
    ap.add_argument("--order", type=int, default=3)
    ap.add_argument("--domain", default=None)
    args = ap.parse_args()

    from revisit_anything_tpu.config import get_dataset
    ds = get_dataset(args.dataset)
    domain = args.domain or ds.domain_vlad_cluster
    failures = 0

    # None = cache absent on this machine → SKIP (mismatches raise inside)
    centers = check_vocabulary(domain)

    # the finetuned (SegVLAD-FineT) path on the real NVFinetuned vocab —
    # the only real-weight artifacts available in this environment
    # (None = artifact absent → SKIP, not a failure)
    if check_finetuned_e2e(domain) is False:
        failures += 1

    art = args.artifacts
    if not art or not os.path.isdir(art):
        log("SKIP h5/descriptor/retrieval diffs: --artifacts not provided "
            "(download 17places_full.zip per reference README.md:69-71); "
            "the harness auto-activates once it exists")
        sys.exit(1 if failures else 0)

    def find(pattern):
        hits = glob.glob(os.path.join(art, "**", pattern), recursive=True)
        return hits[0] if hits else None

    masks_r = find(ds.masks_h5_ref)
    dino_r = find(ds.dino_h5_ref)
    masks_q = find(ds.masks_h5_query)
    dino_q = find(ds.dino_h5_query)
    if not (masks_r and dino_r):
        log(f"SKIP aggregation: {ds.masks_h5_ref} / {ds.dino_h5_ref} "
            f"not found under {art}")
        sys.exit(1 if failures else 0)
    if centers is None:
        log("SKIP aggregation/retrieval: vocabulary absent (see above)")
        sys.exit(1 if failures else 0)

    log(f"aggregating db bank from {masks_r}")
    db_bank, db_keys = aggregate_bank(masks_r, dino_r, centers, args.order,
                                      ds.sam_size.hw, ds.size.hw)
    log(f"db: {len(db_bank.descriptors)} segments x "
        f"{db_bank.descriptors.shape[1]}")

    ref_vlad_pkl = find(f"{args.dataset}_segFtVLAD1_domain_{domain}__*")
    if ref_vlad_pkl:
        with open(ref_vlad_pkl, "rb") as f:
            ref_v = pickle.load(f)
        ref_v = np.asarray(getattr(ref_v, "numpy", lambda: ref_v)())
        if ref_v.shape != db_bank.descriptors.shape:
            log(f"FAIL segFtVLAD1 shape {ref_v.shape} vs "
                f"{db_bank.descriptors.shape}")
            failures += 1
        else:
            diff = np.abs(ref_v - db_bank.descriptors).max()
            cos = np.mean(np.sum(ref_v * db_bank.descriptors, axis=1)
                          / (np.linalg.norm(ref_v, axis=1)
                             * np.linalg.norm(db_bank.descriptors, axis=1)
                             + 1e-12))
            ok = diff < 5e-3 or cos > 0.999
            log(f"{'OK' if ok else 'FAIL'} segFtVLAD1 diff: "
                f"max|Δ|={diff:.2e} mean-cos={cos:.6f}")
            failures += 0 if ok else 1
    else:
        log("SKIP segFtVLAD1 diff: reference pickle absent")

    if masks_q and dino_q:
        q_bank, q_keys = aggregate_bank(masks_q, dino_q, centers,
                                        args.order, ds.sam_size.hw,
                                        ds.size.hw)
        from revisit_anything_tpu.datasets import get_gt
        from revisit_anything_tpu.ops.pca import load_sklearn_pca_pickle
        from revisit_anything_tpu.pipeline.evaluate import (
            run_segloc_retrieval)
        pca_pkl = find(f"{args.dataset}_r_fitted_pca_model_*")
        pca = load_sklearn_pca_pickle(pca_pkl) if pca_pkl else None
        try:
            gt = get_gt(args.dataset, args.artifacts,
                        ref_paths=db_keys, query_paths=q_keys)
            if gt is None:
                raise ValueError("no gt for dataset")
        except Exception as e:
            log(f"gt unavailable ({e}); using identity gt")
            gt = [[i] for i in range(len(q_keys))]
        res = run_segloc_retrieval(db_bank, q_bank, gt, pca=pca)
        log(f"recalls: {[round(r, 4) for r in res.recalls]}")

        ref_ms_pkl = find(f"{args.dataset}_matches_sims_domain_{domain}__*")
        if ref_ms_pkl:
            with open(ref_ms_pkl, "rb") as f:
                ref_ms = pickle.load(f)
            ref_matches = np.asarray(ref_ms["matches"])
            overlap = np.mean([
                len(set(a[:50].tolist()) & set(b[:50].tolist())) / 50.0
                for a, b in zip(ref_matches, res.matches)])
            ok = overlap > 0.95
            log(f"{'OK' if ok else 'FAIL'} matches top-50 overlap vs "
                f"reference: {overlap:.4f}")
            failures += 0 if ok else 1
        else:
            log("SKIP matches diff: reference pickle absent")
    else:
        log("SKIP query retrieval: query h5s absent")

    log(f"done, failures={failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
