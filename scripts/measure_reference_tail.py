"""Measure the reference pipeline's retrieval-tail cost with torch-CPU.

bench.py's ``vs_baseline`` denominator (0.45 q/s) was previously ENTIRELY
literature-based (SAM ViT-H AMG ~2 s/image on a V100-class GPU). The
reference's retrieval tail, however, is directly measurable here: its
FAISS search runs on CPU (place_rec_main.py:53-60 — plain IndexFlatL2,
no GPU resources), ``get_matches`` is a pure-Python loop
(func_vpr.py:80-243), and the PCA transform is sklearn on CPU
(func_vpr.py:1419-1443). Only the segment-VLAD matmuls
(``vlad_matmuls_per_cluster``, func_vpr.py:1181-1210, double precision
per :1172) and the mask prep ran on CUDA — those are measured here on
torch-CPU and reported separately as an UPPER bound (a GPU runs them
faster; they are excluded from the denominator restatement).

This re-implements the reference semantics (per-cluster residual matmuls
over an A^order adjacency, Delaunay over mask centroids, sklearn PCA,
L2 top-200, weighted Borda) on synthetic data at the 17places serving
scale: ~50 masks/query, 1530x1536 dense descriptors, 100k db segments
at 1024-d.

Usage: python scripts/measure_reference_tail.py  → one JSON line.
"""

import json
import time

import numpy as np
import torch
import torch.nn.functional as F
from scipy.spatial import Delaunay

torch.set_num_threads(torch.get_num_threads())

NUM_C = 32
DESC_DIM = 1536
PCA_DIM = 1024
N_DB = 100_000
N_MASKS = 50
PATCHES = 34 * 45


def adjacency(cords: np.ndarray, order: int) -> torch.Tensor:
    """Delaunay adjacency + matrix power (nbrMasksAGGFastSingle
    semantics, func_vpr.py:1309-1347)."""
    adj = torch.zeros((len(cords), len(cords)))
    tri = Delaunay(cords)
    indptr, indices = tri.vertex_neighbor_vertices
    for v in range(len(cords)):
        nbrs = np.unique(np.concatenate(
            [[v], indices[indptr[v]:indptr[v + 1]]]))
        adj[v][nbrs] = 1
    p = adj.clone()
    for _ in range(order - 1):
        p = p @ adj
    return p.bool()


def vlad_per_cluster(masks: torch.Tensor, res: torch.Tensor,
                     labels: torch.Tensor, adj: torch.Tensor):
    """Per-cluster masked residual sums (vlad_matmuls_per_cluster
    semantics, func_vpr.py:1181-1210; double precision per :1172)."""
    adj = adj.to(masks.dtype)
    vlads = []
    for c in range(NUM_C):
        inds = torch.where(labels == c)[0]
        agg = adj @ masks[:, inds]
        v = agg.bool().to(masks.dtype) @ res[inds, :]
        vlads.append(F.normalize(v, dim=1))
    out = torch.stack(vlads).permute(1, 0, 2).reshape(masks.shape[0], -1)
    return F.normalize(out, dim=1)


def main():
    rng = np.random.default_rng(0)
    desc = torch.from_numpy(
        rng.standard_normal((PATCHES, DESC_DIM)).astype(np.float64))
    desc = F.normalize(desc, dim=1)
    centers = torch.from_numpy(
        rng.standard_normal((NUM_C, DESC_DIM)).astype(np.float64))
    masks = torch.from_numpy(
        (rng.random((N_MASKS, PATCHES)) < 0.2).astype(np.float64))
    cords = rng.random((N_MASKS, 2)) * 300

    db = rng.standard_normal((N_DB, PCA_DIM)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    db_t = torch.from_numpy(db)
    db_ids = np.repeat(np.arange(N_DB // 50), 50)

    from sklearn.decomposition import PCA
    fit_sample = rng.standard_normal((2048, NUM_C * DESC_DIM)).astype(
        np.float32)
    pca = PCA(n_components=PCA_DIM, whiten=True, svd_solver="randomized")
    pca.fit(fit_sample)

    def once():
        t = {}
        s = time.perf_counter()
        adj = adjacency(cords, 3)
        t["adjacency_ms"] = 1000 * (time.perf_counter() - s)

        s = time.perf_counter()
        labels = torch.argmax(desc @ F.normalize(centers, dim=1).T, dim=1)
        res = desc - centers[labels]
        vlads = vlad_per_cluster(masks, res, labels, adj)
        t["vlad_ms"] = 1000 * (time.perf_counter() - s)

        s = time.perf_counter()
        proj = pca.transform(vlads.numpy().astype(np.float32))
        proj /= np.linalg.norm(proj, axis=1, keepdims=True) + 1e-12
        t["pca_ms"] = 1000 * (time.perf_counter() - s)

        q = torch.from_numpy(proj.astype(np.float32))
        s = time.perf_counter()
        # faiss.IndexFlatL2 equivalent: exact L2 top-200 (faiss is not
        # installed here; a blas matmul + topk is the same work class)
        sims_full = q @ db_t.T
        sq_l2 = (q * q).sum(1, keepdim=True) - 2 * sims_full \
            + (db_t * db_t).sum(1)[None, :]
        d2, idx = torch.topk(-sq_l2, 200, dim=1)
        t["knn_ms"] = 1000 * (time.perf_counter() - s)

        s = time.perf_counter()
        sims = 2.0 + d2.numpy()
        sims_n = (sims - sims.min()) / max(sims.max() - sims.min(), 1e-12)
        scores = {}
        ids = db_ids[idx.numpy()[:, :50]]
        for rank in range(50):
            for i, w in zip(ids[:, rank].tolist(),
                            sims_n[:, rank].tolist()):
                scores[i] = scores.get(i, 0.0) + w
        sorted(scores, key=lambda i: scores[i], reverse=True)[:5]
        t["borda_ms"] = 1000 * (time.perf_counter() - s)
        return t

    once()                                    # warm blas/sklearn
    runs = [once() for _ in range(5)]
    med = {k: float(np.median([r[k] for r in runs])) for k in runs[0]}
    cpu_exact = med["pca_ms"] + med["knn_ms"] + med["borda_ms"]
    gpu_side_cpu_bound = med["adjacency_ms"] + med["vlad_ms"]
    threads = torch.get_num_threads()
    # this sandbox exposes ONE core; the reference's GPU workstation
    # would parallelize the BLAS-bound kNN/PCA — scale by an assumed
    # 16-core box with perfect scaling (conservative: favors the
    # reference; the python Borda loop does not scale and stays as-is)
    assumed_cores = 16
    scaled = ((med["pca_ms"] + med["knn_ms"]) * threads / assumed_cores
              + med["borda_ms"])
    print(json.dumps({
        "per_query_ms": med,
        "cpu_exact_tail_ms_1thread": round(cpu_exact, 2),
        "cpu_exact_tail_ms_16core_est": round(scaled, 2),
        "cuda_side_measured_on_cpu_ms": round(gpu_side_cpu_bound, 2),
        "note": ("cpu_exact components run on CPU in the reference "
                 "itself (faiss-CPU, sklearn, python Borda); the "
                 "cuda_side number is a torch-CPU upper bound of the "
                 "reference's GPU VLAD work"),
        "threads": threads,
    }))


if __name__ == "__main__":
    main()
