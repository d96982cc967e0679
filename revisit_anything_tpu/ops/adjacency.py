"""SuperSegment adjacency: Delaunay graph over mask centroids, order-K power.

Host-side (tiny input: tens to a few hundred centroids per image), mirroring
``nbrMasksAGGFastSingle`` (func_vpr.py:1309-1347): Delaunay triangulation
with self-loops, A^order computed as float matmuls then thresholded to bool.
Qhull stays on the host for bit-compatible adjacency; the resulting dense
bool matrix feeds the TPU VLAD kernel.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import Delaunay, QhullError


def _delaunay_neighbors(tri: Delaunay, v: int) -> np.ndarray:
    indptr, indices = tri.vertex_neighbor_vertices
    return indices[indptr[v]:indptr[v + 1]]


def delaunay_adjacency(centroids: np.ndarray, order: int = 1) -> np.ndarray:
    """Order-K boolean adjacency of the Delaunay graph with self-loops.

    Args:
      centroids: [M, 2] float (x, y) mask centroids.
      order: K-hop neighborhood; A^K computed in float, bool-thresholded.

    Returns:
      bool [M, M]. For M <= 3 (or degenerate triangulations) the reference
      fallback applies: every row connects to masks [0, 1] (just [0] when
      M == 1) — func_vpr.py:1340-1345.
    """
    m = len(centroids)
    adj = np.zeros((m, m), dtype=np.float32)

    tri = None
    if m > 3:
        try:
            tri = Delaunay(centroids)
        except QhullError:
            # Degenerate (e.g. collinear) centroid sets: joggle the input,
            # as qhull's standard remedy, rather than crashing the pipeline.
            try:
                tri = Delaunay(centroids, qhull_options="QJ")
            except QhullError:
                tri = None

    if tri is not None:
        for v in range(m):
            nbrs = np.unique(np.concatenate(([v], _delaunay_neighbors(tri, v))))
            adj[v, nbrs] = 1.0
        power = adj.copy()
        for _ in range(order - 1):
            power = power @ adj
        return power.astype(bool)

    nbr_list = [0, 1] if m > 1 else [0]
    adj[:, nbr_list] = 1.0
    return adj.astype(bool)
