"""Delaunay order-K adjacency parity vs a torch float64 oracle."""

import numpy as np
import torch
from scipy.spatial import Delaunay

from revisit_anything_tpu.ops.adjacency import delaunay_adjacency


def oracle_adjacency(cords, order):
    """Independent oracle following func_vpr.py:1309-1347 semantics."""
    m = len(cords)
    adj = torch.zeros((m, m))
    if m > 3:
        tri = Delaunay(cords)
        indptr, indices = tri.vertex_neighbor_vertices
        for v in range(m):
            nbrs = indices[indptr[v]:indptr[v + 1]]
            sel = np.unique(np.concatenate(([v], nbrs)))
            adj[v][torch.from_numpy(sel)] = 1
        power = adj.clone()
        for _ in range(order - 1):
            power = power @ adj
        return power.bool().numpy()
    nbr_list = [0, 1] if m > 1 else [0]
    for v in range(m):
        adj[v][torch.tensor(nbr_list)] = 1
    return adj.bool().numpy()


def test_orders_match_oracle(rng):
    cords = rng.random((40, 2)) * 100
    for order in (1, 2, 3, 4):
        ours = delaunay_adjacency(cords, order)
        ref = oracle_adjacency(cords, order)
        np.testing.assert_array_equal(ours, ref)


def test_small_mask_fallbacks():
    for m in (1, 2, 3):
        cords = np.arange(2 * m, dtype=float).reshape(m, 2)
        ours = delaunay_adjacency(cords, 3)
        ref = oracle_adjacency(cords, 3)
        np.testing.assert_array_equal(ours, ref)


def test_self_loops_and_symmetric_growth(rng):
    cords = rng.random((25, 2)) * 50
    a1 = delaunay_adjacency(cords, 1)
    a3 = delaunay_adjacency(cords, 3)
    assert np.all(np.diag(a1))
    # order-3 neighborhood contains order-1
    assert np.all(a3[a1])


def test_collinear_centroids_do_not_crash():
    # Degenerate (collinear) input would raise QhullError in the reference;
    # here it falls back to joggled triangulation.
    cords = np.stack([np.arange(10.0), np.arange(10.0)], axis=1)
    adj = delaunay_adjacency(cords, 2)
    assert adj.shape == (10, 10)
    assert np.all(np.diag(adj))
