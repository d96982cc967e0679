"""Golden-value regression tests: core kernels on fixed seeds must keep
producing bit-stable (within float tolerance) outputs across refactors.

The fixture file is committed; regenerate deliberately with
`python tests/test_golden.py regen` after an INTENDED numeric change.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_values.npz")


def compute_values():
    from revisit_anything_tpu.ops.adjacency import delaunay_adjacency
    from revisit_anything_tpu.ops.knn import knn_l2
    from revisit_anything_tpu.ops.masks import (mask_pool_matrices,
                                                pool_masks_to_patch_grid)
    from revisit_anything_tpu.ops.vlad import segment_vlad, soft_global_vlad
    from revisit_anything_tpu.retrieval.matching import get_matches_host

    rng = np.random.default_rng(1234)
    out = {}

    desc = rng.standard_normal((100, 32)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    centers = rng.standard_normal((8, 32)).astype(np.float32)
    masks = rng.random((7, 100)) > 0.7
    cents = rng.random((7, 2)) * 50
    adj = delaunay_adjacency(cents, 3)
    out["adjacency"] = adj
    out["segment_vlad"] = np.asarray(
        segment_vlad(desc, centers, masks, jnp.asarray(adj),
                     num_clusters=8))
    out["soft_vlad"] = np.asarray(soft_global_vlad(desc, centers, 2.0))

    q = rng.standard_normal((9, 16)).astype(np.float32)
    db = rng.standard_normal((200, 16)).astype(np.float32)
    sq, idx = knn_l2(q, db, 11, db_tile=64)
    out["knn_sq"] = np.asarray(sq)
    out["knn_idx"] = np.asarray(idx)

    m = rng.random((4, 30, 40)) > 0.8
    A, B = mask_pool_matrices((30, 40), (56, 56))
    out["pooled"] = np.asarray(pool_masks_to_patch_grid(m, A, B))

    matches = rng.integers(0, 40, (12, 10))
    sims = rng.random((12, 10))
    seg_ranges = [np.arange(0, 6), np.arange(6, 12)]
    im_inds = rng.integers(0, 8, 40)
    preds = get_matches_host(matches, sims, seg_ranges, im_inds, n=4)
    out["borda_preds"] = np.stack(preds)
    return out


def test_golden_values():
    assert os.path.exists(GOLDEN), \
        "golden fixture missing; run `python tests/test_golden.py regen`"
    ref = np.load(GOLDEN)
    got = compute_values()
    assert set(ref.files) == set(got)
    for key in ref.files:
        if ref[key].dtype == bool or np.issubdtype(ref[key].dtype,
                                                   np.integer):
            np.testing.assert_array_equal(got[key], ref[key], err_msg=key)
        else:
            np.testing.assert_allclose(got[key], ref[key], atol=1e-5,
                                       err_msg=key)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        np.savez_compressed(GOLDEN, **compute_values())
        print(f"wrote {GOLDEN}")
