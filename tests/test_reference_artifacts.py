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
