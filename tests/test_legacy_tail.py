"""Legacy-tail components: CosPlaceViT extractor (HF ViT oracle), Aerial
dataset layout, cluster-analysis smoke."""

import csv
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from revisit_anything_tpu.models import cosplace_vit as cv


TINY = cv.HfViTConfig(embed_dim=32, depth=2, num_heads=2, patch_size=16,
                      image_size=64, intermediate=64)


@pytest.fixture(scope="module")
def hf_vit():
    from transformers import ViTConfig, ViTModel
    cfg = ViTConfig(hidden_size=TINY.embed_dim,
                    num_hidden_layers=TINY.depth,
                    num_attention_heads=TINY.num_heads,
                    intermediate_size=TINY.intermediate,
                    image_size=TINY.image_size,
                    patch_size=TINY.patch_size)
    torch.manual_seed(0)
    model = ViTModel(cfg, add_pooling_layer=False).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.data.normal_(0, 0.05)
    return model


def test_cosplace_vit_facets_match_hf(hf_vit, rng):
    """extract_features equals hooked HF ViTModel for all four facets
    (CosPlaceViTExtractFeatures semantics, utilities.py:134-288)."""
    params = cv.convert_hf_vit_state_dict(
        {k: v.numpy() for k, v in hf_vit.state_dict().items()}, TINY)
    img = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))

    layer = 1
    hooks = {}
    h1 = hf_vit.encoder.layer[layer].attention.attention.value \
        .register_forward_hook(
            lambda m, i, o: hooks.__setitem__("value", o))
    h2 = hf_vit.encoder.layer[layer].attention.attention.key \
        .register_forward_hook(lambda m, i, o: hooks.__setitem__("key", o))
    h3 = hf_vit.encoder.layer[layer].register_forward_hook(
        lambda m, i, o: hooks.__setitem__(
            "token", o[0] if isinstance(o, tuple) else o))
    with torch.no_grad():
        hf_vit(timg)
    for h in (h1, h2, h3):
        h.remove()

    for facet in ("value", "key", "token"):
        ours = np.asarray(cv.extract_features(
            params, TINY, jnp.asarray(img), layer, facet,
            use_cls=True, norm_descs=False))
        ref = hooks[facet].numpy()
        np.testing.assert_allclose(ours, ref, atol=3e-4, err_msg=facet)

    # cls dropping + norm
    out = np.asarray(cv.extract_features(params, TINY, jnp.asarray(img),
                                         layer, "value", use_cls=False,
                                         norm_descs=True))
    assert out.shape[1] == (64 // 16) ** 2
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_aerial_dataset_layout(tmp_path, rng):
    from revisit_anything_tpu.datasets.aerial import AerialDataset
    root = tmp_path / "gnss_train_rotated"
    (root / "reference_images").mkdir(parents=True)
    (root / "query_images").mkdir()
    for i in range(12):
        (root / "reference_images" / f"img_{i}.png").write_bytes(b"x")
    for i in range(3):
        (root / "query_images" / f"q_{i}.png").write_bytes(b"x")
    with open(root / "gt_matches.csv", "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=["query_ind"] + [
            f"top_{k}_ref_ind" for k in range(1, 6)])
        wr.writeheader()
        for i in range(3):
            wr.writerow({"query_ind": i,
                         **{f"top_{k}_ref_ind": (i + k) % 10
                            for k in range(1, 6)}})

    ds = AerialDataset.from_root(str(tmp_path), "Tartan_GNSS_rotated")
    assert ds.database_num == 12 and ds.queries_num == 3
    assert len(ds.get_image_paths()) == 15
    # natural sort: img_2 before img_10
    names = [os.path.basename(p) for p in ds.db_paths]
    assert names.index("img_2.png") < names.index("img_10.png")
    assert ds.get_positives()[0] == [1, 2, 3, 4, 5]
    with pytest.raises(NotImplementedError):
        AerialDataset.from_root(str(tmp_path), "nope")


def test_cluster_analysis_smoke(rng, tmp_path):
    from revisit_anything_tpu.retrieval.cluster_analysis import (
        cluster_usage, save_tsne_plot, tsne_embed)
    desc = rng.standard_normal((60, 16)).astype(np.float32)
    centers = rng.standard_normal((4, 16)).astype(np.float32)
    pts, sel = tsne_embed(desc, perplexity=5.0)
    assert pts.shape == (60, 2) and np.isfinite(pts).all()
    assert np.array_equal(sel, np.arange(60))
    pts2, sel2 = tsne_embed(desc, perplexity=5.0, max_points=30)
    assert pts2.shape == (30, 2) and sel2.shape == (30,)
    usage = cluster_usage(desc, centers,
                          image_indices=np.repeat(np.arange(3), 20))
    assert usage.shape == (3, 4) and usage.sum() == 60
    out = save_tsne_plot(pts, np.repeat(np.arange(3), 20),
                         str(tmp_path / "tsne.png"))
    assert out is None or os.path.exists(out)


def test_cluster_margin_and_rank_analysis(rng, tmp_path):
    """Quantitative core of the reference's cluster_analysis: triplet
    margins (compute_triplet_margin :295), margin ranking (:301), the
    cross-method rank-difference diagnostic (:305-308) — checked against
    a literal transcription of the reference's list arithmetic — plus
    cosine maps and the HoD histogram writer."""
    from revisit_anything_tpu.retrieval.cluster_analysis import (
        cluster_rank_difference, pairwise_cosine, rank_clusters,
        save_distance_histograms, triplet_margin)

    C, Dc = 8, 12
    q = rng.standard_normal((C, Dc))
    p = q + 0.1 * rng.standard_normal((C, Dc))      # positives close
    n = rng.standard_normal((C, Dc))                # negatives far
    m = triplet_margin(q, p, n)
    assert m.shape == (C,)
    ref = np.linalg.norm(q - n, axis=1) - np.linalg.norm(q - p, axis=1)
    np.testing.assert_allclose(m, ref, rtol=1e-12)
    assert (m > 0).mean() > 0.5                     # mostly discriminative

    ra = rank_clusters(m)
    assert np.array_equal(np.sort(ra), np.arange(C))
    assert m[ra[0]] == m.min() and m[ra[-1]] == m.max()

    rb = rank_clusters(rng.permutation(m))
    shifts, worst = cluster_rank_difference(ra, rb)
    ra_l, rb_l = list(ra), list(rb)
    ref_shifts = [rb_l.index(c) - ra_l.index(c) for c in rb_l]
    assert np.array_equal(shifts, ref_shifts)
    assert worst == rb_l[int(np.argmax(ref_shifts))]
    same, _ = cluster_rank_difference(ra, ra)
    assert np.array_equal(same, np.zeros(C, np.int64))

    cs = pairwise_cosine(q, p)
    assert cs.shape == (C, C)
    assert np.all(cs <= 1.0 + 1e-12) and np.all(cs >= -1.0 - 1e-12)
    # positives correlate strongest on the diagonal
    assert (np.argmax(cs, axis=1) == np.arange(C)).mean() > 0.8
    z = pairwise_cosine(np.zeros((2, 4)), q[:3, :4])
    assert np.all(z == 0.0)                          # zero rows, no NaN

    out = save_distance_histograms(
        np.linalg.norm(q - p, axis=1), np.linalg.norm(q - n, axis=1),
        str(tmp_path / "hod.png"), title="SegVLAD")
    assert out is None or os.path.exists(out)


def test_cluster_overlay_and_panel_renderers(rng, tmp_path):
    """The per-cluster image rendering tail of the reference's
    cluster_analysis (overlay dump :113-146, 2-row diagnostic panel
    :149-247 with visualize_pixel_intensities :284-290, all-cluster GIF
    :250-262) — pure matplotlib, no mpld3."""
    from revisit_anything_tpu.retrieval.cluster_analysis import (
        save_cluster_gif, save_cluster_overlay, save_cluster_panel)

    C, w = 4, 8
    img = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
    sa_nv = rng.random((C, w * w)).astype(np.float32)
    sa_vb = rng.random((C, w * w)).astype(np.float32)
    w_burst = 1.0 + rng.random((w * w,)).astype(np.float32)
    self_dis = rng.random((w * w, 16)).astype(np.float32)

    out = save_cluster_overlay(img, sa_nv, 2, str(tmp_path / "ov.png"))
    assert out is None or (os.path.exists(out)
                           and os.path.getsize(out) > 0)

    out = save_cluster_panel(
        img, {"netvlad": sa_nv, "vlad_buff": sa_vb}, 1,
        str(tmp_path / "panel.png"), w_burst=w_burst, self_dis=self_dis,
        title="q Image ID: 0, Cluster: 1")
    assert out is None or (os.path.exists(out)
                           and os.path.getsize(out) > 0)

    gif = save_cluster_gif(img, {"netvlad": sa_nv}, str(tmp_path),
                           prefix="anim")
    if gif is not None:
        assert os.path.exists(gif) and os.path.getsize(gif) > 0
        # frames are cleaned up like the reference loop
        assert not list(tmp_path.glob("_frame_*.png"))

    # non-square grids must fail loudly, not render garbage
    with pytest.raises(AssertionError):
        save_cluster_overlay(img, rng.random((C, 10)), 0,
                             str(tmp_path / "bad.png"))


def test_interactive_tsne_html(rng, tmp_path):
    """The reference's interactive mpld3 tooltip scatter
    (VLAD-BuFF/cluster_analysis.py:511-601: two method panels,
    query/positive/negative sets in r/g/b, PointHTMLTooltip labels of
    '<img width=300>' with an 'Image not found' fallback :544-547),
    rebuilt dependency-free: every point renders as an SVG circle
    carrying its tooltip HTML; paths stay verbatim (relative-path
    convention :595-601)."""
    from revisit_anything_tpu.retrieval.cluster_analysis import (
        save_interactive_tsne_html)

    img_path = tmp_path / "q0.png"
    img_path.write_bytes(b"\x89PNG\r\n\x1a\nfake")
    q = rng.standard_normal((3, 2))
    p = rng.standard_normal((2, 2))
    n = rng.standard_normal((2, 2))
    panels = [
        ("t-SNE of VLAD Descriptors ours", [
            ("query", "r", q, [str(img_path), "./missing_7.png",
                               "<b>raw &amp; html</b>"]),
            ("positive", "g", p, ["./missing_1.png", "./missing_2.png"]),
            ("negative", "b", n, ["./missing_3.png", "./missing_4.png"]),
        ]),
        ("t-SNE of VLAD Descriptors netvlad", [
            ("query", "r", q, [str(img_path)] * 3),
            ("positive", "g", np.zeros((0, 2)), []),
            ("negative", "b", n, ["./m5.png", "./m6.png"]),
        ]),
    ]
    out = save_interactive_tsne_html(panels, str(tmp_path / "tsne.html"))
    html = open(out).read()
    assert html.count("<svg") == 2
    # 7 + 5 data points, plus one legend dot per group (6)
    assert html.count("<circle") == 12 + 6
    assert html.count('class="rat-pt"') == 12
    # existing image -> reference-style <img width=300> tooltip (escaped
    # into the data attribute); missing -> the reference fallback text
    assert f"&lt;img src=&quot;{img_path}&quot; width=&quot;300&quot;&gt;" in html
    assert "Image not found: ./missing_7.png" in html
    # raw HTML snippets pass through un-wrapped
    assert "&lt;b&gt;raw &amp;amp; html&lt;/b&gt;" in html
    # self-contained: tooltip div + hover wiring present
    assert 'id="rat-tip"' in html and "mouseenter" in html

    # tooltip/point count mismatch fails loudly
    import pytest as _pytest
    with _pytest.raises(ValueError):
        save_interactive_tsne_html(
            [("x", [("query", "r", q, ["only-one"])])],
            str(tmp_path / "bad.html"))
