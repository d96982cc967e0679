"""CLI smoke tests: extract → vocab → evaluate through the argparse surface."""

import os

import h5py
import numpy as np
import pytest
from PIL import Image

from revisit_anything_tpu import cli
from revisit_anything_tpu.config import DATASETS, DatasetConfig, ImageSize
from revisit_anything_tpu.io import write_image_masks, MaskRecord


@pytest.fixture
def toy_env(tmp_path, monkeypatch, rng):
    """Override the AmsterTime entry (identity gt works for any image
    count) with a toy-sized config + synthetic images."""
    ds = DatasetConfig(
        name="AmsterTime", size=ImageSize(112, 112),
        data_subpath_ref="new", data_subpath_query="old",
        masks_h5_ref="AmsterTime_new_masks.h5",
        masks_h5_query="AmsterTime_old_masks.h5",
        dino_h5_ref="AmsterTime_r_dino_112.h5",
        dino_h5_query="AmsterTime_q_dino_112.h5",
        map_vlad_cluster="AmsterTime", domain_vlad_cluster="urban",
        sam_at_half_res=False)
    monkeypatch.setitem(DATASETS, "AmsterTime", ds)

    data_root = tmp_path / "data"
    workdir = tmp_path / "workdir"
    cache = tmp_path / "cache"
    workdir.mkdir()

    db_imgs = []
    for sub, n in (("new", 5), ("old", 3)):
        d = data_root / "AmsterTime" / sub
        d.mkdir(parents=True)
        for i in range(n):
            if sub == "new":
                img = rng.integers(0, 255, (112, 112, 3), dtype=np.uint8)
                db_imgs.append(img)
            else:
                img = np.clip(db_imgs[i].astype(int)
                              + rng.integers(-10, 10, (112, 112, 3)),
                              0, 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"im_{i:02d}.png")

    # synthetic masks h5 (skip the SAM stage; schema-level artifacts)
    for name, n in (("AmsterTime_new_masks.h5", 5),
                    ("AmsterTime_old_masks.h5", 3)):
        with h5py.File(workdir / name, "w") as f:
            for i in range(n):
                recs = []
                for _ in range(4):
                    m = np.zeros((112, 112), bool)
                    cy, cx = rng.integers(20, 90, 2)
                    m[cy - 15:cy + 15, cx - 15:cx + 15] = True
                    recs.append(MaskRecord(m, int(m.sum()), (0, 0, 0, 0),
                                           0.9, np.zeros((1, 2)), 0.96,
                                           (0, 0, 112, 112)))
                write_image_masks(f, f"im_{i:02d}.png", recs)

    return {"data_root": str(data_root), "workdir": str(workdir),
            "cache": str(cache)}


def _common(env):
    return ["--dataset", "AmsterTime", "--workdir", env["workdir"],
            "--data-root", env["data_root"]]


def test_cli_extract_dinov1(toy_env):
    """--method DINOV1 (legacy collect_dino_features flow): patched
    ViT-s8 key-facet features land in *_dinoV1_*.h5 — by default
    UPSAMPLED to the dataset resolution like the reference wrapper
    (dino_wrapper.py hard-codes upsample=True);
    --no-dinov1-upsample keeps the strided token grid."""
    env = toy_env
    cli.main(["extract", *_common(env), "--method", "DINOV1",
              "--dinov1-model", "dino_vits8", "--dino-stride", "8"])
    out = os.path.join(env["workdir"], "AmsterTime_r_dinoV1_112.h5")
    assert os.path.exists(out)
    with h5py.File(out, "r") as f:
        keys = list(f.keys())
        assert len(keys) == 5
        arr = f[keys[0]]["ift_dino"][()]
    assert arr.shape == (1, 384, 112, 112)     # dataset-resolution
    assert np.isfinite(arr).all()

    cli.main(["extract", *_common(env), "--method", "DINOV1",
              "--dinov1-model", "dino_vits8", "--dino-stride", "8",
              "--no-dinov1-upsample", "--force"])
    with h5py.File(out, "r") as f:
        arr = f[list(f.keys())[0]]["ift_dino"][()]
    # short side 112→224 (aspect-square), stride 8, patch 8 → 28×28 grid
    assert arr.shape == (1, 384, 28, 28)


def test_cli_extract_vocab_evaluate(toy_env, capsys):
    env = toy_env
    cli.main(["extract", *_common(env), "--method", "DINO",
              "--dino-model", "dinov2_vits14", "--layer", "3"])
    assert os.path.exists(os.path.join(env["workdir"],
                                       "AmsterTime_r_dino_112.h5"))

    cli.main(["vocab", *_common(env), "--clusters", "8",
              "--cache-root", env["cache"], "--domain", "urban"])
    vocab_path = os.path.join(env["cache"], "vocabulary", "dinov2_vitg14",
                              "l31_value_c32", "urban", "c_centers.pt")
    assert os.path.exists(vocab_path)

    cli.main(["evaluate", *_common(env), "--experiment",
              "exp7_global_SegLoc_VLAD_o3", "--vocab-vlad", "domain",
              "--cache-root", env["cache"], "--save-results"])
    out = capsys.readouterr().out
    assert "Recall@1..5" in out
    results = os.path.join(env["workdir"], "results", "global",
                           "exp7_global_SegLoc_VLAD_o3_AmsterTime")
    assert os.path.exists(os.path.join(results, "recalls.json"))

    # identity-gt toy retrieval with noisy-copy queries should be perfect
    import json
    with open(os.path.join(results, "recalls.json")) as f:
        recalls = json.load(f)["recalls"]
    assert recalls[0] >= 0.5, recalls


def test_cli_anyloc_branch(toy_env, capsys):
    env = toy_env
    cli.main(["extract", *_common(env), "--method", "DINO",
              "--dino-model", "dinov2_vits14", "--layer", "3"])
    cli.main(["vocab", *_common(env), "--clusters", "8",
              "--cache-root", env["cache"], "--domain", "urban"])
    cli.main(["evaluate", *_common(env), "--experiment",
              "exp1_global_Anyloc", "--vocab-vlad", "domain",
              "--cache-root", env["cache"]])
    assert "Recall@1..5" in capsys.readouterr().out


def test_cli_unknown_dataset():
    with pytest.raises(KeyError):
        cli.main(["extract", "--dataset", "nope", "--method", "DINO"])


def test_cli_pca_then_pca_evaluate(toy_env, capsys):
    env = toy_env
    cli.main(["extract", *_common(env), "--method", "DINO",
              "--dino-model", "dinov2_vits14", "--layer", "3"])
    cli.main(["vocab", *_common(env), "--clusters", "8",
              "--cache-root", env["cache"], "--domain", "urban"])
    cli.main(["pca", *_common(env), "--experiment",
              "exp0_global_SegLoc_VLAD_PCA_o3", "--vocab-vlad", "domain",
              "--cache-root", env["cache"], "--dim", "16"])
    out = capsys.readouterr().out
    assert "wrote" in out
    cli.main(["evaluate", *_common(env), "--experiment",
              "exp0_global_SegLoc_VLAD_PCA_o3", "--vocab-vlad", "domain",
              "--cache-root", env["cache"]])
    assert "Recall@1..5" in capsys.readouterr().out


def test_cli_extract_skips_existing(toy_env, capsys):
    env = toy_env
    args = ["extract", *_common(env), "--method", "DINO",
            "--dino-model", "dinov2_vits14", "--layer", "3"]
    cli.main(args)
    capsys.readouterr()
    cli.main(args)
    assert "skipping" in capsys.readouterr().out


def test_cli_save_descriptors(toy_env, capsys):
    env = toy_env
    cli.main(["extract", *_common(env), "--method", "DINO",
              "--dino-model", "dinov2_vits14", "--layer", "3"])
    cli.main(["vocab", *_common(env), "--clusters", "8",
              "--cache-root", env["cache"], "--domain", "urban"])
    cli.main(["evaluate", *_common(env), "--experiment",
              "exp7_global_SegLoc_VLAD_o3", "--vocab-vlad", "domain",
              "--cache-root", env["cache"], "--save-results",
              "--save-descriptors"])
    import pickle
    results = os.path.join(env["workdir"], "results", "global",
                           "exp7_global_SegLoc_VLAD_o3_AmsterTime")
    with open(os.path.join(results, "results.pkl"), "rb") as f:
        payload = pickle.load(f)
    assert "segFtVLAD1" in payload and "imInds2" in payload
    assert payload["segFtVLAD1"].shape[1] == 8 * 384


def test_cli_evaluate_global(toy_env, capsys, monkeypatch, rng, tmp_path):
    import torch
    from revisit_anything_tpu.models import dinov2 as dn
    from tests.test_vladbuff import synth_hub_state_dict
    tiny = dn.DinoV2Config(embed_dim=32, depth=2, num_heads=2, ffn="mlp",
                           pretrain_grid=(4, 4))
    monkeypatch.setattr(dn, "VIT_B14", tiny)

    sd = {f"backbone.model.{k}": v
          for k, v in synth_hub_state_dict(tiny, rng).items()}
    C, D = 4, tiny.embed_dim
    sd["aggregator.conv.weight"] = torch.from_numpy(
        rng.standard_normal((C, D, 1, 1)).astype(np.float32))
    sd["aggregator.centroids"] = torch.from_numpy(
        rng.standard_normal((C, D)).astype(np.float32))
    ckpt = str(tmp_path / "vb.ckpt")
    torch.save({"state_dict": sd}, ckpt)

    env = toy_env
    cli.main(["evaluate-global", *_common(env), "--checkpoint", ckpt,
              "--model", "vladbuff", "--batch-size", "4"])
    out = capsys.readouterr().out
    assert "R@1" in out


def test_cli_build_index_and_query(toy_env, capsys, monkeypatch, tmp_path):
    env = toy_env
    cli.main(["extract", *_common(env), "--method", "DINO",
              "--dino-model", "dinov2_vits14", "--layer", "3"])
    cli.main(["vocab", *_common(env), "--clusters", "8",
              "--cache-root", env["cache"], "--domain", "urban"])
    cli.main(["pca", *_common(env), "--experiment",
              "exp0_global_SegLoc_VLAD_PCA_o3", "--vocab-vlad", "domain",
              "--cache-root", env["cache"], "--dim", "16"])
    index = str(tmp_path / "index.npz")
    cli.main(["build-index", *_common(env), "--experiment",
              "exp0_global_SegLoc_VLAD_PCA_o3", "--vocab-vlad", "domain",
              "--cache-root", env["cache"], "--output", index])
    assert os.path.exists(index)
    capsys.readouterr()

    # query with a tiny SAM + the same tiny DINO config
    from revisit_anything_tpu.config import DATASETS
    from revisit_anything_tpu.models.sam import SAM_REGISTRY, SamArchConfig
    small_sam = SamArchConfig(encoder_dim=64, encoder_depth=2,
                              encoder_heads=4, global_attn_indexes=(1,),
                              image_size=128, patch_size=16, window_size=4,
                              prompt_dim=32, decoder_heads=4,
                              decoder_mlp_dim=128, iou_head_hidden=32)
    monkeypatch.setitem(SAM_REGISTRY, "vit_b", small_sam)
    q_img = os.path.join(env["data_root"], "AmsterTime", "old",
                         "im_00.png")
    import json
    # permissive AMG thresholds: a random-weight SAM under the
    # production 0.88/0.95 filters keeps zero masks, which now yields an
    # honest EMPTY result (the old code fabricated ids for the
    # zero-segment query)
    cli.main(["query", "--index", index, "--image", q_img,
              "--sam-variant", "vit_b", "--dino-model", "dinov2_vits14",
              "--layer", "3", "--topk", "3",
              "--points-per-side", "6", "--points-per-batch", "36",
              "--pred-iou-thresh=-1e9",
              "--stability-score-thresh", "0.0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 1 <= len(out["matches"]) <= 3
    assert len(out["matches"]) == len(out["image_ids"])
    assert all(m.endswith(".png") for m in out["matches"])
    assert all(0 <= i < 5 for i in out["image_ids"])


def test_cli_build_index_then_query(toy_env, capsys, monkeypatch, rng):
    """build-index → query through the serving pipeline (cmd_query drives
    SegVLADServer end-to-end on a tiny SAM/DINO)."""
    import json

    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.models.sam import SAM_REGISTRY, SamArchConfig

    tiny_dino = dn.DinoV2Config(embed_dim=32, depth=2, num_heads=2,
                                ffn="mlp", pretrain_grid=(8, 8))
    monkeypatch.setitem(dn.CONFIGS, "dinov2_vitg14", tiny_dino)
    tiny_sam = SamArchConfig(encoder_dim=32, encoder_depth=2,
                             encoder_heads=2, global_attn_indexes=(1,),
                             image_size=128, patch_size=16, window_size=4,
                             prompt_dim=32, decoder_heads=4,
                             decoder_mlp_dim=64, iou_head_hidden=16)
    monkeypatch.setitem(SAM_REGISTRY, "vit_h", tiny_sam)

    env = toy_env
    cli.main(["extract", *_common(env), "--method", "DINO",
              "--dino-model", "dinov2_vitg14", "--layer", "1"])
    cli.main(["vocab", *_common(env), "--clusters", "8",
              "--cache-root", env["cache"], "--domain", "urban"])
    cli.main(["pca", *_common(env), "--experiment",
              "exp0_global_SegLoc_VLAD_PCA_o3", "--vocab-vlad", "domain",
              "--cache-root", env["cache"], "--dim", "8"])
    index_path = os.path.join(env["workdir"], "index.npz")
    cli.main(["build-index", *_common(env),
              "--experiment", "exp0_global_SegLoc_VLAD_PCA_o3",
              "--vocab-vlad", "domain", "--cache-root", env["cache"],
              "--output", index_path])
    capsys.readouterr()

    q_img = os.path.join(env["data_root"], "AmsterTime", "old",
                         "im_00.png")
    cli.main(["query", "--index", index_path, "--image", q_img,
              "--topk", "3", "--layer", "1",
              "--points-per-side", "6", "--points-per-batch", "36",
              "--pred-iou-thresh=-1e9",
              "--stability-score-thresh", "0.0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["query"] == q_img
    # unfilled ranks (-1: the query matched fewer distinct db images
    # than --topk) are filtered from the CLI output
    assert 1 <= len(out["image_ids"]) <= 3
    assert all(0 <= i < 5 for i in out["image_ids"])
    assert len(out["matches"]) == len(out["image_ids"])


def test_cli_evaluate_global_benchmark(tmp_path, capsys, monkeypatch, rng):
    """evaluate-global --benchmark: npy-listed image sets + UTM gt
    (the VLAD-BuFF eval.py benchmark path)."""
    import torch

    from revisit_anything_tpu.models import dinov2 as dn
    from tests.test_vladbuff import TINY, synth_hub_state_dict

    monkeypatch.setattr(dn, "VIT_B14", TINY)

    # synthetic st_lucia-layout npys + images
    gt_root = tmp_path / "gt"
    (gt_root / "st_lucia").mkdir(parents=True)
    data_root = tmp_path / "imgs"
    (data_root / "db").mkdir(parents=True)
    (data_root / "q").mkdir()
    db_names, q_names = [], []
    for i in range(6):
        n = f"db/@{100 + i}@200@r{i}.png"
        Image.fromarray(rng.integers(0, 255, (56, 56, 3),
                                     dtype=np.uint8)).save(data_root / n)
        db_names.append(n)
    for i in range(2):
        n = f"q/@{100 + i}@200@q{i}.png"
        Image.fromarray(rng.integers(0, 255, (56, 56, 3),
                                     dtype=np.uint8)).save(data_root / n)
        q_names.append(n)
    np.save(gt_root / "st_lucia" / "st_lucia_dbImages.npy",
            np.array(db_names))
    np.save(gt_root / "st_lucia" / "st_lucia_qImages.npy",
            np.array(q_names))

    # synthetic VLAD-BuFF checkpoint
    sd = {f"backbone.model.{k}": v
          for k, v in synth_hub_state_dict(TINY, rng).items()}
    C, D = 4, TINY.embed_dim
    sd["aggregator.conv.weight"] = torch.from_numpy(
        rng.standard_normal((C, D, 1, 1)).astype(np.float32))
    sd["aggregator.centroids"] = torch.from_numpy(
        rng.standard_normal((C, D)).astype(np.float32))
    ckpt = str(tmp_path / "vb.ckpt")
    torch.save({"state_dict": sd}, ckpt)

    cli.main(["evaluate-global", "--benchmark", "st_lucia",
              "--gt-root", str(gt_root), "--data-root", str(data_root),
              "--checkpoint", ckpt, "--model", "vladbuff",
              "--image-size", "56", "56", "--batch-size", "4"])
    out = capsys.readouterr().out
    assert "st_lucia" in out and "R@1" in out


def test_cli_amg_standalone(tmp_path, capsys, monkeypatch, rng):
    """amg subcommand (sam/scripts/amg.py equivalent): mask PNGs +
    metadata.csv per image."""
    from revisit_anything_tpu.models.sam import SAM_REGISTRY, SamArchConfig
    tiny = SamArchConfig(encoder_dim=32, encoder_depth=2, encoder_heads=2,
                         global_attn_indexes=(1,), image_size=128,
                         patch_size=16, window_size=4, prompt_dim=32,
                         decoder_heads=4, decoder_mlp_dim=64,
                         iou_head_hidden=16)
    monkeypatch.setitem(SAM_REGISTRY, "vit_h", tiny)
    src = tmp_path / "in"
    src.mkdir()
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (60, 100, 3),
                                     dtype=np.uint8)).save(src / f"i{i}.png")
    out = str(tmp_path / "out")
    cli.main(["amg", "--input", str(src), "--output", out,
              "--points-per-side", "6", "--points-per-batch", "36",
              "--pred-iou-thresh", "-1000000", "--stability-score-thresh",
              "0"])
    for i in range(2):
        d = os.path.join(out, f"i{i}")
        files = os.listdir(d)
        assert "metadata.csv" in files
        n_masks = len([f for f in files if f.endswith(".png")])
        assert n_masks >= 1
        lines = open(os.path.join(d, "metadata.csv")).read().splitlines()
        assert lines[0].startswith("id,area,bbox_x0")
        assert len(lines) == n_masks + 1


def test_cli_serve_loop(toy_env, capsys, monkeypatch, rng, tmp_path):
    """The persistent `serve` command: query / add / remove / snapshot /
    quit over a command stream against a live incremental server."""
    import io
    import json

    from revisit_anything_tpu.models import dinov2 as dn
    from revisit_anything_tpu.models.sam import SAM_REGISTRY, SamArchConfig

    tiny_dino = dn.DinoV2Config(embed_dim=32, depth=2, num_heads=2,
                                ffn="mlp", pretrain_grid=(8, 8))
    monkeypatch.setitem(dn.CONFIGS, "dinov2_vitg14", tiny_dino)
    tiny_sam = SamArchConfig(encoder_dim=32, encoder_depth=2,
                             encoder_heads=2, global_attn_indexes=(1,),
                             image_size=128, patch_size=16, window_size=4,
                             prompt_dim=32, decoder_heads=4,
                             decoder_mlp_dim=64, iou_head_hidden=16)
    monkeypatch.setitem(SAM_REGISTRY, "vit_h", tiny_sam)

    env = toy_env
    cli.main(["extract", *_common(env), "--method", "DINO",
              "--dino-model", "dinov2_vitg14", "--layer", "1"])
    cli.main(["vocab", *_common(env), "--clusters", "8",
              "--cache-root", env["cache"], "--domain", "urban"])
    cli.main(["pca", *_common(env), "--experiment",
              "exp0_global_SegLoc_VLAD_PCA_o3", "--vocab-vlad", "domain",
              "--cache-root", env["cache"], "--dim", "8"])
    index_path = os.path.join(env["workdir"], "index.npz")
    cli.main(["build-index", *_common(env),
              "--experiment", "exp0_global_SegLoc_VLAD_PCA_o3",
              "--vocab-vlad", "domain", "--cache-root", env["cache"],
              "--output", index_path])
    capsys.readouterr()

    q0 = os.path.join(env["data_root"], "AmsterTime", "old", "im_00.png")
    q1 = os.path.join(env["data_root"], "AmsterTime", "old", "im_01.png")
    snap = str(tmp_path / "live.npz")
    script = "\n".join([
        f"query {q0}",
        f"add {q1}",
        f"query {q1}",
        "remove 5",
        f"snapshot {snap}",
        "bogus cmd",
        "query /nonexistent.png",
        "quit",
    ]) + "\n"
    monkeypatch.setattr("sys.stdin", io.StringIO(script))
    cli.main(["serve", "--index", index_path, "--layer", "1",
              "--topk", "3", "--db-capacity", "400",
              "--points-per-side", "6", "--points-per-batch", "36",
              "--pred-iou-thresh=-1e9",
              "--stability-score-thresh", "0.0"])
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["ready"] is True and lines[0]["images"] == 5
    assert lines[1]["query"] == q0 and len(lines[1]["image_ids"]) >= 1
    assert lines[2] == {"added": q1, "image_id": 5}
    # the post-add query answers against the live index (retrieval
    # QUALITY of incremental adds is covered by test_serve with planted
    # signal; random tiny weights cannot guarantee self-retrieval here)
    assert lines[3]["query"] == q1 and len(lines[3]["image_ids"]) >= 1
    assert all(0 <= i <= 5 for i in lines[3]["image_ids"])
    assert lines[4] == {"removed": 5}
    assert lines[5] == {"snapshot": snap}
    assert "error" in lines[6]            # unknown command reported
    assert "error" in lines[7]            # bad path reported, loop alive
    # the snapshot recorded the live add (image id 5 = 6 images)
    assert os.path.exists(snap)
    z = np.load(snap)
    assert int(z["num_ref_images"]) == 6
