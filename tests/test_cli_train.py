"""CLI train subcommand smoke test on a synthetic places directory."""

import os

import numpy as np
from PIL import Image

from revisit_anything_tpu import cli


def test_cli_train_runs_and_checkpoints(tmp_path, rng, capsys, monkeypatch):
    # tiny synthetic GSV-Cities-style layout
    for c in range(1):
        for p in range(4):
            d = tmp_path / "data" / f"city{c}" / f"p{p:03d}"
            d.mkdir(parents=True)
            for i in range(4):
                Image.fromarray(rng.integers(0, 255, (56, 56, 3),
                                             dtype=np.uint8)
                                ).save(d / f"{i}.jpg")

    # shrink the model for the test via the config defaults
    from revisit_anything_tpu.models import dinov2 as dn
    tiny = dn.DinoV2Config(embed_dim=32, depth=2, num_heads=2, ffn="mlp",
                           pretrain_grid=(4, 4))
    monkeypatch.setitem(dn.CONFIGS, "dinov2_vitb14", tiny)

    ckpt_dir = str(tmp_path / "ckpts")
    cli.main(["train", "--train-root", str(tmp_path / "data"),
              "--ckpt-dir", ckpt_dir, "--steps", "2",
              "--batch-places", "2", "--image-size", "56", "56",
              "--num-trainable-blocks", "1", "--clusters", "4",
              "--log-every", "1", "--ckpt-every", "2"])
    out = capsys.readouterr().out
    assert "loss" in out
    assert any(d.startswith("step_") for d in os.listdir(ckpt_dir))

    # resume path
    cli.main(["train", "--train-root", str(tmp_path / "data"),
              "--ckpt-dir", ckpt_dir, "--steps", "3", "--resume",
              "--batch-places", "2", "--image-size", "56", "56",
              "--num-trainable-blocks", "1", "--clusters", "4",
              "--log-every", "1", "--ckpt-every", "10"])
    assert "resumed" in capsys.readouterr().out


def test_cli_train_validation_and_best_ckpt(tmp_path, rng, capsys,
                                            monkeypatch):
    """--val-root: in-training recalls + best-R1 checkpoint retention
    (vpr_model.py:320-371 + train.py:383-392 equivalents)."""
    import json

    for p in range(4):
        d = tmp_path / "data" / "city0" / f"p{p:03d}"
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (56, 56, 3),
                                         dtype=np.uint8)).save(d / f"{i}.jpg")

    # val split: queries are noisy copies of refs → gt = identity
    val = tmp_path / "val"
    (val / "ref").mkdir(parents=True)
    (val / "query").mkdir()
    refs = [rng.integers(0, 255, (56, 56, 3), dtype=np.uint8)
            for _ in range(5)]
    for i, im in enumerate(refs):
        Image.fromarray(im).save(val / "ref" / f"r{i:02d}.png")
    for i in range(3):
        q = np.clip(refs[i].astype(int)
                    + rng.integers(-8, 8, (56, 56, 3)), 0, 255).astype(
                        np.uint8)
        Image.fromarray(q).save(val / "query" / f"q{i:02d}.png")
    np.save(val / "gt.npy",
            np.array([[0], [1], [2]], dtype=object), allow_pickle=True)

    from revisit_anything_tpu.models import dinov2 as dn
    tiny = dn.DinoV2Config(embed_dim=32, depth=2, num_heads=2, ffn="mlp",
                           pretrain_grid=(4, 4))
    monkeypatch.setitem(dn.CONFIGS, "dinov2_vitb14", tiny)

    ckpt_dir = str(tmp_path / "ckpts")
    log = str(tmp_path / "train.jsonl")
    cli.main(["train", "--train-root", str(tmp_path / "data"),
              "--ckpt-dir", ckpt_dir, "--steps", "2",
              "--batch-places", "2", "--image-size", "56", "56",
              "--num-trainable-blocks", "1", "--clusters", "4",
              "--log-every", "1", "--ckpt-every", "2",
              "--val-root", str(val), "--val-every", "1",
              "--log-file", log])
    out = capsys.readouterr().out
    assert "best checkpoint" in out
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))
    assert os.path.exists(os.path.join(ckpt_dir, "best_metric.json"))
    meta = json.load(open(os.path.join(ckpt_dir, "best_metric.json")))
    assert meta["monitor"] == "val/R1"
    # metric rows in the jsonl stream
    rows = [json.loads(l) for l in open(log)]
    assert any("val/R1" in r for r in rows)
