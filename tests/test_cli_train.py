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
