"""Checkpoint/resume round-trip for the training state."""

import jax
import numpy as np

from revisit_anything_tpu.models import dinov2 as dn
from revisit_anything_tpu.training import VPRTrainConfig, create_train_state
from revisit_anything_tpu.training.checkpoint import (
    latest_checkpoint, restore_train_state, save_train_state)

TINY = VPRTrainConfig(
    backbone=dn.DinoV2Config(embed_dim=16, depth=2, num_heads=2, ffn="mlp",
                             pretrain_grid=(4, 4)),
    num_trainable_blocks=1, clusters=4, total_steps=10, warmup_steps=2)


def test_save_restore_roundtrip(tmp_path):
    state = create_train_state(TINY, jax.random.PRNGKey(0))
    path = save_train_state(str(tmp_path), state.params, state.opt_state, 7)
    assert latest_checkpoint(str(tmp_path)) == path

    p2, o2, step = restore_train_state(path, state.params, state.opt_state)
    assert step == 7
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_picks_max_step(tmp_path):
    state = create_train_state(TINY, jax.random.PRNGKey(0))
    save_train_state(str(tmp_path), state.params, state.opt_state, 3)
    p = save_train_state(str(tmp_path), state.params, state.opt_state, 12)
    assert latest_checkpoint(str(tmp_path)) == p


def test_latest_none_when_empty(tmp_path):
    assert latest_checkpoint(str(tmp_path / "nope")) is None
