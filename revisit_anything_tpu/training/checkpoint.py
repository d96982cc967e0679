"""Training checkpoint / resume (orbax) + torch-interop export.

The reference's checkpointing is Lightning ModelCheckpoint
(VLAD-BuFF/train.py:383-392) + stage artifacts as resume points (SURVEY
§5.4). Here training state (params/opt_state/step) persists via orbax;
pipeline artifacts (h5/npz/pt) remain the stage-level resume mechanism.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np


def save_train_state(ckpt_dir: str, params: Any, opt_state: Any,
                     step: int) -> str:
    """Save a training checkpoint; returns the checkpoint path."""
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    path = os.path.join(ckpt_dir, f"step_{int(step):08d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"params": params, "opt_state": opt_state,
                          "step": np.asarray(int(step))})
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    # exclude orbax's atomic-save temp dirs (step_X.orbax-checkpoint-tmp-*):
    # a crash mid-save must not make --resume pick the incomplete one
    steps = [d for d in os.listdir(ckpt_dir)
             if d.startswith("step_") and "orbax-checkpoint-tmp" not in d]
    if not steps:
        return None
    return os.path.join(ckpt_dir, sorted(steps)[-1])


def save_best_state(ckpt_dir: str, params: Any, opt_state: Any, step: int,
                    metric: float, monitor: str) -> Optional[str]:
    """Metric-monitored best-checkpoint retention (mode=max), the
    ModelCheckpoint(monitor='pitts30k_val/R1') equivalent
    (VLAD-BuFF/train.py:383-392). Writes <ckpt_dir>/best when ``metric``
    improves on the value recorded in best_metric.json; returns the path
    when saved, None otherwise."""
    import json
    import shutil

    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    meta_path = os.path.join(ckpt_dir, "best_metric.json")
    prev = -float("inf")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)["metric"]
    if metric <= prev:
        return None
    # save to a staging name, then swap: a crash mid-save must never
    # leave the directory without the previous best
    path = os.path.join(ckpt_dir, "best")
    staging = os.path.join(ckpt_dir, "best_next")
    if os.path.exists(staging):
        shutil.rmtree(staging)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(staging, {"params": params, "opt_state": opt_state,
                             "step": np.asarray(int(step))})
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(staging, path)
    with open(meta_path, "w") as f:
        json.dump({"metric": float(metric), "monitor": monitor,
                   "step": int(step)}, f)
    return path


def restore_train_state(path: str, params_like: Any, opt_state_like: Any):
    """Restore (params, opt_state, step) matching the given abstract trees."""
    import orbax.checkpoint as ocp
    target = {"params": params_like, "opt_state": opt_state_like,
              "step": np.asarray(0)}
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), target)
    return restored["params"], restored["opt_state"], int(restored["step"])
