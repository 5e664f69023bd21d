"""Checkpointing with inference-recipe metadata.

The reference's checkpoints are torch dicts carrying the full inference
recipe — {model, model_name/args, img_size, thr, T, scaler_mean,
scaler_scale} (train_mm_joint_dualtask.py:302-313, train_hard.py:215-217) —
so any consumer can reconstruct preprocessing. TPU equivalent: Orbax for the
array pytrees + a JSON sidecar for the recipe (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from mmtrs_tpu.utils.io import ensure_dir


def save_checkpoint(path: str | Path, state: Any, recipe: dict | None = None) -> Path:
    """Save a pytree (TrainState or raw params) + JSON recipe sidecar."""
    path = Path(path).resolve()
    ensure_dir(path.parent)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    if recipe is not None:
        Path(str(path) + ".recipe.json").write_text(json.dumps(recipe, indent=2))
    return path


def load_checkpoint(path: str | Path, target: Any = None) -> tuple[Any, dict | None]:
    """Load a pytree (optionally restoring into ``target``'s structure) and
    its recipe sidecar if present."""
    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            state = ckptr.restore(path, target)
        else:
            state = ckptr.restore(path)
    recipe_p = Path(str(path) + ".recipe.json")
    recipe = json.loads(recipe_p.read_text()) if recipe_p.exists() else None
    return state, recipe
