"""Base-prediction stream collection (src/fusion/prepare_streams.py parity).

``collect_base_preds``: for val+test frames, produce per-stream probability
arrays from whatever models are discoverable on disk — vision hard/soft
checkpoints, tabular GBDT forests — with the reference's graceful-None
contract (:134-137, :173-176): a stream that cannot load or predict is
returned as None and simply masked out downstream, never crashing.

Model discovery mirrors the reference's globbing (``_find_model`` :46-55):
first match of a list of patterns under the given directories.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from mmtrs_tpu.data.features import build_features


def find_model(root: str | Path, patterns: list[str]) -> Path | None:
    root = Path(root)
    if not root.exists():
        return None
    for pat in patterns:
        hits = sorted(root.glob(pat))
        if hits:
            return hits[0]
    return None


def _predict_vision_ckpt(ckpt_base: Path, images: np.ndarray) -> np.ndarray | None:
    """Load a vision checkpoint via its recipe sidecar and batch-predict."""
    try:
        from mmtrs_tpu.config import VisionTrainConfig
        from mmtrs_tpu.train.common import TrainState
        from mmtrs_tpu.train.vision import VisionTrainer
        from mmtrs_tpu.utils.checkpoint import load_checkpoint

        variables, recipe = load_checkpoint(ckpt_base)
        if recipe is None:
            return None
        cfg = VisionTrainConfig(
            model_name=recipe["model_name"],
            img_size=int(recipe["img_size"]),
            task=recipe.get("task", "hard"),
            bf16=False,
        )
        trainer = VisionTrainer(cfg)
        trainer.init_state(total_steps=1)
        import jax.numpy as jnp

        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=(),
            step=jnp.zeros((), jnp.int32),
        )
        from mmtrs_tpu.train.vision import VisionData

        data = VisionData(images=images, y=np.zeros(len(images)))
        return trainer.predict_proba(state, data)
    except Exception:
        return None


def _predict_tab_forest(forest_base: Path, df: pd.DataFrame) -> np.ndarray | None:
    try:
        from mmtrs_tpu.models.gbdt import Forest, predict_proba

        f = Forest.load(forest_base)
        X = build_features(df).to_numpy(np.float32)
        return predict_proba(f, X)
    except Exception:
        return None


def collect_base_preds(
    df_val: pd.DataFrame,
    df_test: pd.DataFrame,
    images_val: np.ndarray | None,
    images_test: np.ndarray | None,
    weight_dir: str | Path = "weights",
    ml_dir: str | Path = "models/outputs",
) -> dict:
    """Returns {"val": {...}, "test": {...}} with streams v_hard / v_soft /
    xgb / lgbm (each an array or None)."""
    weight_dir, ml_dir = Path(weight_dir), Path(ml_dir)
    out = {"val": {}, "test": {}}

    vision = {
        "v_hard": find_model(weight_dir, ["vision_hard_best.recipe.json",
                                          "**/vision_hard_best.recipe.json"]),
        "v_soft": find_model(weight_dir, ["vision_soft_best.recipe.json",
                                          "**/vision_soft_best.recipe.json"]),
    }
    for k, rp in vision.items():
        if rp is None or images_val is None or images_test is None:
            out["val"][k] = out["test"][k] = None
            continue
        base = Path(str(rp)[: -len(".recipe.json")])
        out["val"][k] = _predict_vision_ckpt(base, images_val)
        out["test"][k] = _predict_vision_ckpt(base, images_test)

    tab = {
        "xgb": find_model(ml_dir, ["xgb_forest.npz", "**/xgb_forest.npz"]),
        "lgbm": find_model(ml_dir, ["lgbm_forest.npz", "**/lgbm_forest.npz"]),
    }
    for k, fp in tab.items():
        if fp is None:
            out["val"][k] = out["test"][k] = None
            continue
        base = fp.with_suffix("")
        out["val"][k] = _predict_tab_forest(base, df_val)
        out["test"][k] = _predict_tab_forest(base, df_test)
    return out
