"""Serving-side fold ensembles — concrete model loaders for PredictService.

Parity targets (ui/gradio_app/):
- :class:`MMEnsemble` (infer_mm.py:19-109): loads mm_dualtask_fold*.ckpt,
  rebuilds the MM net, per-fold scaler stats + temperature; tab-absent
  behaviour = scaler means → zero standardized vector (:75-83); 3-way TTA
  (none/h/v flip) + sigmoid(logit/T) fold mean (:85-109);
- :class:`MILEnsemble` (infer_mil.py:116-158): builds one bag from ALL
  processed images of the case (resize 512 → centre-crop 480), fold-mean
  logit → sigmoid;
- :class:`TabEnsemble` (tab_model.py:19-122): loads tab_fold* GBDT forests,
  mean probability (trained by mmtrs_tpu.train.tabular.train_tab_kfold —
  the trainer the reference never shipped).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mmtrs_tpu.data.features import engineer_features_jax
from mmtrs_tpu.models.mm_joint import MMJointDualHead
from mmtrs_tpu.models.mil import MILNet, make_eval_bag
from mmtrs_tpu.ops.resize import resize_bilinear
from mmtrs_tpu.train.common import normalize_imagenet
from mmtrs_tpu.utils.checkpoint import load_checkpoint


class MMEnsemble:
    def __init__(self, folds: list[dict], model: MMJointDualHead):
        self.folds = folds  # each: {variables, T, scaler_mean, scaler_scale}
        self.model = model
        self._apply = jax.jit(
            lambda v, img, tab: model.apply(v, img, tab, train=False)[0]
        )

    @staticmethod
    def from_folder(folder: str | Path, pattern: str = "mm_dualtask_fold*") -> "MMEnsemble | None":
        folder = Path(folder)
        ckpts = sorted(
            p for p in folder.glob(pattern + ".recipe.json")
        )
        if not ckpts:
            return None
        folds, model = [], None
        for rp in ckpts:
            base = Path(str(rp)[: -len(".recipe.json")])
            variables, recipe = load_checkpoint(base)
            if model is None:
                model = MMJointDualHead(model_name=recipe["model_name"])
            folds.append(
                {
                    "variables": {
                        "params": variables["params"],
                        "batch_stats": variables["batch_stats"],
                    },
                    "T": float(recipe["T"]),
                    "mean": np.asarray(recipe["scaler_mean"], np.float32),
                    "scale": np.asarray(recipe["scaler_scale"], np.float32),
                    "img_size": int(recipe["img_size"]),
                }
            )
        return MMEnsemble(folds, model)

    def predict(self, img: np.ndarray, tab9: list[float] | None) -> float:
        """img: one processed image [H, W, 3] 0..255; tab9: 9 raw features
        or None (→ scaler means → zero standardized vector, infer_mm.py:75-83).

        Latency structure: the 3 TTA views ride ONE batched apply per fold,
        all fold dispatches are issued asynchronously, and the [F, 3] logit
        matrix is fetched ONCE — 1 host↔device sync instead of the naive
        F·3 = 15 (each sync costs a full RTT on remote-accelerator rigs)."""
        per_fold, Ts = [], []
        for f in self.folds:
            x = jnp.asarray(img, jnp.float32)[None]
            if x.shape[1] != f["img_size"]:
                x = resize_bilinear(x, (f["img_size"], f["img_size"]))
            x = normalize_imagenet(x)
            x3 = jnp.concatenate(
                [x, x[:, :, ::-1, :], x[:, ::-1, :, :]], axis=0
            )
            raw = np.asarray(tab9, np.float32) if tab9 is not None else f["mean"]
            t = jnp.asarray((raw - f["mean"]) / f["scale"], jnp.float32)[None]
            per_fold.append(self._apply(f["variables"], x3, jnp.tile(t, (3, 1))))
            Ts.append(f["T"])
        logits = np.asarray(jnp.stack(per_fold), np.float64)  # [F, 3], 1 fetch
        probs = 1.0 / (1.0 + np.exp(-logits.mean(axis=1) / np.asarray(Ts)))
        return float(probs.mean())


class MILEnsemble:
    def __init__(self, folds: list[dict], model: MILNet, crop_size: int = 480):
        self.folds = folds
        self.model = model
        self.crop_size = crop_size
        self._apply = jax.jit(
            lambda v, bags: model.apply(v, bags, train=False)[0]
        )

    @staticmethod
    def from_folder(folder: str | Path, pattern: str = "mil_v1_fold*") -> "MILEnsemble | None":
        folder = Path(folder)
        ckpts = sorted(p for p in folder.glob(pattern + ".recipe.json"))
        if not ckpts:
            return None
        folds, model = [], None
        for rp in ckpts:
            base = Path(str(rp)[: -len(".recipe.json")])
            variables, recipe = load_checkpoint(base)
            if model is None:
                model = MILNet(
                    model_name=recipe.get("model_name", "efficientnet_b0"),
                    attn_dim=recipe.get("attn_dim", 128),
                )
            folds.append({"variables": {
                "params": variables["params"],
                "batch_stats": variables["batch_stats"],
            }})
        return MILEnsemble(folds, model)

    def predict(self, imgs: np.ndarray) -> float:
        """imgs: ALL processed images of the case [N, H, W, 3] (one bag,
        infer_mil.py:116-149); accepts a single [H, W, 3] too."""
        if imgs.ndim == 3:
            imgs = imgs[None]
        bag = make_eval_bag(jnp.asarray(imgs), self.crop_size)  # u8 ok
        bag = normalize_imagenet(bag)[None]  # [1, N, h, w, 3]
        # async dispatch per fold, ONE fetch (see MMEnsemble.predict)
        logits = np.asarray(
            jnp.stack([self._apply(f["variables"], bag)[0] for f in self.folds]),
            np.float64,
        )
        return float(1.0 / (1.0 + np.exp(-np.mean(logits))))


class TabEnsemble:
    def __init__(self, forests: list):
        self.forests = forests

    @staticmethod
    def from_folder(folder: str | Path) -> "TabEnsemble | None":
        from mmtrs_tpu.train.tabular import load_tab_ensemble

        folder = Path(folder)
        if not folder.exists():
            return None
        forests = load_tab_ensemble(folder)
        return TabEnsemble(forests) if forests else None

    def predict_one(self, tab9: list[float]) -> float:
        from mmtrs_tpu.models.gbdt import predict_proba

        x = np.asarray(
            engineer_features_jax(jnp.asarray(tab9, jnp.float32)[None])
        )
        return float(np.mean([predict_proba(f, x)[0] for f in self.forests]))


def build_service_from_weights(
    weights_dir: str | Path,
    results_dir: str | Path = "results/stack_v2",
    legacy_blend: bool = False,
):
    """Wire a PredictService from a weights folder layout mirroring the
    reference (weights/mm_dualtask_v1, weights/mil_v1, weights/tab_v1),
    with the reference's graceful every-stream-optional contract."""
    import pandas as pd

    from mmtrs_tpu.serve.service import PredictService, Stacker

    weights_dir = Path(weights_dir)
    mm = MMEnsemble.from_folder(weights_dir / "mm_dualtask_v1")
    mil = MILEnsemble.from_folder(weights_dir / "mil_v1")
    tab = TabEnsemble.from_folder(weights_dir / "tab_v1")

    stacker = None
    mm_oof = weights_dir / "mm_dualtask_v1" / "oof_val.csv"
    mil_oof = weights_dir / "mil_v1" / "oof_val.csv"
    if mm_oof.exists() and mil_oof.exists():
        stacker = Stacker.fit(pd.read_csv(mm_oof), pd.read_csv(mil_oof))

    return PredictService(
        mm_predict=(lambda img, tab9: mm.predict(img, tab9)) if mm else None,
        mil_predict=(lambda img: mil.predict(img)) if mil else None,
        tab_predict=(lambda tab9: tab.predict_one(tab9)) if tab else None,
        stacker=stacker,
        legacy_blend=legacy_blend,
    )
