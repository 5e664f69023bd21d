#!/usr/bin/env python3
"""Tabular evaluation CLI — reference parity (tests/evaluate_models.py):
evaluate xgb / lgbm / both / blend on the test split; the blend tunes
α·xgb + (1−α)·lgbm and a threshold on the TRAIN split
(_tune_blend_alpha, :145-152, applied :197-243).

  python scripts/evaluate_models.py --data data_processed.csv \
      --xgb models/outputs/xgb_forest --lgbm models/outputs/lgbm_forest \
      --which both --outdir models/outputs
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--xgb", default=None, help="path prefix of saved xgb Forest")
    p.add_argument("--lgbm", default=None, help="path prefix of saved lgbm Forest")
    p.add_argument("--which", default="both", choices=["xgb", "lgbm", "both", "blend"])
    p.add_argument("--outdir", default=None)
    args = p.parse_args(argv)

    from mmtrs_tpu.data.features import build_features
    from mmtrs_tpu.metrics import binary_report, sweep_thresholds, threshold_grid
    from mmtrs_tpu.models.gbdt import Forest, predict_proba
    from mmtrs_tpu.utils.io import read_table, save_json

    df = read_table(args.data)
    df["split"] = df["split"].astype(str).str.lower()
    te = df[df["split"] == "test"]
    tr = df[df["split"] == "train"]
    X_te = build_features(te).to_numpy(np.float32)
    y_te = te["y_majority"].astype(int).to_numpy()
    X_tr = build_features(tr).to_numpy(np.float32)
    y_tr = tr["y_majority"].astype(int).to_numpy()

    preds = {}
    if args.xgb and args.which in ("xgb", "both", "blend"):
        f = Forest.load(args.xgb)
        preds["xgb"] = (predict_proba(f, X_te), predict_proba(f, X_tr))
    if args.lgbm and args.which in ("lgbm", "both", "blend"):
        f = Forest.load(args.lgbm)
        preds["lgbm"] = (predict_proba(f, X_te), predict_proba(f, X_tr))

    results = {}
    for name, (p_te, _) in preds.items():
        rep = binary_report(y_te, p_te, 0.5)
        results[name] = {k: round(rep[k], 4) for k in ("auc", "acc", "prec", "rec", "f1")}
        print(f"[{name}] {results[name]}")

    if args.which == "blend" and len(preds) == 2:
        ts = threshold_grid("fusion")
        best = {"score": -1.0}
        for alpha in np.linspace(0, 1, 21):  # α grid tuned on train (:145-152)
            p_tr = alpha * preds["xgb"][1] + (1 - alpha) * preds["lgbm"][1]
            s = sweep_thresholds(y_tr, p_tr, ts)
            i = int(np.argmax(s["acc"]))
            if s["acc"][i] > best["score"]:
                best = {"score": float(s["acc"][i]), "alpha": float(alpha),
                        "thr": float(ts[i])}
        p_te = best["alpha"] * preds["xgb"][0] + (1 - best["alpha"]) * preds["lgbm"][0]
        rep = binary_report(y_te, p_te, best["thr"])
        results["blend"] = {
            "alpha": best["alpha"], "thr": round(best["thr"], 4),
            **{k: round(rep[k], 4) for k in ("auc", "acc", "prec", "rec", "f1")},
        }
        print(f"[blend] {results['blend']}")
        if args.outdir:
            save_json({"alpha": best["alpha"], "threshold": best["thr"]},
                      Path(args.outdir) / "blend_params.json")
            save_json(results["blend"], Path(args.outdir) / "metrics_blend.json")

    if args.outdir:
        save_json(results, Path(args.outdir) / "evaluation.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
