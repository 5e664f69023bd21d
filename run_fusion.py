#!/usr/bin/env python3
"""Fusion CLI — reference surface parity (run_fusion.py:178-256).

Subcommands:
  train        fit the generic multi-stream fusion (src/fusion/fuse_train.py)
               from a predictions CSV with per-stream probability columns;
  info         print the saved recipe (streams, weights, thresholds);
  infer-one    fuse one case's stream probabilities;
  infer-batch  fuse a CSV of per-stream probabilities →
               hybrid_<split>_predictions.csv (run_fusion.py:173-176).

The reference collects stream probabilities by running its vision/tabular
models inline; here streams are first-class columns (any of v_hard, v_soft,
xgb, lgbm, prob_tab, prob_mm, prob_mil), produced by the trainers' OOF/test
exporters — the same late-fusion contract with a cleaner boundary.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd

KNOWN_STREAMS = ["v_hard", "v_soft", "xgb", "lgbm", "prob_tab", "prob_mm", "prob_mil"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Late-fusion train/info/infer")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--data", required=True, help="CSV with y_majority, split, stream cols")
    t.add_argument("--out_dir", default="weights/fusion")
    t.add_argument("--calibrator", default="isotonic", choices=["isotonic", "platt", "none"])
    t.add_argument("--threshold-metric", default="f1")
    t.add_argument("--val-ratio", type=float, default=0.2)
    t.add_argument("--seed", type=int, default=42)

    i = sub.add_parser("info")
    i.add_argument("--fusion_dir", default="weights/fusion")

    o = sub.add_parser("infer-one")
    o.add_argument("--fusion_dir", default="weights/fusion")
    o.add_argument("--streams", required=True,
                   help='JSON, e.g. \'{"v_hard": 0.8, "xgb": 0.6}\'')
    o.add_argument("--threshold", type=float, default=None)

    b = sub.add_parser("infer-batch")
    b.add_argument("--fusion_dir", default="weights/fusion")
    b.add_argument("--data", required=True)
    b.add_argument("--split", default="test")
    b.add_argument("--out_dir", default=".")
    b.add_argument("--threshold", type=float, default=None)
    return p


def _stream_cols(df: pd.DataFrame) -> list[str]:
    return [c for c in KNOWN_STREAMS if c in df.columns]


def cmd_train(args) -> int:
    from sklearn.model_selection import StratifiedShuffleSplit

    from mmtrs_tpu.fusion import fit_fusion
    from mmtrs_tpu.utils.io import read_table

    df = read_table(args.data)
    df["split"] = df["split"].astype(str).str.lower()
    cols = _stream_cols(df)
    if not cols:
        print(f"[error] no stream columns found (looked for {KNOWN_STREAMS})")
        return 1
    if not (df["split"] == "test").any():
        print("[error] no test split rows")
        return 1
    if (df["split"] == "val").any():
        dval = df[df["split"] == "val"]
    else:  # auto-create stratified val from train (fuse_train.py:40-53)
        dtr = df[df["split"] == "train"]
        sss = StratifiedShuffleSplit(1, test_size=args.val_ratio, random_state=args.seed)
        _, vi = next(sss.split(dtr, dtr["y_majority"].astype(int)))
        dval = dtr.iloc[vi]
        print(f"[INFO] auto-created VAL from TRAIN: {len(dval)} rows")
    dte = df[df["split"] == "test"]

    sv = {c: dval[c].to_numpy() for c in cols}
    st = {c: dte[c].to_numpy() for c in cols}
    meta = fit_fusion(
        sv, dval["y_majority"].astype(int).to_numpy(),
        st, dte["y_majority"].astype(int).to_numpy(),
        out_dir=args.out_dir, calibrator_kind=args.calibrator,
        threshold_metric=args.threshold_metric,
    )
    print("== Fusion selection ==", meta["choice"])
    print("TEST:", {k: round(v, 4) for k, v in meta["test_metrics"].items()
                    if isinstance(v, float)})
    return 0


def cmd_info(args) -> int:
    from mmtrs_tpu.fusion import load_recipe

    rec = load_recipe(args.fusion_dir)
    print(json.dumps(rec, indent=2))
    return 0


def cmd_infer_one(args) -> int:
    from mmtrs_tpu.fusion import fuse_streams, load_recipe

    rec = load_recipe(args.fusion_dir)
    streams = json.loads(args.streams)
    out = fuse_streams(rec, streams, override_threshold=args.threshold)
    print(json.dumps(out, indent=2))
    return 0


def cmd_infer_batch(args) -> int:
    from mmtrs_tpu.fusion import fuse_streams, load_recipe
    from mmtrs_tpu.utils.io import read_table

    rec = load_recipe(args.fusion_dir)
    df = read_table(args.data)
    if "split" in df.columns:
        df = df[df["split"].astype(str).str.lower() == args.split]
    cols = [c for c in rec["streams_used"] if c in df.columns]
    rows = []
    for _, r in df.iterrows():
        out = fuse_streams(rec, {c: float(r[c]) for c in cols},
                           override_threshold=args.threshold)
        rows.append(
            {"image_name": r.get("image_name", ""), "p_indirect": out["p_indirect"],
             "label": out["label"], "threshold": out["threshold"]}
        )
    out_path = Path(args.out_dir) / f"hybrid_{args.split}_predictions.csv"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(rows).to_csv(out_path, index=False)
    print(f"wrote {out_path} ({len(rows)} rows)")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return {"train": cmd_train, "info": cmd_info,
            "infer-one": cmd_infer_one, "infer-batch": cmd_infer_batch}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
