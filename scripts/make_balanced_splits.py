#!/usr/bin/env python3
"""Balanced 3-way split CLI — reference parity
(experiments/data_v2/make_balanced_splits.py): applies the 400-trial
balanced grouped split to processed / DL / DL-augmented tables, propagates
splits to augmented rows (base rows matched via aug_idx==0 when origin_id is
missing, :123-171), HARD-FAILS if any group spans splits (:193-209), writes
CSV (+XLSX when available) pairs and prints the audit report.

  python scripts/make_balanced_splits.py --table data_dl_augmented.csv \
      --out data_dl_augmented_split --train 0.7 --val 0.15 --test 0.15
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--table", required=True)
    p.add_argument("--out", required=True, help="output path stem")
    p.add_argument("--train", type=float, default=0.70)
    p.add_argument("--val", type=float, default=0.15)
    p.add_argument("--test", type=float, default=0.15)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--trials", type=int, default=400)
    p.add_argument("--label-col", default="y_majority")
    p.add_argument("--group-col", default="origin_id")
    args = p.parse_args(argv)

    from mmtrs_tpu.data.splits import (
        ThreeWaySplitConfig,
        assert_no_group_leakage,
        audit_report,
        balanced_grouped_split,
        propagate_split_to_augmented,
    )
    from mmtrs_tpu.utils.io import read_table, write_table

    df = read_table(args.table)

    # base rows: aug_idx==0 when present (make_balanced_splits.py:123-171)
    if "aug_idx" in df.columns:
        base = df[df["aug_idx"] == 0].reset_index(drop=True)
    else:
        base = df.copy()
    if args.group_col not in base.columns:
        base[args.group_col] = np.arange(len(base))
        df = df.merge(
            base[["image_name", args.group_col]], on="image_name", how="left"
        ) if args.group_col not in df.columns else df

    cfg = ThreeWaySplitConfig(
        train_frac=args.train, val_frac=args.val, test_frac=args.test,
        seed=args.seed, group_col=args.group_col, label_col=args.label_col,
        max_trials=args.trials,
    )
    tr, va, te = balanced_grouped_split(base, cfg)
    split = np.array(["train"] * len(base), dtype=object)
    split[va] = "val"
    split[te] = "test"
    base = base.assign(split=split)

    out = propagate_split_to_augmented(
        df.drop(columns=["split"], errors="ignore"), base,
        group_col=args.group_col,
    )
    assert_no_group_leakage(out, args.group_col)  # hard fail (:193-209)

    written = write_table(out, Path(args.out))
    print(f"wrote {written}")
    print("audit:", audit_report(out, args.label_col))
    return 0


if __name__ == "__main__":
    sys.exit(main())
