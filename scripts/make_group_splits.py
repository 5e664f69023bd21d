#!/usr/bin/env python3
"""K-fold split exporter — reference parity (scripts/make_group_splits.py:29-70).

  python scripts/make_group_splits.py --csv data_dl_augmented.csv \
      --outdir data/splits --folds 5 --test-prop 0.2 --seed 42

Groupwise test holdout (GroupShuffleSplit) then StratifiedGroupKFold folds;
exports folds_group.csv, per-fold train_fold{k}.csv / val_fold{k}.csv, test.csv.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--folds", type=int, default=5)
    p.add_argument("--test-prop", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--label-col", default="y_majority")
    args = p.parse_args(argv)

    import sys as _s
    _s.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from mmtrs_tpu.data.splits import make_group_fold_table
    from mmtrs_tpu.utils.io import read_table

    df = read_table(args.csv)
    out = make_group_fold_table(
        df, n_folds=args.folds, test_prop=args.test_prop, seed=args.seed,
        label_col=args.label_col,
    )
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    out.to_csv(outdir / "folds_group.csv", index=False)
    print(f"Saved {outdir / 'folds_group.csv'}")
    for k in range(args.folds):
        tr = out[(out["fold"] != k) & (out["split"] != "test")]
        va = out[(out["fold"] == k) & (out["split"] != "test")]
        tr.to_csv(outdir / f"train_fold{k}.csv", index=False)
        va.to_csv(outdir / f"val_fold{k}.csv", index=False)
    if (out["split"] == "test").any():
        out[out["split"] == "test"].to_csv(outdir / "test.csv", index=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
