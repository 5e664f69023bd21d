#!/usr/bin/env python3
"""Salvage/replay: rebuild the final stack + summary.json for a rehearsal
whose MM/MIL stream artifacts exist but whose main process died before the
stack stage (e.g. the round clock).

The stream runners (`run_mm_kfold` / `run_mil_kfold`) persist
``oof_val.csv`` / ``pred_test.csv`` / ``summary.json`` the moment their
stage completes, so everything after them is deterministic and cheap: this
regenerates the cohort + augmented table with the rehearsal's exact seeds
(cohort seed 2026, augment seed 42 — image compute is the only real cost,
and it rides the persistent compile cache), reloads the stream CSVs, and
re-runs stage 6 + the summary record with the same strict
``stack_beats_streams`` formula as scripts/rehearsal.py:244-253.

Usage:
  python scripts/stack_from_streams.py [--dir results/rehearsal_r3]
                                       [--n 422] [--n_aug 10] [--folds 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path(__file__).resolve().parents[1] / ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="results/rehearsal_r3")
    ap.add_argument("--n", type=int, default=422)
    ap.add_argument("--raw_size", type=int, default=512)
    ap.add_argument("--n_aug", type=int, default=10)
    ap.add_argument("--folds", type=int, default=5)
    args = ap.parse_args()

    import jax
    import pandas as pd

    from scripts.rehearsal import hard_cohort

    from mmtrs_tpu.config import FusionConfig, GBDTConfig
    from mmtrs_tpu.data.records import build_augmented_table
    from mmtrs_tpu.fusion import run_final_stack
    from mmtrs_tpu.metrics import roc_auc
    from mmtrs_tpu.preprocess import preprocess_batch

    out = Path(args.dir)
    mm = {
        "oof": pd.read_csv(out / "mm" / "oof_val.csv"),
        "test": pd.read_csv(out / "mm" / "pred_test.csv"),
        "summary": json.loads((out / "mm" / "summary.json").read_text()),
    }
    mil = {
        "oof": pd.read_csv(out / "mil" / "oof_val.csv"),
        "test": pd.read_csv(out / "mil" / "pred_test.csv"),
        "summary": json.loads((out / "mil" / "summary.json").read_text()),
    }

    platform = jax.devices()[0].platform
    use_pallas = platform == "tpu"
    print(f"[salvage] platform={platform}; regenerating table (seeds 2026/42)")
    df, raw = hard_cohort(args.n, args.raw_size, seed=2026)
    proc = np.empty_like(raw)
    bs = 32
    for s in range(0, len(raw), bs):
        chunk = raw[s : s + bs]
        pad = bs - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        o, _ = preprocess_batch(
            jax.numpy.asarray(chunk), out_size=args.raw_size,
            use_pallas=use_pallas,
        )
        o = np.asarray(
            jax.numpy.clip(jax.numpy.round(o), 0, 255).astype(jax.numpy.uint8)
        )
        proc[s : s + bs] = o[: bs - pad] if pad else o
    table, _aug = build_augmented_table(
        df, proc, n_aug=args.n_aug, preset="legacy", seed=42, test_frac=0.19
    )
    # consistency gate: the regenerated table must describe the same rows the
    # stream artifacts scored
    assert len(mm["oof"]) == (table["split"] != "test").sum(), (
        len(mm["oof"]), (table["split"] != "test").sum())

    t0 = time.perf_counter()
    summary = run_final_stack(
        table,
        oof_mm=mm["oof"], pred_mm=mm["test"],
        oof_mil=mil["oof"], pred_mil=mil["test"],
        outdir=out / "stack",
        cfg=FusionConfig(n_folds=args.folds, thr_mode="max_acc"),
        tab_cfg=GBDTConfig.stack_tab_like(),
    )
    best_stream = max(
        roc_auc(mm["test"]["y"], mm["test"]["prob"]),
        roc_auc(mil["test"]["y"], mil["test"]["prob"]),
    )
    rec = {
        "platform": platform,
        "n_cases": args.n,
        "n_rows_augmented": int(len(table)),
        "salvaged": True,
        "streams": {"mm": mm["summary"], "mil": mil["summary"]},
        "stack": {"oof": summary["oof"], "test": summary["test"],
                  "thr": summary["thr"]},
        "best_stream_test_auc": float(best_stream),
        "stack_beats_streams": bool(summary["test"]["auc"] >= best_stream),
        "stack_s": round(time.perf_counter() - t0, 2),
    }
    (out / "summary.json").write_text(json.dumps(rec, indent=2, default=float))
    print(json.dumps(rec["stack"], indent=2, default=float))
    print(f"[salvage] → {out}/summary.json "
          f"(stack_beats_streams={rec['stack_beats_streams']})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
